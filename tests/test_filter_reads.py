"""Read-filtering parity tests against the golden sars read report."""

import numpy as np
import pandas as pd

from instrain_tpu.config import ReadFilterConfig
from instrain_tpu.io.bam import decode_bam
from instrain_tpu.profile.filter_reads import (filter_reads,
                                               pair_info_from_records)


def test_mapping_info_matches_golden(sars_bam, sars_is, sars_ref_seq):
    bam = decode_bam(sars_bam, ref_seqs={"MT039887.1": sars_ref_seq},
                     baq=False)
    ps = filter_reads(bam, ReadFilterConfig())
    ours = ps.mapping_info.iloc[0]  # all_scaffolds row

    gold = pd.read_csv(sars_is + "/raw_data/read_report.csv.gz",
                       index_col=0).iloc[0]
    # v1.2.4 column name for the ANI filter differs
    renames = {"pass_filter_cutoff": "pass_min_read_ani"}
    for col in ["unfiltered_reads", "unfiltered_pairs",
                "unfiltered_singletons", "pass_pairing_filter",
                "pass_filter_cutoff", "pass_max_insert", "pass_min_insert",
                "pass_min_mapq", "filtered_pairs", "filtered_singletons"]:
        ours_col = renames.get(col, col)
        assert int(ours[ours_col]) == int(gold[col]), col
    for col in ["mean_mistmaches", "mean_insert_distance", "mean_mapq_score",
                "mean_pair_length", "median_insert", "mean_PID"]:
        assert abs(float(ours[col]) - float(gold[col])) < 1e-9, col


def test_pair_merging_basics(sars_bam, sars_ref_seq):
    bam = decode_bam(sars_bam, ref_seqs={"MT039887.1": sars_ref_seq},
                     baq=False)
    info = pair_info_from_records(bam)
    # every record is accounted for
    assert info.reads.sum() == bam.n_records
    # pairs have merged lengths of two reads
    two = info.reads == 2
    assert (info.length[two] > info.length[~two].max() * 0.5).mean() > 0.5
    # inserts are only set for pairs
    assert (info.insert[info.reads != 2] == -1).all()


def test_pairing_filter_modes(sars_bam, sars_ref_seq):
    from instrain_tpu.profile.filter_reads import apply_pairing_filter
    bam = decode_bam(sars_bam, ref_seqs={"MT039887.1": sars_ref_seq},
                     baq=False)
    info = pair_info_from_records(bam)
    none = np.zeros(0, dtype=np.int64)
    po = apply_pairing_filter(info, "paired_only", none)
    assert (po.reads == 2).all()
    nd = apply_pairing_filter(info, "non_discordant", none)
    # single ref: everything is concordant
    assert len(nd) == len(info)
    ar = apply_pairing_filter(info, "all_reads", none)
    assert len(ar) == len(info)

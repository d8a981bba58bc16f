"""
Full compare pipeline with pooling + genome-wide + clustering, built from
two subsampled profiles of the sars BAM (distinct seeds -> distinct
subsets), plus priority reads and genome-coverage filtering tests.
"""

import os

import numpy as np
import pandas as pd
import pytest

from instrain_tpu.config import CompareConfig, ProfileConfig
from instrain_tpu.profile.pipeline import profile


@pytest.fixture(scope="module")
def two_profiles(tmp_path_factory, sars_bam, sars_ref_seq, ref_null_model):
    base = tmp_path_factory.mktemp("cmp")
    fasta = base / "s.fasta"
    with open(fasta, "w") as f:
        f.write(">MT039887.1\n" + sars_ref_seq.tobytes().decode() + "\n")
    outs = []
    bams = []
    for seed in (1, 2):
        # distinct bam names (profiles with identical names can't compare,
        # mirroring the reference's restriction)
        bam_link = base / f"sub{seed}.bam"
        os.symlink(sars_bam, bam_link)
        out = str(base / f"sub{seed}.IS")
        cfg = ProfileConfig(output=out, seed=seed,
                            skip_plot_generation=True,
                            skip_genome_wide=True)
        cfg.filter.maximum_reads = 20000
        cfg.variant.null_model = ref_null_model
        profile(str(bam_link), str(fasta), cfg)
        outs.append(out)
        bams.append(str(bam_link))
    return outs, str(fasta), bams


def test_compare_with_pooling_and_stb(tmp_path, two_profiles, sars_bam,
                                      ref_null_model):
    outs, fasta, bams = two_profiles
    stb = tmp_path / "g.stb"
    with open(stb, "w") as f:
        f.write("MT039887.1\tsars\n")
    cfg = CompareConfig(output=str(tmp_path / "rc"),
                        null_model=ref_null_model, stb=[str(stb)],
                        bams=bams,
                        store_mismatch_locations=True,
                        skip_plot_generation=True)
    from instrain_tpu.compare.pipeline import compare
    rc = compare(outs, cfg)

    db = rc.get("comparisonsTable")
    assert len(db) > 0
    nr = db.sort_values("mm").drop_duplicates(
        subset=["scaffold", "name1", "name2"], keep="last")
    # two subsets of the same sample: popANI should be ~1
    assert nr["popANI"].iloc[0] > 0.999

    # genome-wide output + clustering
    assert os.path.exists(rc.get_output_base() + "genomeWide_compare.tsv")
    gw = pd.read_csv(rc.get_output_base() + "genomeWide_compare.tsv",
                     sep="\t")
    assert gw["genome"].iloc[0] == "sars"
    clusters = pd.read_csv(rc.get_output_base() + "strain_clusters.tsv",
                           sep="\t")
    # same strain -> same cluster
    assert clusters["cluster"].nunique() == 1

    # pooling outputs
    pm = rc.get("PMdb")
    assert pm is not None and len(pm) > 0
    assert (pm["depth"] >= pm[["A", "C", "T", "G"]].max(axis=1)).all()
    info = pd.read_csv(rc.get_output_base() + "pooled_SNV_info.tsv",
                       sep="\t")
    # the position column comes from PMdb's index and must be NAMED
    # (reference: SNVprofile.py:373-375; a bare reset_index once
    # shipped a column literally called 'index')
    assert "position" in info.columns and "index" not in info.columns
    assert len(info) == len(pm)
    assert os.path.exists(rc.get_output_base() + "pooled_SNV_data.tsv")

    # pairwise SNP locations
    assert os.path.exists(rc.get_output_base() +
                          "pairwise_SNP_locations.tsv")


def test_genome_wide_on_compare_object(tmp_path, two_profiles,
                                       ref_null_model):
    outs, fasta, bams = two_profiles
    from instrain_tpu.compare.pipeline import compare
    from instrain_tpu.profile.genome import genome_wide
    cfg = CompareConfig(output=str(tmp_path / "rc2"),
                        null_model=ref_null_model,
                        skip_plot_generation=True)
    rc = compare(outs, cfg)
    genome_wide(rc, stb=[])
    out = rc.get_output_base() + "genomeWide_compare.tsv"
    assert os.path.exists(out)
    gw = pd.read_csv(out, sep="\t")
    assert "popANI" in gw.columns


def test_priority_reads(tmp_path, sars_bam, sars_ref_seq, ref_null_model):
    """Priority reads bypass the pairing filter
    (reference: filter_reads.py:428-469)."""
    from instrain_tpu.config import ReadFilterConfig
    from instrain_tpu.io.bam import decode_bam
    from instrain_tpu.profile.filter_reads import filter_reads
    bam = decode_bam(sars_bam, ref_seqs={"MT039887.1": sars_ref_seq},
                     baq=False)
    # pick some singleton qnames (reads == 1)
    from instrain_tpu.profile.filter_reads import pair_info_from_records
    info = pair_info_from_records(bam)
    singles = info.qname_id[info.reads == 1][:50]
    plist = tmp_path / "priority.txt"
    with open(plist, "w") as f:
        for q in singles:
            f.write(bam.qnames[q] + "\n")
    cfg = ReadFilterConfig(priority_reads=str(plist))
    ps = filter_reads(bam, cfg)
    row = ps.mapping_info.iloc[0]
    assert row["unfiltered_priority_reads"] == 50
    # priority singletons enter the post-pairing set
    assert row["pass_pairing_filter"] == 13925 + 50


def test_min_genome_coverage(tmp_path, sars_bam, sars_ref_seq,
                             ref_null_model):
    fasta = tmp_path / "s.fasta"
    with open(fasta, "w") as f:
        f.write(">MT039887.1\n" + sars_ref_seq.tobytes().decode() + "\n")
    stb = tmp_path / "g.stb"
    with open(stb, "w") as f:
        f.write("MT039887.1\tsars\n")
    cfg = ProfileConfig(output=str(tmp_path / "mgc.IS"),
                        min_genome_coverage=1e9, stb=[str(stb)],
                        skip_plot_generation=True, skip_genome_wide=True)
    cfg.variant.null_model = ref_null_model
    # all genomes filtered out -> empty profile (the reference writes an
    # empty ISP and exits cleanly, controller.py:440-443)
    isdir = profile(sars_bam, str(fasta), cfg)
    assert isdir.get("scaffold_list") == []


def test_store_coverage_overlap(two_profiles, tmp_path):
    """--store_coverage_overlap persists scaffold->pair->mm->positions
    (reference: compare_controller.py:377-379)."""
    from instrain_tpu.compare.pipeline import compare
    from instrain_tpu.config import CompareConfig
    from instrain_tpu.store.profile_dir import ProfileDir
    outs, fasta, bams = two_profiles
    out = str(tmp_path / "RC_covov")
    cfg = CompareConfig(output=out, skip_plot_generation=True,
                        store_coverage_overlap=True)
    compare(outs, cfg)
    rc = ProfileDir(out)
    s2p2m = rc.get("scaff2pair2mm2cov")
    assert s2p2m, "no overlap stored"
    scaff = next(iter(s2p2m))
    pair = next(iter(s2p2m[scaff]))
    assert "-vs-" in pair
    mm2pos = s2p2m[scaff][pair]
    positions = next(iter(mm2pos.values()))
    assert len(positions) > 0
    assert all(isinstance(p, (int,)) or int(p) >= 0 for p in positions)


def test_compare_scaffold_and_genome_filters(two_profiles, tmp_path,
                                             ref_null_model):
    """-sc scaffold list and --genome restrict the comparison set
    (reference: compare_controller.py:104-148)."""
    from instrain_tpu.compare.pipeline import compare
    outs, fasta, bams = two_profiles
    stb = tmp_path / "g.stb"
    with open(stb, "w") as f:
        f.write("MT039887.1\tsars\n")

    # scaffold list containing the real scaffold -> normal output
    sc = tmp_path / "scaffs.txt"
    with open(sc, "w") as f:
        f.write("MT039887.1\n")
    cfg = CompareConfig(output=str(tmp_path / "rc_sc"),
                        null_model=ref_null_model, scaffolds=str(sc),
                        skip_plot_generation=True)
    rc = compare(list(outs), cfg)
    assert len(rc.get("comparisonsTable")) > 0

    # genome filter via stb
    cfg = CompareConfig(output=str(tmp_path / "rc_gen"),
                        null_model=ref_null_model, stb=[str(stb)],
                        genome="sars", skip_plot_generation=True)
    rc = compare(list(outs), cfg)
    assert len(rc.get("comparisonsTable")) > 0

    # unknown genome -> hard error
    cfg = CompareConfig(output=str(tmp_path / "rc_bad"),
                        null_model=ref_null_model, stb=[str(stb)],
                        genome="nope", skip_plot_generation=True)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        compare(list(outs), cfg)

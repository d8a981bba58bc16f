"""
End-to-end pipeline tests: full profile run with internal invariants
(reference test strategy §4: _internal_verify_Sdb semantics), storage
round-trips, genome_wide, CLI surfaces.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from instrain_tpu.config import ProfileConfig


@pytest.fixture(scope="module")
def sars_fasta(tmp_path_factory, sars_ref_seq):
    p = tmp_path_factory.mktemp("fa") / "sars.fasta"
    seq = sars_ref_seq.tobytes().decode()
    with open(p, "w") as f:
        f.write(">MT039887.1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    return str(p)


@pytest.fixture(scope="module")
def full_profile(tmp_path_factory, sars_bam, sars_fasta, ref_null_model):
    from instrain_tpu.profile.pipeline import profile
    out = str(tmp_path_factory.mktemp("prof") / "sars.IS")
    cfg = ProfileConfig(output=out, skip_plot_generation=True)
    cfg.variant.null_model = ref_null_model
    cfg.gene_file = "/root/reference/test/test_data/sars_cov_2_MT039887.1.gb"
    return profile(sars_bam, sars_fasta, cfg)


def test_profile_outputs_exist(full_profile):
    base = full_profile.get_output_base()
    for t in ["SNVs", "scaffold_info", "linkage", "mapping_info",
              "genome_info", "gene_info"]:
        assert os.path.exists(base + t + ".tsv"), t


def test_internal_verify_sdb(full_profile):
    """Metrics monotone in mm; ANI/breadth <= 1; no stray NaNs
    (reference: test_utils._internal_verify_Sdb, 265-297)."""
    db = full_profile.get("cumulative_scaffold_table")
    for scaffold, sdb in db.groupby("scaffold"):
        sdb = sdb.sort_values("mm")
        assert sdb["coverage"].is_monotonic_increasing
        assert sdb["breadth"].is_monotonic_increasing
        assert (sdb["breadth"] <= 1).all()
        assert (sdb["breadth_minCov"] <= 1).all()
        assert (sdb["conANI_reference"] <= 1).all()
        assert (sdb["popANI_reference"] <= 1).all()
        assert (sdb["popANI_reference"] >= sdb["conANI_reference"]).all()
        covered = sdb[sdb["coverage"] > 0]
        assert covered["coverage"].notna().all()


def test_internal_verify_odb_sdb(full_profile):
    """SNV counts consistent between scaffold and SNV tables
    (reference: _internal_verify_OdbSdb, 300-317)."""
    sdb = full_profile.get("cumulative_scaffold_table")
    odb = full_profile.get("cumulative_snv_table")
    for scaffold, s in sdb.groupby("scaffold"):
        max_mm = s["mm"].max()
        row = s[s["mm"] == max_mm].iloc[0]
        snvs = odb[odb["scaffold"] == scaffold]
        dedup = snvs.sort_values("mm").drop_duplicates(
            subset=["position"], keep="last")
        assert row["divergent_site_count"] == len(dedup)


def test_storage_roundtrip(full_profile):
    """covT/clonT hd5 round-trips and selective scaffold loading."""
    covT = full_profile.get("covT")
    assert "MT039887.1" in covT
    sel = full_profile.get("covT", scaffolds=["not_there"])
    assert sel == {}
    assert full_profile.covt_scaffolds() == {"MT039887.1"}
    rdic = full_profile.get("Rdic")
    assert isinstance(rdic, dict)
    assert len(rdic["MT039887.1"]) > 10000


def test_snvs_output_schema(full_profile):
    from instrain_tpu.store.generate import COLUMN_ORDERS
    db = pd.read_csv(full_profile.get_output_base() + "SNVs.tsv", sep="\t")
    expected = COLUMN_ORDERS["SNVs"]
    assert list(db.columns)[:len(expected)] == [
        c for c in expected if c in db.columns]
    assert (db["position_coverage"] >= 5).all()
    assert set(db["con_base"].unique()) <= set("ACTGN")
    # gene annotations merged in
    assert "mutation_type" in db.columns
    assert db["mutation_type"].notna().any()


def test_gene_info_output(full_profile):
    db = pd.read_csv(full_profile.get_output_base() + "gene_info.tsv",
                     sep="\t")
    assert len(db) > 0
    assert (db["coverage"] > 0).all()
    assert "dNdS_substitutions" in db.columns


def test_genome_wide_rerun(full_profile):
    """genome_wide as a standalone re-run on the stored profile."""
    from instrain_tpu.profile.genome import genome_wide
    genome_wide(full_profile, stb=[])
    db = full_profile.get("genome_level_info")
    assert len(db) > 0
    nr = db.sort_values("mm").drop_duplicates(subset=["genome"],
                                              keep="last")
    assert abs(float(nr["breadth"].iloc[0]) - 0.998) < 0.01


def test_profile_genes_standalone(full_profile):
    from instrain_tpu.profile.genes import profile_genes_from_store
    profile_genes_from_store(
        full_profile,
        "/root/reference/test/test_data/sars_cov_2_MT039887.1.gb")
    db = full_profile.get("genes_coverage")
    assert len(db) > 0


def test_skip_mm_profiling(tmp_path, sars_bam, sars_fasta, ref_null_model):
    from instrain_tpu.profile.pipeline import profile
    cfg = ProfileConfig(output=str(tmp_path / "skipmm.IS"),
                        skip_mm_profiling=True, skip_plot_generation=True,
                        skip_genome_wide=True)
    cfg.variant.null_model = ref_null_model
    isdir = profile(sars_bam, sars_fasta, cfg)
    db = isdir.get("cumulative_scaffold_table")
    assert set(db["mm"]) == {0}
    rdic = isdir.get("Rdic")
    assert isinstance(rdic["MT039887.1"], (set, list))


def test_run_report(full_profile):
    from instrain_tpu.obs.logging import report_run_stats
    # the profile run logged checkpoints through the root logger; write a
    # small synthetic log to exercise parsing
    log = full_profile.get_location("log") + "log.log"
    with open(log, "w") as f:
        f.write("08-17 10:00 DEBUG Checkpoint main_profile filter_reads "
                "start 1000 100.0\n")
        f.write("08-17 10:01 DEBUG Checkpoint main_profile filter_reads "
                "end 1200 160.0\n")
        f.write("08-17 10:02 DEBUG WorkerLog SplitProfile scafA start "
                "100.0 77 1000\n")
        f.write("08-17 10:02 DEBUG WorkerLog SplitProfile scafA end "
                "103.0 77 1500\n")
        f.write("08-17 10:02 DEBUG WorkerLog SplitProfile scafB start "
                "103.0 77 1500\n")
        f.write("08-17 10:02 DEBUG WorkerLog SplitProfile scafB end "
                "105.0 77 1500\n")
        f.write("08-17 10:02 DEBUG FAILURE iRepError genomeX 1\n")
    report = report_run_stats(log, printToo=False)
    assert "filter_reads" in report
    assert "Worker class: SplitProfile" in report
    assert "Parallelization efficiency" in report
    assert "Units profiled" in report
    assert "Longest running unit" in report
    assert "scafA" in report  # 3.0 s > scafB's 2.0 s
    assert "failed to calculate iRep" in report
    assert "genomeX" in report


def test_run_report_with_injected_failure(tmp_path, ref_null_model):
    """End-to-end: a profile run with the magic failure scaffold (debug
    mode) produces a runtime_summary with checkpoint, worker-class and
    failure-class sections (reference: runtime_summary.txt content,
    logUtils.py:240-767)."""
    import os
    D = "/root/reference/test/test_data/"
    bam = D + "N5_271_010G1_scaffold_failureScaffold.sorted.bam"
    fasta = D + "N5_271_010G1_scaffold_failureScaffold.fa"
    if not os.path.exists(bam):
        pytest.skip("fixture missing")
    from instrain_tpu.profile.pipeline import profile
    cfg = ProfileConfig(output=str(tmp_path / "fail.IS"),
                        skip_plot_generation=True, skip_genome_wide=True,
                        debug=True)
    cfg.variant.null_model = ref_null_model
    isdir = profile(bam, fasta, cfg)
    summary = isdir.get_location("log") + "runtime_summary.txt"
    assert os.path.exists(summary)
    txt = open(summary).read()
    assert "Overall runtime" in txt
    assert "Checkpoints: main_profile" in txt
    assert "profile_scaffolds" in txt
    assert "Worker class: SplitProfile" in txt
    assert "Parallelization efficiency" in txt
    assert "scaffolds failed during profiling" in txt
    assert "FailureScaffoldHeaderTesting" in txt

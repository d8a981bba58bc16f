"""
Special-case tests mirroring the reference's test_special.py: N bases in
the reference genome, failure injection, multi-scaffold BAMs, SAM-era
fixtures.
"""

import os

import numpy as np
import pandas as pd
import pytest

from instrain_tpu.config import ProfileConfig
from instrain_tpu.io import fasta as fasta_io
from instrain_tpu.io.bam import decode_bam
from instrain_tpu.profile.pipeline import profile

D = "/root/reference/test/test_data/"


def _need(p):
    if not os.path.exists(p):
        pytest.skip(p)
    return p


def test_ns_in_reference(tmp_path, ref_null_model):
    """Reference genome with N runs: profiled positions skip N columns for
    class typing (AmbiguousReference) but coverage still counts."""
    bam = _need(D + "N5_271_010G1_scaffold_963_Ns.fasta.sorted.bam")
    fasta = _need(D + "N5_271_010G1_scaffold_963_Ns.fasta")
    cfg = ProfileConfig(output=str(tmp_path / "ns.IS"),
                        skip_plot_generation=True, skip_genome_wide=True)
    cfg.variant.null_model = ref_null_model
    isdir = profile(bam, fasta, cfg)
    db = isdir.get("cumulative_scaffold_table")
    assert len(db) > 0
    assert (db["coverage"] > 0).any()
    snv = isdir.get("cumulative_snv_table")
    if len(snv):
        # N-reference SNVs are classed AmbiguousReference, with NaN ref_freq
        amb = snv[snv["ref_base"] == "N"]
        if len(amb):
            assert (amb["class"] == "AmbiguousReference").all()
            assert amb["ref_freq"].isna().all()


def test_failure_injection(tmp_path, ref_null_model):
    """The magic scaffold name fails its worker; the run continues
    (reference: test strategy §4.6)."""
    bam = _need(D + "N5_271_010G1_scaffold_failureScaffold.sorted.bam")
    fasta = _need(D + "N5_271_010G1_scaffold_failureScaffold.fa")
    cfg = ProfileConfig(output=str(tmp_path / "fail.IS"), debug=True,
                        skip_plot_generation=True, skip_genome_wide=True)
    cfg.variant.null_model = ref_null_model
    isdir = profile(bam, fasta, cfg)
    scaffs = isdir.get("scaffold_list")
    assert "FailureScaffoldHeaderTesting" not in scaffs
    assert len(scaffs) >= 1  # other scaffolds still profiled


def test_failure_scaffold_profiles_without_debug(tmp_path, ref_null_model):
    bam = _need(D + "N5_271_010G1_scaffold_failureScaffold.sorted.bam")
    fasta = _need(D + "N5_271_010G1_scaffold_failureScaffold.fa")
    cfg = ProfileConfig(output=str(tmp_path / "nofail.IS"),
                        skip_plot_generation=True, skip_genome_wide=True)
    cfg.variant.null_model = ref_null_model
    isdir = profile(bam, fasta, cfg)
    assert "FailureScaffoldHeaderTesting" in isdir.get("scaffold_list")


def test_small_scaffold_profile(tmp_path, ref_null_model):
    bam = _need(D + "SmallScaffold.fa.sorted.bam")
    fasta = _need(D + "SmallScaffold.fa")
    cfg = ProfileConfig(output=str(tmp_path / "small.IS"),
                        skip_plot_generation=True, skip_genome_wide=True)
    cfg.variant.null_model = ref_null_model
    isdir = profile(bam, fasta, cfg)
    db = isdir.get("cumulative_scaffold_table")
    assert len(db) > 0
    # manual coverage check on this tiny fixture
    b = decode_bam(bam, baq=False, tweak_overlaps=False)
    assert db["coverage"].iloc[-1] > 0


def test_detailed_mapping_info(tmp_path, sars_bam, sars_ref_seq,
                               ref_null_model):
    seq = sars_ref_seq.tobytes().decode()
    fasta = tmp_path / "s.fasta"
    with open(fasta, "w") as f:
        f.write(">MT039887.1\n" + seq + "\n")
    cfg = ProfileConfig(output=str(tmp_path / "dmi.IS"),
                        detailed_mapping_info=True,
                        skip_plot_generation=True, skip_genome_wide=True)
    cfg.variant.null_model = ref_null_model
    isdir = profile(sars_bam, str(fasta), cfg)
    dmi = isdir.get("detailed_mapping_info")
    assert len(dmi) == 13925  # one row per post-pairing-filter pair
    assert dmi["pass_filters"].sum() == 13124

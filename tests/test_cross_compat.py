"""
Cross-compatibility: profiles written by instrain_tpu load through the
REFERENCE inStrain's own SNVprofile class (imported with stubbed native
deps), and reference-written profiles load through ours.
"""

import numpy as np
import pandas as pd
import pytest

from instrain_tpu.config import ProfileConfig
from instrain_tpu.profile.pipeline import profile
from reference_oracle import import_reference


@pytest.fixture(scope="module")
def our_profile(tmp_path_factory, sars_bam, sars_ref_seq, ref_null_model):
    base = tmp_path_factory.mktemp("xc")
    fasta = base / "s.fasta"
    with open(fasta, "w") as f:
        f.write(">MT039887.1\n" + sars_ref_seq.tobytes().decode() + "\n")
    out = str(base / "ours.IS")
    cfg = ProfileConfig(output=out, skip_plot_generation=True,
                        skip_genome_wide=True)
    cfg.variant.null_model = ref_null_model
    profile(sars_bam, str(fasta), cfg)
    return out


def test_reference_reads_our_profile(our_profile):
    snv_mod = import_reference("inStrain.SNVprofile")
    isp = snv_mod.SNVprofile(our_profile)
    # typed attribute loads
    assert isp.get("object_type") == "profile"
    s2l = isp.get("scaffold2length")
    assert s2l["MT039887.1"] == 29879
    snv = isp.get("cumulative_snv_table")
    assert len(snv) > 0
    assert {"position", "con_base", "var_base", "mm"} <= set(snv.columns)
    covT = isp.get("covT", scaffolds=["MT039887.1"])
    assert "MT039887.1" in covT
    mm0 = covT["MT039887.1"][0]
    assert len(mm0) > 1000
    # reference's non-redundant views work on our data
    nr = isp.get_nonredundant_snv_table()
    assert len(nr) > 0
    rl = isp.get_read_length()
    assert 400 < rl < 500


def test_we_read_reference_profile(sars_is):
    from instrain_tpu.store.profile_dir import ProfileDir
    from instrain_tpu.store import generate as gen
    isp = ProfileDir(sars_is)
    snv = isp.get("cumulative_snv_table")
    assert len(snv) == 707
    covT = isp.get("covT", scaffolds=["MT039887.1"])
    assert "MT039887.1" in covT
    nr = gen.nonredundant(snv, ["scaffold", "position"])
    assert len(nr) > 0

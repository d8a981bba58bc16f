"""
Real multi-scaffold BAM validation (reference fixtures: the subsampled
N5_271_010G1 mapping against the min1000 assembly, 178 scaffolds, with
prodigal genes and a maxbin2 stb). The version goldens in the reference
tree were built from the full (not shipped) BAM, so value-level golden
diffs aren't possible; instead this runs the FULL pipeline (genes,
genome_wide, plots) on real data and checks:

- the reference's internal invariants (_internal_verify_Sdb /
  _internal_verify_OdbSdb, test/tests/test_utils.py:265-317)
- profile-directory attribute parity against the v1.3.0g golden dir
- engine equality: the vmapped batch engine reproduces the dense
  per-scaffold engine on this data
"""

import os

import numpy as np
import pandas as pd
import pytest

from instrain_tpu.config import ProfileConfig

D = "/root/reference/test/test_data/"
BAM = D + "N5_271_010G1_scaffold_min1000.fa-vs-N5_271_010G1.sorted.bam.sub"
FASTA = D + "N5_271_010G1_scaffold_min1000.fa"
GENES = D + "N5_271_010G1_scaffold_min1000.fa.genes.fna"
STB = D + "N5_271_010G1.maxbin2.stb"
GOLD_13 = D + "N5_271_010G1_scaffold_min1000.fa-vs-N5_271_010G1.sorted.bam.IS.v1.3.0g"


@pytest.fixture(scope="module")
def n5_profile(tmp_path_factory, ref_null_model):
    if not os.path.exists(BAM):
        pytest.skip("N5_271 fixtures not available")
    from instrain_tpu.profile.pipeline import profile
    out = str(tmp_path_factory.mktemp("n5") / "n5.IS")
    cfg = ProfileConfig(output=out, gene_file=GENES, stb=[STB])
    cfg.variant.null_model = ref_null_model
    return profile(BAM, FASTA, cfg)


def test_outputs_and_plots(n5_profile):
    base = n5_profile.get_output_base()
    for t in ["SNVs", "scaffold_info", "linkage", "mapping_info",
              "gene_info", "genome_info"]:
        assert os.path.exists(base + t + ".tsv"), t
    figs = n5_profile.get_location("figures")
    pdfs = [f for f in os.listdir(figs) if f.endswith(".pdf")]
    # reference makes plots 1,2,3,4,6,7,9 on a profile with genes
    # (plot 5/8 need linkage rows; this subsample has none)
    assert len(pdfs) >= 6, pdfs
    for f in pdfs:
        assert os.path.getsize(os.path.join(figs, f)) > 1000, f


def test_scale(n5_profile):
    """Sanity: this is genuinely multi-scaffold real data."""
    sdb = n5_profile.get("cumulative_scaffold_table")
    assert sdb["scaffold"].nunique() >= 50
    gdb = n5_profile.get("genes_coverage")
    assert len(gdb) > 50


def test_internal_verify_sdb(n5_profile):
    """reference: test_utils._internal_verify_Sdb (265-297)."""
    db = n5_profile.get("cumulative_scaffold_table")
    assert db["coverage"].notna().all()
    for scaffold, sdb in db.groupby("scaffold"):
        sdb = sdb.sort_values("mm")
        assert sdb["coverage"].is_monotonic_increasing, scaffold
        assert sdb["breadth"].is_monotonic_increasing, scaffold
        for col in ("breadth", "breadth_minCov", "conANI_reference",
                    "popANI_reference", "breadth_rarefied"):
            assert (sdb[col].dropna() <= 1).all(), (scaffold, col)
            assert (sdb[col].dropna() >= 0).all(), (scaffold, col)
        assert (sdb["popANI_reference"] >=
                sdb["conANI_reference"]).all(), scaffold


def test_internal_verify_odb_sdb(n5_profile):
    """SNP counts consistent between the scaffold table and the SNV
    table at max mm (reference: test_utils._internal_verify_OdbSdb,
    300-317)."""
    sdb = n5_profile.get("cumulative_scaffold_table")
    odb = n5_profile.get("cumulative_snv_table")
    top = sdb.sort_values("mm").drop_duplicates(subset="scaffold",
                                                keep="last")
    if len(odb) == 0:
        assert top["divergent_site_count"].sum() == 0
        return
    otop = odb.sort_values("mm").drop_duplicates(
        subset=["scaffold", "position"], keep="last")
    for scaffold, row in top.set_index("scaffold").iterrows():
        o = otop[otop["scaffold"] == scaffold]
        assert row["divergent_site_count"] == len(o), scaffold


def test_attribute_parity_vs_v13_golden(n5_profile):
    """Our profile directory carries every attribute the reference's
    v1.3.0g golden profile carries (directory-level component parity)."""
    gold_attrs = pd.read_csv(GOLD_13 + "/raw_data/attributes.tsv",
                             sep="\t")["name"].tolist()
    ours = set(n5_profile.keys())
    skip = set()
    missing = [a for a in gold_attrs if a not in ours and a not in skip]
    assert not missing, missing


def test_genome_info_content(n5_profile):
    gdb = n5_profile.get("genome_level_info")
    assert gdb["genome"].nunique() >= 2
    nr = gdb.sort_values("mm").drop_duplicates(subset="genome",
                                               keep="last")
    assert (nr["breadth"] <= 1).all()
    assert (nr["coverage"] > 0).all()


def test_batch_engine_matches_dense_real_data(tmp_path, ref_null_model):
    """The production batch engine on >=50 real scaffolds reproduces the
    dense engine's tables."""
    if not os.path.exists(BAM):
        pytest.skip("N5_271 fixtures not available")
    from instrain_tpu.profile.pipeline import profile
    outs = {}
    for engine in ("dense", "batch"):
        cfg = ProfileConfig(output=str(tmp_path / engine),
                            skip_plot_generation=True,
                            skip_genome_wide=True, gene_file=GENES)
        cfg.engine = engine
        cfg.variant.null_model = ref_null_model
        outs[engine] = profile(BAM, FASTA, cfg)

    for tbl in ("cumulative_snv_table", "cumulative_scaffold_table",
                "raw_linkage_table", "genes_coverage", "genes_SNP_count"):
        a = outs["dense"].get(tbl).reset_index(drop=True)
        b = outs["batch"].get(tbl).reset_index(drop=True)
        assert len(a) == len(b), tbl
        if len(a) == 0:
            continue
        key = [c for c in a.columns[:3]]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
            check_dtype=False, check_exact=False, rtol=1e-5, atol=1e-7)

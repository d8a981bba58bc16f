"""
Gene-profiling tests: codon machinery against the reference's
count_sites / characterize_SNPs (oracle), and gene parsing.
"""

import numpy as np
import pandas as pd
import pytest

from instrain_tpu.profile import genes
from reference_oracle import import_reference

GENES_FNA = ("/root/reference/test/test_data/"
             "N5_271_010G1_scaffold_min1000.fa.genes.fna")
GENBANK = "/root/reference/test/test_data/sars_cov_2_MT039887.1.gb"


@pytest.fixture(scope="module")
def gp_oracle():
    return import_reference("inStrain.GeneProfile")


def test_count_sites_oracle(gp_oracle):
    rng = np.random.default_rng(0)
    for _ in range(50):
        n_codons = rng.integers(2, 60)
        seq = "".join(rng.choice(list("ACGT"), n_codons * 3))
        ref_s, ref_n = gp_oracle.count_sites(seq)
        our_s, our_n = genes.count_sites(seq)
        assert abs(ref_s - our_s) < 1e-9, seq
        assert abs(ref_n - our_n) < 1e-9, seq


def test_translate_standard_table():
    assert genes.translate("ATGGCT") == "MA"
    assert genes.translate("TAATAGTGA") == "***"
    assert genes.revcomp("ATGC") == "GCAT"


def test_parse_prodigal():
    gd = genes.parse_genes(GENES_FNA)
    assert len(gd.gene_table) > 0
    row = gd.gene_table.iloc[0]
    seq = gd.gene2sequence[row["gene"]]
    assert (row["end"] - row["start"]) + 1 == len(seq)
    assert row["direction"] in ("1", "-1")
    # scaffold naming: gene minus trailing _N
    assert row["gene"].startswith(row["scaffold"])


def test_parse_genbank():
    gd = genes.parse_genes(GENBANK)
    assert len(gd.gene_table) > 0
    assert "MT039887.1" in gd.scaff2genes
    # the sars genome has the S (spike) gene annotated
    assert any(g == "S" for g in gd.gene_table["gene"])
    srow = gd.gene_table[gd.gene_table["gene"] == "S"].iloc[0]
    seq = gd.gene2sequence["S"]
    assert seq.startswith("ATG")
    assert genes.translate(seq).endswith("*")


def test_characterize_snps_synthetic():
    """A known synonymous and non-synonymous mutation classify right."""
    gdb = pd.DataFrame([{"gene": "g1", "scaffold": "s", "direction": "1",
                         "partial": False, "start": 10, "end": 21}])
    g2s = {"g1": "ATGGCTGCTTAA"}  # M A A *
    # position 15 = third base of codon 2 (GCT -> GCC: synonymous)
    sdb = pd.DataFrame([
        {"position": 15, "con_base": "C", "var_base": "C",
         "ref_base": "T"},
        # position 14 = second base of codon 2 (GCT -> GTT: A->V)
        {"position": 14, "con_base": "T", "var_base": "T",
         "ref_base": "C"},
    ])
    out = genes.characterize_snps(gdb, sdb, g2s)
    assert list(out["mutation_type"]) == ["S", "N"]
    assert out["mutation"].iloc[1].startswith("N:A")


def test_gene_profiling_on_sars(sars_profiled):
    """End-to-end gene profiling with the sars GenBank genes."""
    from instrain_tpu.profile.tables import cumulative_snv_table, snp_table
    gd = genes.parse_genes(GENBANK)
    st = sars_profiled["stats"]
    csnv = cumulative_snv_table(snp_table(st, sars_profiled["ref_codes"]))
    cdb, cldb, ldb, sdb = genes.profile_genes_for_scaffold(
        "MT039887.1", gd, st, csnv)
    assert len(cdb) > 0 and len(cldb) > 0
    assert set(sdb["mutation_type"].dropna()) <= {"N", "S", "I", "M"}
    # dN/dS exists for some genes
    assert "pNpS_variants" in ldb.columns
    cov_nr = (cdb.sort_values("mm")
              .drop_duplicates(subset=["gene"], keep="last"))
    # gene coverage should be in the ballpark of scaffold coverage
    assert cov_nr["coverage"].median() > 10

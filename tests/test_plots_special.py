"""
Plot smoke tests for all 10 numbered plots + remaining special cases
(lowercase reference bases, --use_full_fasta_header).
Reference: test/tests/test_plotting.py:23-277, test_profile.py:251-254.
"""

import os

import pytest

D = "/root/reference/test/test_data/"
BAM = D + "N5_271_010G1_scaffold_failureScaffold.sorted.bam"
FASTA = D + "N5_271_010G1_scaffold_failureScaffold.fa"
GENES = D + "N5_271_010G1_scaffold_failureScaffold.fa.genes.fna.fa"

pytestmark = pytest.mark.skipif(not os.path.exists(BAM),
                                reason="test data missing")


@pytest.fixture(scope="module")
def plotted_profile(tmp_path_factory, ref_null_model):
    from instrain_tpu.config import ProfileConfig
    from instrain_tpu.profile.pipeline import profile
    base = tmp_path_factory.mktemp("plots")
    stb = base / "g.stb"
    with open(stb, "w") as f:
        f.write("N5_271_010G1_scaffold_0\tgenomeA\n")
        f.write("FailureScaffoldHeaderTesting\tgenomeA\n")
    out = str(base / "p.IS")
    cfg = ProfileConfig(output=out, gene_file=GENES, stb=[str(stb)],
                        skip_plot_generation=True)
    cfg.variant.null_model = ref_null_model
    profile(BAM, FASTA, cfg)
    return out


def test_all_profile_plots(plotted_profile):
    """Plots 1-9 generate non-trivial PDFs (reference numbering)."""
    from instrain_tpu.plotting.controller import make_plots
    make_plots(plotted_profile,
               plots=[str(i) for i in range(1, 10)])
    figdir = os.path.join(plotted_profile, "figures")
    pdfs = [f for f in os.listdir(figdir) if f.endswith(".pdf")]
    # some plots legitimately skip on tiny data (e.g. no linkage decay
    # fit), but the majority must materialize with substance
    assert len(pdfs) >= 5, pdfs
    for f in pdfs:
        assert os.path.getsize(os.path.join(figdir, f)) > 1000, f


def test_compare_dendrogram_plot(plotted_profile, tmp_path, ref_null_model):
    from instrain_tpu.config import CompareConfig
    from instrain_tpu.compare.pipeline import compare
    from instrain_tpu.plotting.controller import make_plots
    bam2 = tmp_path / "c2.bam"
    os.symlink(BAM, bam2)
    out2 = str(tmp_path / "p2.IS")
    from instrain_tpu.config import ProfileConfig
    from instrain_tpu.profile.pipeline import profile
    cfg = ProfileConfig(output=out2, skip_plot_generation=True,
                        skip_genome_wide=True)
    cfg.variant.null_model = ref_null_model
    profile(str(bam2), FASTA, cfg)
    rc_out = str(tmp_path / "rc")
    stb = tmp_path / "g.stb"
    with open(stb, "w") as f:
        f.write("N5_271_010G1_scaffold_0\tgenomeA\n")
    ccfg = CompareConfig(output=rc_out, null_model=ref_null_model,
                         stb=[str(stb)], skip_plot_generation=True)
    compare([plotted_profile, out2], ccfg)
    make_plots(rc_out, plots=["10"])
    figdir = os.path.join(rc_out, "figures")
    pdfs = [f for f in os.listdir(figdir) if f.endswith(".pdf")]
    assert len(pdfs) >= 1, pdfs


def test_lowercase_reference_bases(tmp_path, sars_bam, sars_ref_seq,
                                   ref_null_model):
    """Lowercase bases in the reference FASTA are uppercased on load;
    no lowercase ref_base ever appears (reference: test_profile.py:251-254
    via fasta.py:25 .upper())."""
    from instrain_tpu.config import ProfileConfig
    from instrain_tpu.profile.pipeline import profile
    from instrain_tpu.store.profile_dir import ProfileDir
    seq = bytearray(sars_ref_seq.tobytes())
    # lowercase a 100-base stretch in a covered region
    seq[1000:1100] = seq[1000:1100].lower()
    fasta = tmp_path / "lc.fasta"
    with open(fasta, "w") as f:
        f.write(">MT039887.1\n" + seq.decode() + "\n")
    out = str(tmp_path / "lc.IS")
    cfg = ProfileConfig(output=out, skip_plot_generation=True,
                        skip_genome_wide=True)
    cfg.filter.maximum_reads = 15000
    cfg.variant.null_model = ref_null_model
    profile(sars_bam, str(fasta), cfg)
    sdb = ProfileDir(out).get("raw_snp_table")
    assert len(sdb) > 0
    assert not sdb["ref_base"].str.islower().any()
    assert not sdb["con_base"].str.islower().any()


def test_use_full_fasta_header(tmp_path, sars_bam, sars_ref_seq,
                               ref_null_model):
    """--use_full_fasta_header keys scaffolds by the full header line
    (reference: profile/fasta.py:23-27)."""
    from instrain_tpu.io import fasta as fio
    fasta = tmp_path / "h.fasta"
    with open(fasta, "w") as f:
        f.write(">MT039887.1 Severe acute respiratory syndrome\n"
                + sars_ref_seq.tobytes().decode() + "\n")
    short = fio.ScaffoldRegistry.from_fasta(str(fasta))
    full = fio.ScaffoldRegistry.from_fasta(str(fasta),
                                           use_full_header=True)
    assert short.names == ["MT039887.1"]
    assert full.names == ["MT039887.1 Severe acute respiratory syndrome"]


def test_plot_genome_filters(plotted_profile):
    """--genomes and --minimum_breadth restrict which genomes plot
    (reference: plotting/utilities.py:9-39)."""
    from instrain_tpu.plotting import plots as P
    from instrain_tpu.store.profile_dir import ProfileDir
    isdir = ProfileDir(plotted_profile)
    # the fixture's stb maps everything to genomeA
    assert P._allowed_scaffolds(isdir, genomes=["genomeA"])
    assert P._allowed_scaffolds(isdir, genomes=["nope"]) == set()
    # genomes list wins over breadth
    assert P._allowed_scaffolds(isdir, genomes=["genomeA"],
                                minimum_breadth=2.0)
    # an impossible breadth excludes everything
    assert P._allowed_scaffolds(isdir, minimum_breadth=1.01) == set()
    # mb=0 disables filtering
    assert P._allowed_scaffolds(isdir, minimum_breadth=0) is None

    # end-to-end: a filtered-out genome yields an empty/failed plot set
    from instrain_tpu.plotting.controller import make_plots
    done = make_plots(plotted_profile, plots=["1"], genomes=["nope"])
    done_ok = make_plots(plotted_profile, plots=["1"],
                         genomes=["genomeA"])
    assert "1" in done_ok
    assert done == [] or done == ["1"]  # empty df may still render axes

"""
End-to-end CLI smoke tests: every subcommand drives the real pipeline
through cli.main(argv) on the small test BAM (reference: the v1.9.1 CLI
surface, argumentParser.py:55-398).
"""

import os

import pandas as pd
import pytest

from instrain_tpu import cli

D = "/root/reference/test/test_data/"
BAM = D + "N5_271_010G1_scaffold_failureScaffold.sorted.bam"
FASTA = D + "N5_271_010G1_scaffold_failureScaffold.fa"
GENES = D + "N5_271_010G1_scaffold_failureScaffold.fa.genes.fna.fa"

pytestmark = pytest.mark.skipif(not os.path.exists(BAM),
                                reason="test data missing")


@pytest.fixture(scope="module")
def cli_profile(tmp_path_factory, ref_null_model):
    base = tmp_path_factory.mktemp("cli")
    out = str(base / "prof.IS")
    stb = base / "g.stb"
    with open(stb, "w") as f:
        f.write("N5_271_010G1_scaffold_0\tgenomeA\n")
        f.write("FailureScaffoldHeaderTesting\tgenomeA\n")
    rc = cli.main(["profile", BAM, FASTA, "-o", out,
                   "-g", GENES, "-s", str(stb),
                   "--null_model", ref_null_model,
                   "--skip_plot_generation"])
    assert rc == 0
    return out, str(stb)


def test_profile_outputs(cli_profile):
    out, _ = cli_profile
    base = os.path.basename(out.rstrip("/")) + "_"
    outdir = os.path.join(out, "output")
    produced = set(os.listdir(outdir))
    for t in ("SNVs", "scaffold_info", "mapping_info", "gene_info",
              "genome_info"):
        assert base + t + ".tsv" in produced, (t, produced)
    snv = pd.read_csv(os.path.join(outdir, base + "SNVs.tsv"), sep="\t")
    assert len(snv) > 0


def test_genome_wide_cli(cli_profile):
    out, stb = cli_profile
    assert cli.main(["genome_wide", "-i", out, "-s", stb]) == 0
    from instrain_tpu.store.profile_dir import ProfileDir
    gdb = ProfileDir(out).get("genome_level_info")
    assert "genomeA" in set(gdb["genome"])


def test_profile_genes_cli(cli_profile):
    out, _ = cli_profile
    assert cli.main(["profile_genes", "-i", out, "-g", GENES]) == 0
    from instrain_tpu.store.profile_dir import ProfileDir
    gdb = ProfileDir(out).get("genes_table")
    assert len(gdb) > 0


def test_plot_cli(cli_profile):
    out, _ = cli_profile
    assert cli.main(["plot", "-i", out, "-pl", "1", "2"]) == 0
    figs = os.listdir(os.path.join(out, "figures"))
    assert any(f.endswith(".pdf") for f in figs), figs


def test_filter_reads_cli(tmp_path):
    out = str(tmp_path / "fr")
    assert cli.main(["filter_reads", BAM, FASTA, "-o", out]) == 0
    assert os.path.exists(os.path.join(out, "mapping_info.csv"))


def test_quick_profile_cli(tmp_path):
    out = str(tmp_path / "qp")
    assert cli.main(["quick_profile", BAM, FASTA, "-o", out]) == 0
    files = os.listdir(out)
    assert any("coverm" in f.lower() or "genomeCoverage" in f
               for f in files) or files


def test_compare_cli(tmp_path, cli_profile, ref_null_model):
    out1, _ = cli_profile
    # compare rejects identical bam basenames -> profile a symlinked copy
    bam2 = tmp_path / "copy2.bam"
    os.symlink(BAM, bam2)
    out2 = str(tmp_path / "prof2.IS")
    assert cli.main(["profile", str(bam2), FASTA, "-o", out2,
                     "--null_model", ref_null_model,
                     "--skip_plot_generation", "--skip_genome_wide"]) == 0
    rc_out = str(tmp_path / "rc")
    assert cli.main(["compare", "-i", out1, out2, "-o", rc_out,
                     "--null_model", ref_null_model,
                     "--skip_plot_generation"]) == 0
    base = os.path.basename(rc_out.rstrip("/")) + "_"
    files = os.listdir(os.path.join(rc_out, "output"))
    assert base + "comparisonsTable.tsv" in files, files


def test_parse_annotations_cli(tmp_path, cli_profile):
    out, _ = cli_profile
    from instrain_tpu.store.profile_dir import ProfileDir
    gdb = ProfileDir(out).load_output("gene_info")
    anno = tmp_path / "anno.csv"
    with open(anno, "w") as f:
        f.write("gene,anno\n")
        for g in gdb["gene"].head(5):
            f.write(f"{g},K00001\n")
    pa_out = str(tmp_path / "pa")
    assert cli.main(["parse_annotations", "-i", out, "-a", str(anno),
                     "-o", pa_out, "-b", "0"]) == 0
    files = os.listdir(os.path.join(pa_out, "output"))
    assert "SampleAnnotationTotals.csv" in files, files


def test_other_run_statistics_cli(cli_profile, capsys):
    out, _ = cli_profile
    assert cli.main(["other", "--run_statistics", out]) == 0
    assert "Run report" in capsys.readouterr().out


def test_check_deps_cli(capsys):
    assert cli.main(["check_deps"]) == 0
    assert "jax" in capsys.readouterr().out


def test_cli_surface_matches_reference():
    """Every reference subcommand and flag exists here (argumentParser.py
    whole surface); our only extras are --engine and --null_model."""
    import argparse
    from reference_oracle import import_reference
    ra = import_reference("inStrain.argumentParser")
    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def fake(self, args=None, namespace=None):
        captured["parser"] = self
        return argparse.Namespace()

    argparse.ArgumentParser.parse_args = fake
    try:
        ra.parse_args(["profile", "x", "y"])
    finally:
        argparse.ArgumentParser.parse_args = orig

    def surface(top):
        subs = next(a for a in top._actions
                    if isinstance(a, argparse._SubParsersAction))
        out = {}
        for name, sp in subs.choices.items():
            opts = set()
            for act in sp._actions:
                opts.update(act.option_strings)
                if not act.option_strings and act.dest != "help":
                    opts.add("<pos>" + act.dest)
            out[name] = opts
        return out

    ref = surface(captured["parser"])
    ours = surface(cli.build_parser())
    assert set(ref) <= set(ours), set(ref) - set(ours)
    allowed_extra = {"--engine", "--null_model", "--mesh_devices",
                     "--distributed"}
    for name in ref:
        missing = ref[name] - ours[name]
        assert not missing, (name, missing)
        extra = ours[name] - ref[name] - allowed_extra
        assert not extra, (name, extra)

    def defaults(top):
        subs = next(a for a in top._actions
                    if isinstance(a, argparse._SubParsersAction))
        return {name: {a.dest: a.default for a in sp._actions
                       if a.dest != "help"}
                for name, sp in subs.choices.items()}

    rdef, odef = defaults(captured["parser"]), defaults(cli.build_parser())
    # deliberate divergences: [] vs None for nargs='*' (both falsy);
    # filter_reads -o has a usable default here (the reference crashes
    # on os.path.isdir(None) without -o)
    allowed_diff = {("compare", "bams"), ("filter_reads", "output")}
    for name in rdef:
        for dest, dv in rdef[name].items():
            if (name, dest) in allowed_diff:
                continue
            assert odef[name][dest] == dv, (name, dest, dv,
                                            odef[name][dest])


def test_quick_profile_coverage_matches_naive(tmp_path):
    """The vectorized event gather (contiguous slice AND ragged-ranges
    branches) must equal a naive per-record accumulation — the ragged
    branch triggers when a non-primary record sits between primaries."""
    import numpy as np
    from instrain_tpu.io.bgzf import (bam_header, bam_record, nm_tag,
                                      write_bgzf)
    from instrain_tpu.profile.quick_profile import quick_profile

    L = 300
    seq = "ACGT" * 15  # 60 bp
    qual = bytes([40]) * 60
    cigar = [(60, "M")]
    parts = [bam_header([("s0", L), ("s1", L)])]
    # s0: primaries interleaved with a SUPPLEMENTARY record (flag 0x800)
    parts.append(bam_record("a", 0, 0, 0, 42, cigar, -1, -1, 0, seq,
                            qual, nm_tag(0)))
    parts.append(bam_record("b", 0x800, 0, 50, 42, cigar, -1, -1, 0,
                            seq, qual, nm_tag(0)))
    parts.append(bam_record("c", 0, 0, 100, 42, cigar, -1, -1, 0, seq,
                            qual, nm_tag(0)))
    # s1: contiguous primaries only
    parts.append(bam_record("d", 0, 1, 10, 42, cigar, -1, -1, 0, seq,
                            qual, nm_tag(0)))
    parts.append(bam_record("e", 0, 1, 40, 42, cigar, -1, -1, 0, seq,
                            qual, nm_tag(0)))
    bam_path = str(tmp_path / "qp.bam")
    write_bgzf(bam_path, b"".join(parts))
    fasta = str(tmp_path / "qp.fa")
    with open(fasta, "w") as f:
        f.write(">s0\n" + "A" * L + "\n>s1\n" + "A" * L + "\n")

    out = str(tmp_path / "qpo")
    quick_profile(bam_path, fasta, output=out)
    import pandas as pd
    cdb = pd.read_csv(os.path.join(out, "coverm_raw.tsv"), sep="\t")
    row0 = cdb[cdb["Contig"] == "s0"].iloc[0]
    row1 = cdb[cdb["Contig"] == "s1"].iloc[0]
    # s0: two 60bp primaries (supplementary excluded) -> 120 covered
    assert row0["Read Count"] == 2
    assert row0["Covered Bases"] == 120
    assert abs(row0["Mean"] - 120 / L) < 1e-12
    # s1: overlap 40..69 double-covered -> 90 covered bases, mean 120/L
    assert row1["Read Count"] == 2
    assert row1["Covered Bases"] == 90
    assert abs(row1["Mean"] - 120 / L) < 1e-12

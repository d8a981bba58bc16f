"""
Auxiliary scripts run end-to-end (reference:
test/tests/test_auxiliary_scripts.py:24-77 drives them the same way).
"""

import json
import os
import subprocess
import sys

import pytest

D = "/root/reference/test/test_data/"
BAM = D + "N5_271_010G1_scaffold_failureScaffold.sorted.bam"
FASTA = D + "N5_271_010G1_scaffold_failureScaffold.fa"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not os.path.exists(BAM),
                                reason="test data missing")


def _run(script, args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "auxiliary_scripts", script)]
        + args, capture_output=True, text=True, env=env, timeout=500)


def test_rarefaction_curve(tmp_path):
    out = str(tmp_path / "rc")
    r = _run("rarefaction_curve.py",
             [BAM, FASTA, "-o", out, "-s", "0.5", "1.0"])
    assert r.returncode == 0, r.stderr[-2000:]
    files = os.listdir(out)
    assert any("rarefaction" in f or f.endswith((".json", ".tsv", ".csv"))
               for f in files), files


def test_recluster_compare(tmp_path, sars_bam, sars_ref_seq,
                           ref_null_model):
    # build a tiny compare output to recluster
    from instrain_tpu.config import CompareConfig, ProfileConfig
    from instrain_tpu.profile.pipeline import profile
    from instrain_tpu.compare.pipeline import compare

    fasta = tmp_path / "s.fasta"
    with open(fasta, "w") as f:
        f.write(">MT039887.1\n" + sars_ref_seq.tobytes().decode() + "\n")
    stb = tmp_path / "g.stb"
    with open(stb, "w") as f:
        f.write("MT039887.1\tsars\n")
    outs = []
    for seed in (1, 2):
        bam_link = tmp_path / f"s{seed}.bam"
        os.symlink(sars_bam, bam_link)
        out = str(tmp_path / f"s{seed}.IS")
        cfg = ProfileConfig(output=out, seed=seed,
                            skip_plot_generation=True,
                            skip_genome_wide=True)
        cfg.filter.maximum_reads = 15000
        cfg.variant.null_model = ref_null_model
        profile(str(bam_link), str(fasta), cfg)
        outs.append(out)
    rc_out = str(tmp_path / "rc")
    ccfg = CompareConfig(output=rc_out, null_model=ref_null_model,
                         stb=[str(stb)], skip_plot_generation=True)
    compare(outs, ccfg)

    out_tsv = str(tmp_path / "reclustered.tsv")
    r = _run("recluster_compare.py",
             ["-i", rc_out, "-a", "0.99", "-o", out_tsv])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out_tsv)

"""
Pallas fused site-stats kernel vs the XLA version (interpret mode on CPU;
the compiled path is exercised on real TPU via `--engine pallas` and the
bench). site_stats_pallas_full is the production wrapper behind
`--engine pallas` (profile/pipeline.py).
"""

import numpy as np

import jax

from instrain_tpu.kernels.nullmodel import analytic_null_thresholds
from instrain_tpu.kernels.sitestats import freq_min_count_lut, site_stats
import instrain_tpu.kernels.pallas_sitestats as P


def _inputs(M=8, L=2048, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 8, (M, 4, L)).astype(np.int32)
    counts[rng.random((M, 4, L)) < 0.5] = 0
    refs = rng.integers(0, 5, L).astype(np.uint8)
    null_lut = analytic_null_thresholds(max_coverage=500)
    freq_lut = freq_min_count_lut(0.05, max_coverage=500)
    return counts, refs, null_lut, freq_lut


def test_pallas_core_matches_xla():
    counts, refs, null_lut, freq_lut = _inputs()
    out_p = {k: np.asarray(v) for k, v in P.pallas_site_stats(
        counts, refs, null_lut, freq_lut, tile=512,
        interpret=True).items()}
    out_x = {k: np.asarray(v) for k, v in site_stats(
        counts, refs, null_lut, freq_lut, jax.random.PRNGKey(0)).items()}
    for k in ["total", "morphia", "con", "var", "row", "cls"]:
        assert np.array_equal(out_p[k], out_x[k]), k
    assert np.array_equal(np.isnan(out_p["clon"]), np.isnan(out_x["clon"]))
    d = np.abs(np.nan_to_num(out_p["clon"]) - np.nan_to_num(out_x["clon"]))
    assert d.max() < 1e-6


def test_pallas_full_wrapper_matches_site_stats():
    """The `--engine pallas` wrapper returns the complete site_stats
    output dict; every field matches the XLA kernel (the rarefied clonR
    uses the identical key/draw scheme, so it matches bit-exactly)."""
    counts, refs, null_lut, freq_lut = _inputs(M=5, L=1111, seed=3)
    key = jax.random.PRNGKey(7)
    # pad like run_site_stats would (site_stats needs no padding; the
    # wrapper pads internally to the tile size and slices back)
    out_p = {k: np.asarray(v) for k, v in P.site_stats_pallas_full(
        counts, refs, null_lut, freq_lut, key, min_cov=5, min_covR=20,
        rarefied_draws=20, tile=512, interpret=True).items()}
    out_x = {k: np.asarray(v) for k, v in site_stats(
        counts, refs, null_lut, freq_lut, key, min_cov=5, min_covR=20,
        rarefied_draws=20).items()}
    assert set(out_p) == set(out_x)
    for k in sorted(out_x):
        a, b = out_p[k], out_x[k]
        assert a.shape == b.shape, k
        if a.dtype.kind == "f":
            assert np.array_equal(np.isnan(a), np.isnan(b)), k
            d = np.abs(np.nan_to_num(a) - np.nan_to_num(b))
            assert d.max() < 1e-6, (k, d.max())
        else:
            assert np.array_equal(a, b), k


def test_pallas_engine_profile(tmp_path, sars_bam, ref_null_model,
                               sars_ref_seq):
    """`--engine pallas` drives a real profile and matches the dense
    engine's SNV table (small subsample: interpret mode is slow)."""
    from instrain_tpu.profile.pipeline import profile
    from instrain_tpu.config import ProfileConfig
    import pandas as pd

    fa = tmp_path / "sars.fasta"
    seq = sars_ref_seq.tobytes().decode()
    fa.write_text(">MT039887.1\n" + seq + "\n")
    outs = {}
    for engine in ("dense", "pallas"):
        cfg = ProfileConfig(output=str(tmp_path / engine),
                            skip_plot_generation=True,
                            skip_genome_wide=True)
        cfg.engine = engine
        cfg.variant.null_model = ref_null_model
        cfg.filter.maximum_reads = 3000
        cfg.rarefied_coverage = 8
        outs[engine] = profile(sars_bam, str(fa), cfg)
    a = outs["dense"].get("cumulative_snv_table").reset_index(drop=True)
    b = outs["pallas"].get("cumulative_snv_table").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    ca = outs["dense"].get("cumulative_scaffold_table")
    cb = outs["pallas"].get("cumulative_scaffold_table")
    for col in ca.columns:
        if ca[col].dtype.kind in "fc":
            np.testing.assert_allclose(ca[col], cb[col], rtol=1e-5,
                                       atol=1e-7, equal_nan=True,
                                       err_msg=col)
        else:
            assert (ca[col] == cb[col]).all(), col

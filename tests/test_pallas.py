"""
Pallas fused site-stats kernel vs the XLA version (interpret mode on CPU;
the compiled path is exercised on real TPU by bench/tpu runs).
"""

import functools

import numpy as np
import pytest

import jax
from jax.experimental import pallas as pl

from instrain_tpu.kernels.nullmodel import analytic_null_thresholds
from instrain_tpu.kernels.sitestats import freq_min_count_lut, site_stats
import instrain_tpu.kernels.pallas_sitestats as P


@pytest.fixture()
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def test_pallas_matches_xla(interpret_pallas):
    rng = np.random.default_rng(0)
    M, L = 8, 2048
    counts = rng.integers(0, 8, (M, 4, L)).astype(np.int32)
    counts[rng.random((M, 4, L)) < 0.5] = 0
    refs = rng.integers(0, 5, L).astype(np.uint8)
    null_lut = analytic_null_thresholds(max_coverage=500)
    freq_lut = freq_min_count_lut(0.05, max_coverage=500)

    out_p = {k: np.asarray(v) for k, v in P.pallas_site_stats(
        counts, refs, null_lut, freq_lut, tile=512).items()}
    out_x = {k: np.asarray(v) for k, v in site_stats(
        counts, refs, null_lut, freq_lut, jax.random.PRNGKey(0)).items()}
    for k in ["total", "morphia", "con", "var", "row", "cls"]:
        assert np.array_equal(out_p[k], out_x[k]), k
    assert np.array_equal(np.isnan(out_p["clon"]), np.isnan(out_x["clon"]))
    d = np.abs(np.nan_to_num(out_p["clon"]) - np.nan_to_num(out_x["clon"]))
    assert d.max() < 1e-6

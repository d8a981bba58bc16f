"""
Multi-device sharding tests on the 8-device virtual CPU mesh.
"""

import jax
import numpy as np
import pytest

from instrain_tpu.kernels.nullmodel import analytic_null_thresholds
from instrain_tpu.kernels.sitestats import freq_min_count_lut
from instrain_tpu.parallel.mesh import (make_mesh, pad_to_tiles,
                                        sharded_scaffold_summary)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_pad_to_tiles():
    counts = np.arange(3 * 4 * 1000).reshape(3, 4, 1000).astype(np.int32)
    refs = np.zeros(1000, np.uint8)
    tiles, rp, valid = pad_to_tiles(counts, refs, 256, 8)
    assert tiles.shape[0] % 8 == 0
    assert valid.sum() == 1000
    # round-trip the data
    rec = tiles.transpose(1, 2, 0, 3).reshape(3, 4, -1)[:, :, :1000]
    assert np.array_equal(rec, counts)


def test_sharded_summary_matches_host(mesh8):
    rng = np.random.default_rng(1)
    M, L = 5, 5000
    counts = rng.integers(0, 10, (M, 4, L)).astype(np.int32)
    counts[rng.random((M, 4, L)) < 0.5] = 0
    refs = rng.integers(0, 4, L).astype(np.uint8)
    null_lut = analytic_null_thresholds(max_coverage=1000)
    freq_lut = freq_min_count_lut(0.05, max_coverage=1000)

    out = sharded_scaffold_summary(counts, refs, mesh8, null_lut, freq_lut,
                                   tile_len=128)
    cum = np.cumsum(counts.sum(axis=1), axis=0)     # [M, L]
    assert np.array_equal(out["coverage_sum"], cum.sum(axis=1))
    assert np.array_equal(out["covered"], (cum > 0).sum(axis=1))
    assert np.array_equal(out["counted"], (cum >= 5).sum(axis=1))
    # clonality sum agrees with the single-chip kernel within tolerance
    from instrain_tpu.kernels.sitestats import site_stats
    full = site_stats(counts, refs, null_lut, freq_lut,
                      jax.random.PRNGKey(0))
    clon = np.asarray(full["clon"])
    host_clon = np.nansum(clon, axis=1)
    assert np.allclose(out["clon_sum"], host_clon, rtol=1e-5)


def test_scaling_equivalence(mesh8):
    """Same aggregates regardless of mesh size (1 vs 8 devices)."""
    rng = np.random.default_rng(2)
    counts = rng.integers(0, 6, (3, 4, 2048)).astype(np.int32)
    refs = rng.integers(0, 4, 2048).astype(np.uint8)
    null_lut = analytic_null_thresholds(max_coverage=100)
    freq_lut = freq_min_count_lut(0.05, max_coverage=100)
    out8 = sharded_scaffold_summary(counts, refs, mesh8, null_lut,
                                    freq_lut, tile_len=128)
    mesh1 = make_mesh(1)
    out1 = sharded_scaffold_summary(counts, refs, mesh1, null_lut,
                                    freq_lut, tile_len=128)
    for k in out8:
        assert np.allclose(out8[k], out1[k], rtol=1e-6), k

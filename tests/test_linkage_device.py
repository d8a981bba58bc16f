"""
Device LD kernel (kernels/linkage.py) vs the host numpy path: the
deterministic raw_linkage_table columns must be identical; the rarefied
columns are PRNG-sourced (device counter-based vs host generator) and
are only range-checked.
"""

import numpy as np
import pandas as pd

from instrain_tpu.profile import linkage as lk


def test_device_ld_matches_host(sars_profiled):
    st = sars_profiled["stats"]
    ws = lk.window_starts_for(st.pileup.length, 10000)
    host = lk.calculate_linkage(st, ws, min_snp=20, engine="host")
    dev = lk.calculate_linkage(st, ws, min_snp=20, engine="device")
    assert len(host) == len(dev) > 0

    det = [c for c in lk.LINKAGE_COLUMNS
           if c not in ("r2_normalized", "d_prime_normalized")]
    for col in det:
        a, b = host[col].values, dev[col].values
        if host[col].dtype.kind == "f":
            np.testing.assert_allclose(a, b, atol=1e-12, rtol=1e-12,
                                       equal_nan=True, err_msg=col)
        else:
            assert (a == b).all(), col

    for col in ("r2_normalized", "d_prime_normalized"):
        v = dev[col].values
        ok = ~np.isnan(v)
        assert (v[ok] >= -1 - 1e-9).all() and (v[ok] <= 1 + 1e-9).all(), col


def test_device_ld_min_snp_gate(sars_profiled):
    """A higher min_snp gates identically on both paths."""
    st = sars_profiled["stats"]
    ws = lk.window_starts_for(st.pileup.length, 10000)
    host = lk.calculate_linkage(st, ws, min_snp=100, engine="host")
    dev = lk.calculate_linkage(st, ws, min_snp=100, engine="device")
    assert len(host) == len(dev)
    if len(host):
        for col in ("position_A", "position_B", "mm", "total"):
            assert (host[col].values == dev[col].values).all(), col

#!/usr/bin/env python
"""
XLA vs Pallas site-stats core on the real device (manual; not driver-run).

Times the full site_stats output dict both ways on a typical padded
scaffold shape, min over repeats, device-resident inputs + a single
block_until_ready per call so the relay link stays out of the number.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from instrain_tpu.kernels.nullmodel import analytic_null_thresholds
    from instrain_tpu.kernels.sitestats import (freq_min_count_lut,
                                                site_stats)
    from instrain_tpu.kernels.pallas_sitestats import site_stats_pallas_full

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    M, L = 24, 1 << 16
    counts = rng.integers(0, 12, (M, 4, L)).astype(np.int32)
    counts[rng.random((M, 4, L)) < 0.6] = 0
    refs = rng.integers(0, 4, L).astype(np.uint8)
    null_lut = analytic_null_thresholds(max_coverage=10000)
    freq_lut = freq_min_count_lut(0.05)
    key = jax.random.PRNGKey(0)

    counts_d = jax.device_put(counts)
    refs_d = jax.device_put(refs)

    def run_xla():
        return site_stats(counts_d, refs_d, null_lut, freq_lut, key)

    def run_pallas():
        return site_stats_pallas_full(counts_d, refs_d, null_lut,
                                      freq_lut, key, interpret=interpret)

    # block_until_ready does not synchronize through the axon relay:
    # time a pipelined batch of calls closed by ONE tiny scalar fetch
    # (np.asarray forces completion of everything queued before it)
    N = 10

    def timed(fn):
        np.asarray(fn()["total"].sum())  # compile + settle
        t0 = time.perf_counter()
        out = None
        for _ in range(N):
            out = fn()
        np.asarray(out["total"].sum())
        return (time.perf_counter() - t0) / N

    out = {"shape": [M, 4, L], "backend": jax.default_backend()}
    for name, fn in (("xla", run_xla), ("pallas", run_pallas)):
        dt = min(timed(fn) for _ in range(3))
        out[f"{name}_s"] = round(dt, 4)
        out[f"{name}_cells_per_s"] = round(M * L / dt, 1)
    if out.get("xla_s") and out.get("pallas_s"):
        out["pallas_speedup"] = round(out["xla_s"] / out["pallas_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

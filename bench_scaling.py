#!/usr/bin/env python
"""
Scaling harness: the sharded profile step at 1..N devices on a virtual CPU
mesh (real multi-chip is validated by the driver's dryrun; this measures
the sharding overhead / scaling efficiency of the step itself).

Prints one JSON line per mesh size plus a summary efficiency figure.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from instrain_tpu.kernels.nullmodel import analytic_null_thresholds
    from instrain_tpu.kernels.sitestats import freq_min_count_lut
    from instrain_tpu.parallel.mesh import (make_mesh,
                                            sharded_scaffold_summary)

    rng = np.random.default_rng(0)
    M, L = 8, 1 << 20  # 1M positions
    counts = rng.integers(0, 6, (M, 4, L)).astype(np.int32)
    counts[rng.random((M, 4, L)) < 0.7] = 0
    refs = rng.integers(0, 4, L).astype(np.uint8)
    null_lut = analytic_null_thresholds(max_coverage=1000)
    freq_lut = freq_min_count_lut(0.05, max_coverage=1000)

    times = {}
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(n)
        # warm
        sharded_scaffold_summary(counts, refs, mesh, null_lut, freq_lut,
                                 tile_len=4096)
        # min over repeats: this host's CPU is noisy (2-3x run-to-run
        # swings); the min measures the step, not the scheduler weather
        reps = []
        for _ in range(5):
            t0 = time.time()
            sharded_scaffold_summary(counts, refs, mesh, null_lut,
                                     freq_lut, tile_len=4096)
            reps.append(time.time() - t0)
        dt = min(reps)
        times[n] = dt
        print(json.dumps({"mesh_devices": n, "step_s": round(dt, 4),
                          "positions_per_sec": round(L / dt, 1)}))
    if 1 in times and 2 in times:
        eff2 = times[1] / (2 * times[2])
        print(json.dumps({"metric": "scaling_efficiency_1to2",
                          "value": round(eff2, 3)}))
    if 1 in times and 8 in times:
        eff8 = times[1] / (8 * times[8])
        print(json.dumps({"metric": "scaling_efficiency_1to8",
                          "value": round(eff8, 3)}))


if __name__ == "__main__":
    main()

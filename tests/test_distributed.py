"""
Multi-host module (parallel/distributed.py): scaffold assignment balance,
single-process passthroughs. (Real multi-host is exercised by the driver
via __graft_entry__.dryrun_multichip; these cover the host-side logic.)
"""

import numpy as np
import pandas as pd

from instrain_tpu.parallel.distributed import (allgather_tables,
                                               assign_scaffolds_to_hosts,
                                               init_distributed,
                                               my_scaffolds)


def test_assignment_partitions_and_balances():
    rng = np.random.default_rng(3)
    pairs = {f"s{i}": int(rng.integers(1, 10000)) for i in range(100)}
    for n_hosts in (1, 2, 3, 8):
        bins = assign_scaffolds_to_hosts(pairs, n_hosts)
        assert len(bins) == n_hosts
        flat = [s for b in bins for s in b]
        assert sorted(flat) == sorted(pairs)  # exact partition
        loads = [sum(pairs[s] for s in b) for b in bins]
        # greedy largest-first: heaviest bin within max-item of lightest
        assert max(loads) - min(loads) <= max(pairs.values())


def test_assignment_deterministic():
    pairs = {"a": 5, "b": 5, "c": 1}
    assert (assign_scaffolds_to_hosts(pairs, 2) ==
            assign_scaffolds_to_hosts(pairs, 2))


def test_single_process_passthroughs():
    init_distributed()  # no-op
    init_distributed(num_processes=1)  # no-op
    tables = [pd.DataFrame({"x": [1, 2]})]
    out = allgather_tables(tables)
    assert out is tables
    pairs = {"a": 10, "b": 1}
    mine = my_scaffolds(pairs)
    assert sorted(mine) == ["a", "b"]  # single process owns everything

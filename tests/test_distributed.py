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


def test_two_process_profile_matches_single(tmp_path, ref_null_model):
    """END-TO-END multi-host: two jax.distributed processes on localhost
    each profile only their owned scaffolds, allgather the per-scaffold
    payloads (pickle-over-allgather, parallel/distributed.py), and both
    assemble tables identical to a single-process run."""
    import os
    import socket
    import subprocess
    import sys
    import time

    D = "/root/reference/test/test_data/"
    bam = D + "N5_271_010G1_scaffold_failureScaffold.sorted.bam"
    fasta = D + "N5_271_010G1_scaffold_failureScaffold.fa"
    if not os.path.exists(bam):
        import pytest
        pytest.skip("test data missing")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 2 virtual devices per process: 2 procs share 2 host cores here
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    outs = [str(tmp_path / f"p{i}.IS") for i in range(2)]
    procs = []
    logs = []
    for i in range(2):
        log = open(str(tmp_path / f"worker{i}.log"), "wb")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(i), "2", port, bam, fasta,
             ref_null_model, outs[i]],
            env=env, stdout=log, stderr=subprocess.STDOUT))
        time.sleep(1.0)  # serial start: be gentle to the 2-core host
    deadline = time.time() + 900
    for p in procs:
        p.wait(timeout=max(deadline - time.time(), 1))
    for log in logs:
        log.close()
    for i, p in enumerate(procs):
        txt = open(str(tmp_path / f"worker{i}.log")).read()
        assert p.returncode == 0 and "WORKER_OK" in txt, \
            f"worker {i} failed:\n{txt[-3000:]}"

    # each worker really did profile only a strict subset, AND the
    # decode itself was sharded (.bai-ranged; round-5: decode/filter no
    # longer replicate on every host)
    for i in range(2):
        log = open(str(outs[i]) + "/log/log.log").read()
        assert "owns 1 of 2 scaffolds" in log, "scaffolds were not split"
        assert "sharded decode: host" in log, \
            "ranged sharded decode did not run"

    # single-process run for the golden comparison
    from instrain_tpu.config import ProfileConfig
    from instrain_tpu.profile.pipeline import profile
    from instrain_tpu.store.profile_dir import ProfileDir
    cfg = ProfileConfig(output=str(tmp_path / "single.IS"),
                        skip_plot_generation=True, skip_genome_wide=True)
    cfg.variant.null_model = ref_null_model
    single = profile(bam, fasta, cfg)

    tables = ("raw_snp_table", "cumulative_snv_table",
              "cumulative_scaffold_table", "raw_linkage_table",
              "window_table", "mapping_info")
    for out in outs:
        pd_dir = ProfileDir(out)
        for tbl in tables:
            a = single.get(tbl).reset_index(drop=True)
            b = pd_dir.get(tbl).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          obj=tbl)
        for special in ("covT", "clonT", "clonTR"):
            ca, cb = single.get(special), pd_dir.get(special)
            assert set(ca) == set(cb)
            for sc in ca:
                assert set(ca[sc]) == set(cb[sc])
                for mm in ca[sc]:
                    pd.testing.assert_series_equal(ca[sc][mm], cb[sc][mm])

#!/usr/bin/env python
"""
Multi-host scaling-efficiency benchmark (BASELINE target: >=0.8
efficiency from 1 host to 2 hosts). Real TPU pods are not reachable from
this environment, so the 2-host DCN topology is SIMULATED faithfully on
CPU: two jax.distributed processes on localhost, each pinned to its own
physical core (this host has exactly 2), running the REAL multi-host
profile() path — greedy scaffold ownership, per-host profiling, pickled
payload allgather before table assembly (profile/pipeline.py multi_host
branch; reference analogue: the whole process-pool runtime, SURVEY
§2.16).

Workload: synthetic multi-scaffold metagenome (bench_batch.synth; its
.bai lets each host ranged-decode only its owned scaffolds — round 5
sharded the decode and filter stages too, with the global insert median
crossing as an allgathered histogram). Efficiency = T_1host /
(2 * T_2host) on the steady (second, post-compile) in-process run;
phases from the run's own checkpoint log.

Prints one JSON line. Not run by the driver.
"""

import json
import os
import socket
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

S = int(os.environ.get("INSTRAIN_MH_S", 16))
L = int(os.environ.get("INSTRAIN_MH_L", 20_000))
REPO = os.path.dirname(os.path.abspath(__file__))


def run_workers(nproc, bam, fasta, workdir, tag):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs, logs = [], []
    for i in range(nproc):
        log = open(os.path.join(workdir, f"{tag}{i}.log"), "wb")
        logs.append(log)
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(i % 2), sys.executable,
             os.path.join(REPO, "bench_multihost_worker.py"),
             str(i), str(nproc), port, bam, fasta,
             os.path.join(workdir, f"{tag}{i}")],
            env=env, stdout=log, stderr=subprocess.STDOUT))
        time.sleep(1.0)
    try:
        for p in procs:
            p.wait(timeout=1800)
    finally:
        # never orphan a core-pinned sibling: if one worker hangs or the
        # coordinator dies, kill the rest (exact PIDs, never by pattern)
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
        for log in logs:
            log.close()
    outs = []
    for i in range(nproc):
        txt = open(os.path.join(workdir, f"{tag}{i}.log")).read()
        assert procs[i].returncode == 0, f"worker {i}:\n{txt[-3000:]}"
        outs.append(json.loads(
            [ln for ln in txt.splitlines() if ln.startswith("{")][-1]))
    return outs


def main():
    import bench_batch
    bench_batch.S, bench_batch.L = S, L
    workdir = tempfile.mkdtemp(prefix="bench_mh_")
    fasta, bam, n_pairs = bench_batch.synth(workdir)

    # this host's wall times swing ~±30% run to run (shared memory bus,
    # page cache, background load); MIN over repeats estimates the
    # clean-machine time, the same convention every bench here uses for
    # relay weather (CLAUDE.md)
    repeats = int(os.environ.get("INSTRAIN_MH_REPEATS", 3))
    ones, twos = [], []
    for rep in range(repeats):
        ones.append(run_workers(1, bam, fasta, workdir, f"single{rep}_")[0])
        twos.append(run_workers(2, bam, fasta, workdir, f"dist{rep}_"))
    one = min(ones, key=lambda w: w["steady_s"])
    two = min(twos, key=lambda ws: max(w["steady_s"] for w in ws))
    t1 = one["steady_s"]
    t2 = max(w["steady_s"] for w in two)

    # correctness gate: under the production "primary" store policy,
    # host 0's output (streamed-own + gathered-remainder hd5) must equal
    # the 1-host run table-for-table; host 1 writes no tables
    import pandas as pd
    from instrain_tpu.store.profile_dir import ProfileDir
    ref = ProfileDir(os.path.join(workdir, "single0_0.steady0.IS"))
    got = ProfileDir(os.path.join(workdir, "dist0_0.steady0.IS"))
    for tbl in ("raw_snp_table", "cumulative_scaffold_table",
                "raw_linkage_table"):
        pd.testing.assert_frame_equal(
            ref.get(tbl).reset_index(drop=True),
            got.get(tbl).reset_index(drop=True), check_dtype=False)
    ca, cb = ref.get("covT"), got.get("covT")
    assert set(ca) == set(cb), "covT scaffold sets differ"
    for sc in ca:
        assert set(ca[sc]) == set(cb[sc])
        for mm in ca[sc]:
            pd.testing.assert_series_equal(ca[sc][mm], cb[sc][mm],
                                           check_dtype=False)
    peer = ProfileDir(os.path.join(workdir, "dist0_1.steady0.IS"))
    assert peer.get("raw_snp_table") is None, \
        "primary store policy: peer hosts must not write tables"
    speedup = t1 / t2
    # the profile stage alone (round 5: decode/filter shard too, so this
    # isolates the batch-engine portion)
    p1 = one["phases"].get("profile_scaffolds", t1)
    p2 = max(w["phases"].get("profile_scaffolds", t2) for w in two)
    print(json.dumps({
        "metric": "multihost_scaling_efficiency",
        "value": round(speedup / 2, 3),
        "unit": "T1 / (2 * T2), steady in-process, 1 core per host",
        "speedup": round(speedup, 2),
        "scaffolds": S, "pairs": n_pairs,
        "t1_s": t1, "t2_s": t2,
        "t1_all_s": [w["steady_s"] for w in ones],
        "t2_all_s": [max(w["steady_s"] for w in ws) for ws in twos],
        "profile_stage_speedup": round(p1 / p2, 2) if p2 else None,
        "profile_stage_efficiency": round(p1 / p2 / 2, 3) if p2 else None,
        "one": one, "two": two,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""
Benchmark: end-to-end `profile` throughput on the sars-cov-2 test BAM.

Metric: filtered read pairs per second through the full profile pipeline
(decode -> filter -> pileup -> site-stats kernel -> SNV/linkage/scaffold
tables), steady-state (second run, kernels compiled).

Baseline: the reference's internal scheduler cost model of
0.0061401594694834305 s/pair + overhead (~163 pairs/s/core;
inStrain/profile/profile_controller.py:460-465) at its documented 6-core
operating point => 977 pairs/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BAM = ("/root/reference/test/test_data/"
       "sars_cov_2_MT039887.1.fasta.bt2-vs-SRR11140750.sorted.bam")
GB = "/root/reference/test/test_data/sars_cov_2_MT039887.1.gb"

BASELINE_PAIRS_PER_SEC = 6 / 0.0061401594694834305  # 6-core reference


def load_ref():
    txt = open(GB).read()
    seq = "".join(re.findall("[a-zA-Z]+",
                             txt.split("ORIGIN")[1].split("//")[0])).upper()
    return np.frombuffer(seq.encode(), dtype=np.uint8)


def run_once(refseq, luts):
    from instrain_tpu.config import ReadFilterConfig
    from instrain_tpu.io.bam import decode_bam
    from instrain_tpu.io.fasta import seq_to_codes
    from instrain_tpu.profile import compact
    from instrain_tpu.profile import linkage as linkage_mod
    from instrain_tpu.profile import tables
    from instrain_tpu.profile.filter_reads import filter_reads
    from instrain_tpu.profile.pileup import build_scaffold_pileup_padded

    bam = decode_bam(BAM, ref_seqs={"MT039887.1": refseq}, baq=False)
    pairs = filter_reads(bam, ReadFilterConfig())
    pu = build_scaffold_pileup_padded(bam, pairs, 0, len(refseq))
    rc = seq_to_codes(refseq)
    # compact path: stats + table inputs computed on device, KB-scale
    # device->host transfers
    cs = compact.run_site_stats_compact(pu, rc, *luts)
    snp = compact.snp_table_compact(cs, rc)
    csnv = tables.cumulative_snv_table(snp)
    ctab = compact.coverage_table_compact(cs)
    ws = linkage_mod.window_starts_for(len(refseq), 10000)
    ld = linkage_mod.calculate_linkage(cs, ws, min_snp=20)
    n_pairs = int(pairs.mapping_info["filtered_pairs"].iloc[0])
    n_reads = int(pairs.mapping_info["unfiltered_reads"].iloc[0])
    return n_pairs, n_reads, len(snp), len(ld)


def main():
    # persistent compile cache: repeated bench runs skip the slow first
    # compile (the axon remote-compile path costs minutes otherwise)
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from instrain_tpu.profile.pileup import make_luts
    from instrain_tpu.config import VariantConfig

    refseq = load_ref()
    luts = make_luts(VariantConfig())

    # warmup (compiles kernels; also warms the throttled host's page cache
    # and CPU governor — early native-decode calls run ~20x slow)
    t0 = time.time()
    n_pairs, n_reads, n_snvs, n_ld = run_once(refseq, luts)
    warm = time.time() - t0

    # steady state: best of several iterations. The TPU is reached over a
    # shared stdio relay whose device<->host latency varies by minutes run
    # to run; min over repeats measures the pipeline, not relay weather.
    steadies = []
    for _ in range(6):
        t0 = time.time()
        run_once(refseq, luts)
        steadies.append(time.time() - t0)
    steady = min(steadies)

    pairs_per_sec = n_pairs / steady
    positions_per_sec = len(refseq) / steady
    result = {
        "metric": "profile_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "read pairs/s (end-to-end profile, steady-state)",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
        "detail": {
            "bam": os.path.basename(BAM),
            "filtered_pairs": n_pairs,
            "records": n_reads,
            "snv_rows": n_snvs,
            "linkage_rows": n_ld,
            "warmup_s": round(warm, 2),
            "steady_s": round(steady, 2),
            "steady_all_s": [round(s, 2) for s in steadies],
            "baseline_pairs_per_sec": round(BASELINE_PAIRS_PER_SEC, 1),
            "positions_per_sec": round(positions_per_sec, 1),
            "reads_per_sec": round(n_reads / steady, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

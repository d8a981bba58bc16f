#!/usr/bin/env python
"""Stage-by-stage timing of the bench.py steady-state iteration (TPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

import bench as B


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from instrain_tpu.config import ReadFilterConfig, VariantConfig
    from instrain_tpu.io.bam import decode_bam
    from instrain_tpu.io.fasta import seq_to_codes
    from instrain_tpu.profile import compact
    from instrain_tpu.profile import linkage as linkage_mod
    from instrain_tpu.profile import tables
    from instrain_tpu.profile.filter_reads import filter_reads
    from instrain_tpu.profile.pileup import (build_scaffold_pileup_padded
                                             as build_scaffold_pileup,
                                             make_luts)

    refseq = B.load_ref()
    luts = make_luts(VariantConfig())

    # warmup full
    B.run_once(refseq, luts)

    # measure raw link characteristics
    x16 = np.zeros((32, 4, 32768), np.int32)
    t0 = time.time(); d = jax.device_put(x16); d.block_until_ready()
    print(f"device_put 16.8MB: {time.time()-t0:.4f}s", flush=True)
    t0 = time.time()
    for _ in range(5):
        s = jax.device_get(d[0, 0, :8])
    print(f"tiny device_get x5: {time.time()-t0:.4f}s", flush=True)
    x8 = np.zeros((32, 4, 32768), np.int16)
    t0 = time.time(); d8 = jax.device_put(x8); d8.block_until_ready()
    print(f"device_put 8.4MB int16: {time.time()-t0:.4f}s", flush=True)

    for it in range(2):
        t = {}
        t0 = time.time()
        bam = decode_bam(B.BAM, ref_seqs={"MT039887.1": refseq}, baq=False)
        t["decode"] = time.time() - t0
        t0 = time.time()
        pairs = filter_reads(bam, ReadFilterConfig())
        t["filter"] = time.time() - t0
        t0 = time.time()
        pu = build_scaffold_pileup(bam, pairs, 0, len(refseq))
        t["build_counts"] = time.time() - t0
        rc = seq_to_codes(refseq)
        t0 = time.time()
        cs = compact.run_site_stats_compact(pu, rc, *luts)
        t["site_stats_compact"] = time.time() - t0
        t0 = time.time()
        snp = compact.snp_table_compact(cs, rc)
        csnv = tables.cumulative_snv_table(snp)
        ctab = compact.coverage_table_compact(cs)
        t["tables"] = time.time() - t0
        t0 = time.time()
        ws = linkage_mod.window_starts_for(len(refseq), 10000)
        ld = linkage_mod.calculate_linkage(cs, ws, min_snp=20)
        t["linkage"] = time.time() - t0
        tot = sum(t.values())
        print(f"iter{it}: total {tot:.3f}s " +
              " ".join(f"{k}={v:.3f}" for k, v in t.items()), flush=True)


if __name__ == "__main__":
    main()

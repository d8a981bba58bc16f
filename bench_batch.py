#!/usr/bin/env python
"""
Metagenome-scale benchmark: full `profile` over a synthetic multi-scaffold
assembly, exercising the batch engine (vmapped same-bucket kernel
launches + u8 wire format). The sars benchmark (bench.py, the driver's
headline metric) measures the single-scaffold path; this measures the
many-scaffold production path where launches amortize relay latency.

Synthesizes S scaffolds x L bp with planted strain variants and paired
reads at ~COV coverage, writes a SAM, runs the profile pipeline twice
(warm + steady) and reports steady-state filtered-pairs/s vs the
reference's 6-core cost-model baseline (977 pairs/s; see BASELINE.md).

Run by the driver THROUGH bench.py (bench.bench_batch_metagenome imports
synth + the size constants); standalone manual run:
`python bench_batch.py [--cpu]`. INSTRAIN_BENCH_S / INSTRAIN_BENCH_L
override the workload size (CPU smoke tests).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

S = int(os.environ.get("INSTRAIN_BENCH_S", 128))   # scaffolds
L = int(os.environ.get("INSTRAIN_BENCH_L", 40_000))  # bp each -> 5.12 Mbp
COV = 30         # target coverage
READ = 150       # read length
INSERT = 300     # outer insert size
BASELINE_PAIRS_PER_SEC = 6 / 0.0061401594694834305

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def synth(workdir: str, seed: int = 7):
    """Synthetic metagenome mapping written as a REAL BGZF BAM (the text
    SAM path costs ~10x more decode time and would dominate the bench)."""
    from instrain_tpu.io.bgzf import (bam_header, bam_record, nm_tag,
                                      write_bgzf)
    rng = np.random.default_rng(seed)
    fasta = os.path.join(workdir, "synth.fasta")
    bam = os.path.join(workdir, "synth.bam")
    n_pairs_per_scaffold = int(L * COV / (2 * READ))
    refs = {}
    with open(fasta, "w") as f:
        for s in range(S):
            seq = BASES[rng.integers(0, 4, L)]
            refs[f"scaf_{s}"] = seq
            f.write(f">scaf_{s}\n{seq.tobytes().decode()}\n")

    qual = bytes([40]) * READ  # Q40 >= the pileup's min_base_quality 30
    cigar = [(READ, "M")]
    parts = [bam_header([(f"scaf_{s}", L) for s in range(S)])]
    qid = 0
    for s in range(S):
        ref = refs[f"scaf_{s}"]
        # plant strain SNVs: ~1 per kb at 30% allele frequency
        snv_pos = rng.choice(L, L // 1000, replace=False)
        snv_alt = BASES[(np.searchsorted(BASES, ref[snv_pos]) +
                         rng.integers(1, 4, len(snv_pos))) % 4]
        starts = np.sort(rng.integers(0, L - INSERT,
                                      n_pairs_per_scaffold))
        recs = []
        for p0 in starts:
            p1 = p0 + INSERT - READ
            pair = []
            for pos, flag in ((int(p0), 99), (int(p1), 147)):
                seq = ref[pos:pos + READ].copy()
                # planted variants on ~30% of reads
                m = (snv_pos >= pos) & (snv_pos < pos + READ)
                nm = 0
                if m.any() and rng.random() < 0.3:
                    seq[snv_pos[m] - pos] = snv_alt[m]
                    nm = int(m.sum())
                tlen = INSERT if flag == 99 else -INSERT
                pair.append((pos, flag, seq.tobytes().decode(), nm, tlen))
            a, b = pair
            recs.append((a[0], bam_record(
                f"r{qid}", a[1], s, a[0], 42, cigar, s, b[0], a[4], a[2],
                qual, nm_tag(a[3]))))
            recs.append((b[0], bam_record(
                f"r{qid}", b[1], s, b[0], 42, cigar, s, a[0], b[4], b[2],
                qual, nm_tag(b[3]))))
            qid += 1
        recs.sort(key=lambda r: r[0])
        parts.extend(r[1] for r in recs)
    write_bgzf(bam, b"".join(parts))
    # minimal .bai: lets multi-host runs take the ranged sharded-decode
    # path (the reference's fixtures ship samtools indexes)
    from instrain_tpu.io.bai import make_bai
    make_bai(bam)
    return fasta, bam, S * n_pairs_per_scaffold


def run_once(sam, fasta, out):
    from instrain_tpu.config import ProfileConfig
    from instrain_tpu.profile.pipeline import profile
    cfg = ProfileConfig(output=out, skip_plot_generation=True,
                        skip_genome_wide=True)
    cfg.engine = "batch"
    isdir = profile(sam, fasta, cfg)
    return isdir


def main():
    import tempfile
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    workdir = tempfile.mkdtemp(prefix="bench_batch_")
    t0 = time.time()
    fasta, sam, n_pairs = synth(workdir)
    gen_s = time.time() - t0

    t0 = time.time()
    run_once(sam, fasta, os.path.join(workdir, "warm.IS"))
    warm = time.time() - t0

    steadies = []
    for i in range(3):
        t0 = time.time()
        isdir = run_once(sam, fasta, os.path.join(workdir, f"s{i}.IS"))
        steadies.append(time.time() - t0)
    steady = min(steadies)
    snvs = isdir.get("cumulative_snv_table")

    print(json.dumps({
        "metric": "batch_profile_pairs_per_sec",
        "value": round(n_pairs / steady, 1),
        "unit": "read pairs/s (end-to-end multi-scaffold profile)",
        "vs_baseline": round(n_pairs / steady / BASELINE_PAIRS_PER_SEC, 2),
        "detail": {
            "scaffolds": S, "positions": S * L, "pairs": n_pairs,
            "snv_rows": 0 if snvs is None else len(snvs),
            "gen_s": round(gen_s, 2), "warmup_s": round(warm, 2),
            "steady_s": round(steady, 2),
            "steady_all_s": [round(x, 2) for x in steadies],
            "positions_per_sec": round(S * L / steady, 1),
        },
    }))


if __name__ == "__main__":
    main()

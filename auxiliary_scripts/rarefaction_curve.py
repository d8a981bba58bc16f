#!/usr/bin/env python
"""
Rarefaction curve: profile a BAM at decreasing read depths and report how
key metrics respond (reference: auxiliary_scripts/rarefaction_curve.py,
which subsamples with sambamba/samtools; here subsampling is the native
deterministic template-level subsample).

Usage: rarefaction_curve.py bam fasta -o outdir [-s 0.1 0.25 0.5 1.0]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("bam")
    p.add_argument("fasta")
    p.add_argument("-o", "--output", default="rarefaction_out")
    p.add_argument("-s", "--subsets", nargs="*", type=float,
                   default=[0.1, 0.25, 0.5, 0.75, 1.0])
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from instrain_tpu.config import ProfileConfig
    from instrain_tpu.io.bam import decode_bam
    from instrain_tpu.profile.pipeline import profile
    from instrain_tpu.store import generate as gen
    from instrain_tpu.store.profile_dir import ProfileDir

    n_records = decode_bam(args.bam, baq=False, tweak_overlaps=False).n_records
    os.makedirs(args.output, exist_ok=True)
    rows = []
    for frac in sorted(args.subsets):
        out = os.path.join(args.output, f"subset_{frac}.IS")
        cfg = ProfileConfig(output=out, skip_plot_generation=True,
                            seed=args.seed)
        cfg.filter.maximum_reads = max(int(n_records * frac), 1) \
            if frac < 1 else None
        isdir = profile(args.bam, args.fasta, cfg)
        db = gen.nonredundant_scaffold_table(ProfileDir(out))
        rows.append({
            "fraction": frac,
            "mean_coverage": float(db["coverage"].mean()),
            "mean_breadth": float(db["breadth"].mean()),
            "divergent_sites": int(db["divergent_site_count"].sum()),
        })
        print(json.dumps(rows[-1]))
    import pandas as pd
    pd.DataFrame(rows).to_csv(
        os.path.join(args.output, "rarefaction_curve.tsv"), sep="\t",
        index=False)


if __name__ == "__main__":
    main()

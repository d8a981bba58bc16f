"""
Device-side linkage-disequilibrium kernel.

Takes the captured within-read SNV base pairs of one scaffold (host
enumeration is a cheap native event scan, profile/linkage.py:
capture_read_pairs) and computes, fully on device, the per-(edge, mm)
LD rows of the reference's raw_linkage_table
(inStrain/profile/linkage.py:46-240): cumulative combo counts over the
mm axis, major/minor alleles at each end, the single-allele/total
gates, r2 / D', and rarefied (min_snp-draw multinomial) variants.

Everything is fixed-shape: pairs pad to a power-of-two capacity and
edges are pre-grouped on host (np.unique of the position-pair key — a
trivial scan) so the kernel sees static [E, M, 16] scatter targets.
Output rows for invalid (gated) cells carry valid=False.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("E", "M", "min_snp"))
def ld_device(e_idx, mm_idx, combo, n_pairs, c1, c2, present1, present2,
              rng_key, E: int, M: int, min_snp: int = 20):
    """
    Args:
      e_idx, mm_idx, combo: int32 [Ncap] (pad entries carry e_idx = -1)
      n_pairs: number of real entries
      c1, c2: int32 [E, M, 4] cumulative base counts at each edge's two
        positions (from the compact kernel's per-SNV-position profiles)
      present1, present2: bool [E, M] exact-mm coverage presence
      rng_key: PRNG key for the rarefied draw
    Returns dict of [E, M]-shaped arrays + valid mask.
    """
    pad_ok = e_idx >= 0
    flat = (e_idx * M + mm_idx) * 16 + combo
    flat = jnp.where(pad_ok, flat, 0)
    cnt = jnp.zeros((E * M * 16,), jnp.int32).at[flat].add(
        pad_ok.astype(jnp.int32)).reshape(E, M, 16)
    cumcombo = jnp.cumsum(cnt, axis=1)                    # [E, M, 16]

    both_present = present1 & present2
    sums_ok = (c1.sum(axis=2) + c2.sum(axis=2)) >= min_snp

    # stable descending sort keeps ACTG tie order (reference:
    # sorted(d, key=d.get, reverse=True), linkage.py:133-136)
    o1 = jnp.argsort(-c1, axis=2, stable=True)
    o2 = jnp.argsort(-c2, axis=2, stable=True)
    A, a_ = o1[:, :, 0], o1[:, :, 1]
    B, b_ = o2[:, :, 0], o2[:, :, 1]

    def take(c, idx):
        return jnp.take_along_axis(c, idx[:, :, None], axis=2)[:, :, 0]

    A_c, a_c = take(c1, A), take(c1, a_)
    B_c, b_c = take(c2, B), take(c2, b_)
    nonzero_ok = (A_c > 0) & (a_c > 0) & (B_c > 0) & (b_c > 0)

    def combo_at(x, y):
        return jnp.take_along_axis(cumcombo, (x * 4 + y)[:, :, None],
                                   axis=2)[:, :, 0]

    AB, Ab = combo_at(A, B), combo_at(A, b_)
    aB, ab = combo_at(a_, B), combo_at(a_, b_)
    total = AB + Ab + aB + ab
    total_ok = total > min_snp
    has_combo_exact = cnt.sum(axis=2) > 0

    valid = (both_present & sums_ok & nonzero_ok & total_ok &
             has_combo_exact)

    tot_f = jnp.maximum(total, 1).astype(jnp.float64)
    fAB = AB / tot_f
    fAb = Ab / tot_f
    faB = aB / tot_f
    fab = ab / tot_f
    r2, d_prime = _ld_math_jnp(fAB, fAb, faB, fab)

    # rarefied draw: min_snp haplotypes from the observed frequencies
    # (deterministic counter-based multinomial; the reference's is an
    # unseeded np.random.choice, linkage.py:200)
    cdf = jnp.cumsum(jnp.stack([fAB, fAb, faB, fab], axis=-1),
                     axis=-1)                              # [E, M, 4]
    u = jax.random.uniform(rng_key, (E, M, min_snp), dtype=jnp.float64)
    cat = (u[:, :, :, None] > cdf[:, :, None, :3]).sum(axis=-1)  # [E,M,S]
    draws = (cat[:, :, :, None] ==
             jnp.arange(4)[None, None, None, :]).sum(axis=2)     # [E,M,4]
    rf = draws / float(min_snp)
    r2n, d_primen = _ld_math_jnp(rf[:, :, 0], rf[:, :, 1], rf[:, :, 2],
                                 rf[:, :, 3])

    return dict(valid=valid, AB=AB, Ab=Ab, aB=aB, ab=ab, total=total,
                A=A, a=a_, B=B, b=b_, r2=r2, d_prime=d_prime,
                r2_normalized=r2n, d_prime_normalized=d_primen)


def _ld_math_jnp(fAB, fAb, faB, fab):
    """r2 and D' from haplotype frequencies (reference linkage.py:168-228).
    IEEE division semantics (inf/nan on zero denominators) mirror the
    host numpy implementation (profile/linkage._ld_math) exactly."""
    fA = fAB + fAb
    fa = fab + faB
    fB = fAB + faB
    fb = fab + fAb
    linkD = fAB - fA * fB
    r2 = jnp.where((fa == 0) | (fA == 0) | (fB == 0) | (fb == 0), jnp.nan,
                   linkD * linkD / (fA * fa * fB * fb))
    linkd = fab - fa * fb
    nan = jnp.full_like(linkd, jnp.nan)
    neg = linkd < 0
    d_prime = jnp.where(neg, linkd / jnp.maximum(-fA * fB, -fa * fb), nan)
    d_prime = jnp.where((linkD > 0) & ~neg,
                        linkd / jnp.minimum(fA * fb, fa * fB), d_prime)
    return r2, d_prime

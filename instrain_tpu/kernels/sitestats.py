"""
Per-site statistics kernel: the hot core of profiling.

Takes the dense per-scaffold pileup count tensor counts[M, 4, L]
(M = number of distinct read-pair mismatch levels, 4 = ACTG, L = positions)
and produces, for every (mm level, position) cell, the quantities the
reference computes per pileup column in
inStrain/profile/snv_utilities.py:update_snp_table (40-145) and
call_snv_site (147-196):

  - cumulative counts over mm' <= mm (the "mm-level" axis, SURVEY §0)
  - clonality = sum((c_i/total)^2) where total >= min_cov (and a rarefied
    variant drawn at rarefied_coverage)
  - null-model SNV calls: a base is "present" iff its count clears the
    coverage-dependent null threshold AND the min_freq fraction; the
    morphia (allele count) plus consensus/variant bases follow
  - SNP classes (SNS/SNV/con_SNV/pop_SNV/DivergentSite/AmbiguousReference)
  - the cryptic-SNV state machine over ascending mm levels

Exact-arithmetic parity: both the null threshold and the frequency cutoff
are integer LUT lookups (see nullmodel.py and freq_min_count_lut), so no
device float comparison can flip a call at a boundary.

Everything is jit-compatible with static shapes; the mm axis only includes
levels observed on the scaffold, and cells where the exact-mm coverage is
zero are masked out (the reference only visits present levels).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# class codes (order matches reference string names for table emission)
CLASS_NAMES = ["SNS", "SNV", "con_SNV", "pop_SNV", "DivergentSite",
               "AmbiguousReference"]
SNS, SNV, CON_SNV, POP_SNV, DIVERGENT, AMBIG = range(6)

# call codes
CALL_UNCOUNTED = -2  # coverage below min_cov (reference: None)
CALL_NOSNP = -1      # one dominant reference base (reference: -1)


def freq_min_count_lut(min_freq: float, max_coverage: int = 10000) -> np.ndarray:
    """
    LUT: for each total coverage T, the smallest count c with
    float64(c / T) >= min_freq — reproducing the reference's float division
    semantics (snv_utilities.py:179) with integer comparisons on device.
    """
    T = np.arange(max_coverage + 1, dtype=np.float64)
    c = np.ceil(min_freq * T).astype(np.int64)
    # fix boundary rounding: the true smallest c may be c-1 or c+1
    for delta in (-1, 0, 1):
        cc = c + delta
        with np.errstate(divide="ignore", invalid="ignore"):
            ok = (cc.astype(np.float64) / np.maximum(T, 1)) >= min_freq
        c = np.where(ok & (cc >= 0), np.minimum(c, cc), c)
    c[0] = 0
    return c.astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("min_cov", "min_covR", "rarefied_draws"))
def site_stats(counts, ref_codes, null_lut, freq_lut, rng_key,
               min_cov: int = 5, min_covR: int = 50,
               rarefied_draws: int = 50) -> Dict[str, jnp.ndarray]:
    """
    Args:
      counts: int32 [M, 4, L] — exact-mm base counts per position
      ref_codes: uint8 [L] — reference base codes (A0 C1 T2 G3, 4=other)
      null_lut: int32 [maxcov+1] — null-model min alternate count by coverage
      freq_lut: int32 [maxcov+1] — min count satisfying min_freq by coverage
      rng_key: PRNG key for the rarefied draws

    Returns dict of [M, L]-shaped arrays (see kernel docstring) plus
    position-level [L] summaries.
    """
    M, B, L = counts.shape
    maxcov = null_lut.shape[0] - 1

    exact_total = counts.sum(axis=1)                    # [M, L]
    present = exact_total > 0                           # [M, L]

    cum = jnp.cumsum(counts, axis=0)                    # [M, 4, L]
    total = cum.sum(axis=1)                             # [M, L]
    total_c = jnp.minimum(total, maxcov)

    # ---- null-model base presence ----
    min_bases = null_lut[total_c]                       # [M, L]
    freq_min = freq_lut[total_c]                        # [M, L]
    thresh = jnp.maximum(min_bases, freq_min)[:, None, :]
    base_present = cum >= thresh                        # [M, 4, L]
    morphia = base_present.sum(axis=1).astype(jnp.int8)  # [M, L]

    # consensus base: argmax over ACTG (ties -> lowest code, like np.argmax)
    con = jnp.argmax(cum, axis=1).astype(jnp.int8)      # [M, L]
    # var base: argmax after zeroing consensus
    con_onehot = jax.nn.one_hot(con, 4, axis=1, dtype=cum.dtype)  # [M,4,L]
    cum_novar = cum * (1 - con_onehot)
    var = jnp.argmax(cum_novar, axis=1).astype(jnp.int8)

    counted = total >= min_cov                          # [M, L]
    ref_b = ref_codes.astype(jnp.int32)                 # [L]
    con_is_ref = con.astype(jnp.int32) == ref_b[None, :]

    # call: base (0..3) if morphia>1, or morphia==1 & con!=ref, or
    # morphia==0; else NOSNP; UNCOUNTED if total<min_cov
    is_base_call = (morphia > 1) | ((morphia == 1) & ~con_is_ref) | (morphia == 0)
    call = jnp.where(is_base_call, con.astype(jnp.int8),
                     jnp.int8(CALL_NOSNP))
    call = jnp.where(counted, call, jnp.int8(CALL_UNCOUNTED))

    # a table row is emitted at (mm, pos) iff the level is present at the
    # position and the call is a base (update_snp_table:104-127)
    row = present & counted & is_base_call              # [M, L]

    # ---- SNP class ----
    # ref base count at cumulative level
    ref_sel = jax.nn.one_hot(jnp.clip(ref_b, 0, 3), 4, axis=0,
                             dtype=cum.dtype)           # [4, L]
    ref_count = (cum * ref_sel[None, :, :]).sum(axis=1)  # [M, L]
    ref_present = (ref_count >= min_bases) & (ref_count >= freq_min)
    var_is_ref = var.astype(jnp.int32) == ref_b[None, :]

    cls = jnp.where(
        ref_b[None, :] >= 4, jnp.int8(AMBIG),
        jnp.where(
            morphia == 0, jnp.int8(DIVERGENT),
            jnp.where(
                morphia == 1, jnp.int8(SNS),
                jnp.where(
                    con_is_ref, jnp.int8(SNV),
                    jnp.where(var_is_ref | ref_present,
                              jnp.int8(CON_SNV), jnp.int8(POP_SNV))))))

    # ---- clonality ----
    totf = total.astype(jnp.float32)
    with jax.numpy_dtype_promotion("standard"):
        p = cum.astype(jnp.float32) / jnp.maximum(totf, 1.0)[:, None, :]
    clon_val = (p * p).sum(axis=1)                      # [M, L]
    clon_set = present & counted
    clon = jnp.where(clon_set, clon_val, jnp.nan)

    # ---- rarefied clonality (multinomial draw of rarefied_draws reads) ----
    clonR_set = present & (total >= min_covR)
    # categorical draws via cumulative probabilities, accumulated over a
    # scan to bound memory at [M, 4, L] per step
    cdf = jnp.cumsum(p, axis=1)                         # [M, 4, L]

    def draw(carry, key):
        u = jax.random.uniform(key, (M, 1, L), dtype=jnp.float32)
        cat = (u > cdf[:, :3, :]).sum(axis=1)           # [M, L] in 0..3
        onehot = (cat[:, None, :] ==
                  jnp.arange(4, dtype=cat.dtype)[None, :, None])
        return carry + onehot.astype(jnp.float32), None

    keys = jax.random.split(rng_key, rarefied_draws)
    rcounts, _ = jax.lax.scan(draw, jnp.zeros((M, 4, L), jnp.float32), keys)
    rp = rcounts / float(rarefied_draws)                # [M, 4, L]
    clonR_val = (rp * rp).sum(axis=1)
    clonR = jnp.where(clonR_set, clonR_val, jnp.nan)

    # ---- cryptic state machine over ascending mm ----
    emits_snp = row & (morphia >= 2)                    # anySNP trigger
    any_snp_incl = jnp.cumsum(emits_snp.astype(jnp.int32), axis=0) > 0
    any_snp_before = jnp.concatenate(
        [jnp.zeros((1, L), dtype=bool), any_snp_incl[:-1]], axis=0)
    cryptic_here = present & counted & any_snp_before & (
        (call == CALL_NOSNP) | (morphia == 1))
    cryptic = cryptic_here.any(axis=0)                  # [L]

    # linkage support: positions flagged anySNP at the end, and the union
    # of {con, var} bases over morphia>=2 rows (profile/linkage.py:254-283)
    any_snp = any_snp_incl[-1]                          # [L]
    m2 = emits_snp
    con_oh = jax.nn.one_hot(con, 4, axis=1, dtype=jnp.int32)
    var_oh = jax.nn.one_hot(var, 4, axis=1, dtype=jnp.int32)
    bases_mask = (((con_oh | var_oh) * m2[:, None, :]).sum(axis=0) > 0)  # [4, L]

    return dict(
        present=present, cum=cum, total=total, morphia=morphia,
        con=con, var=var, call=call, row=row, cls=cls,
        clon=clon, clonR=clonR, clonR_set=clonR_set,
        cryptic=cryptic, any_snp=any_snp, bases_mask=bases_mask,
        ref_count=ref_count,
    )

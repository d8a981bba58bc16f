"""
Pallas TPU kernel: fused per-site statistics.

The XLA version (kernels/sitestats.py) materializes several [M, L] / [M,4,L]
intermediates in HBM (cum, totals, thresholds, presence masks, clonality).
This kernel tiles the position axis and keeps the whole per-tile pipeline in
VMEM: one HBM read of the counts block, one write per output. The mm axis
(M <= 32) is unrolled inside the tile.

Outputs (per (mm, position) cell, same semantics as sitestats.site_stats):
  total   int32  cumulative coverage
  morphia int8   null-model allele count
  con,var int8   consensus / variant base codes
  clon    f32    clonality (NaN where unset)
  row     bool   SNP-row emission mask
  cls     int8   SNP class code
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sitestats import (AMBIG, CALL_NOSNP, CALL_UNCOUNTED, CON_SNV,
                        DIVERGENT, POP_SNV, SNS, SNV)


def _kernel(counts_ref, ref_ref, minb_ref, freqm_ref, out_refs, *, M,
            min_cov):
    # counts block: [M, 4, T] int32 in VMEM
    counts = counts_ref[...]
    # cumulative along the (small, static) mm axis — unrolled adds, since
    # the Mosaic TPU lowering has no cumsum primitive
    acc = counts[0]
    rows = [acc]
    for i in range(1, M):
        acc = acc + counts[i]
        rows.append(acc)
    cum = jnp.stack(rows, axis=0)                    # [M, 4, T]
    total = cum.sum(axis=1, dtype=jnp.int32)         # [M, T]
    present = counts.sum(axis=1, dtype=jnp.int32) > 0

    # Mosaic's gather support is too narrow to index a [10001] LUT from a
    # [M, T] coverage tile, so the LUT lookups happen in XLA outside the
    # kernel and arrive as precomputed [M, T] threshold tiles
    min_bases = minb_ref[...]
    freq_min = freqm_ref[...]
    thresh = jnp.maximum(min_bases, freq_min)

    a, c, t, g = cum[:, 0], cum[:, 1], cum[:, 2], cum[:, 3]
    # Mosaic vector arithmetic supports only i16/i32 — keep codes in int32
    morphia = ((a >= thresh).astype(jnp.int32) + (c >= thresh) +
               (t >= thresh) + (g >= thresh)).astype(jnp.int32)

    # consensus: first max in ACTG order
    con = jnp.where(
        (a >= c) & (a >= t) & (a >= g), 0,
        jnp.where((c >= t) & (c >= g), 1,
                  jnp.where(t >= g, 2, 3))).astype(jnp.int32)
    # variant: first max with consensus zeroed
    az = jnp.where(con == 0, 0, a)
    cz = jnp.where(con == 1, 0, c)
    tz = jnp.where(con == 2, 0, t)
    gz = jnp.where(con == 3, 0, g)
    var = jnp.where(
        (az >= cz) & (az >= tz) & (az >= gz), 0,
        jnp.where((cz >= tz) & (cz >= gz), 1,
                  jnp.where(tz >= gz, 2, 3))).astype(jnp.int32)

    refb = ref_ref[...].astype(jnp.int32)            # [T]
    con_is_ref = con == refb[None, :]
    counted = total >= min_cov
    is_base_call = (morphia > 1) | ((morphia == 1) & ~con_is_ref) | \
        (morphia == 0)
    row = present & counted & is_base_call

    # class
    ref_count = jnp.where(refb[None, :] == 0, a,
                          jnp.where(refb[None, :] == 1, c,
                                    jnp.where(refb[None, :] == 2, t, g)))
    ref_present = (ref_count >= min_bases) & (ref_count >= freq_min)
    var_is_ref = var == refb[None, :]
    cls = jnp.where(
        refb[None, :] >= 4, jnp.int32(AMBIG),
        jnp.where(morphia == 0, jnp.int32(DIVERGENT),
                  jnp.where(morphia == 1, jnp.int32(SNS),
                            jnp.where(con_is_ref, jnp.int32(SNV),
                                      jnp.where(var_is_ref | ref_present,
                                                jnp.int32(CON_SNV),
                                                jnp.int32(POP_SNV))))))

    totf = jnp.maximum(total.astype(jnp.float32), 1.0)
    p2 = ((a.astype(jnp.float32) / totf) ** 2 +
          (c.astype(jnp.float32) / totf) ** 2 +
          (t.astype(jnp.float32) / totf) ** 2 +
          (g.astype(jnp.float32) / totf) ** 2)
    clon = jnp.where(present & counted, p2, jnp.nan)

    out_refs["total"][...] = total
    out_refs["morphia"][...] = morphia
    out_refs["con"][...] = con
    out_refs["var"][...] = var
    out_refs["clon"][...] = clon
    out_refs["row"][...] = row
    out_refs["cls"][...] = cls


@functools.partial(
    jax.jit,
    static_argnames=("min_cov", "min_covR", "rarefied_draws", "tile",
                     "interpret"))
def site_stats_pallas_full(counts, ref_codes, null_lut, freq_lut, rng_key,
                           min_cov: int = 5, min_covR: int = 50,
                           rarefied_draws: int = 50, tile: int = 2048,
                           interpret: bool = False):
    """
    Drop-in replacement for sitestats.site_stats with the per-cell core
    (cumulative thresholds, morphia, consensus/variant, classes,
    clonality, row mask) computed by the Pallas kernel and the remaining
    outputs (cum profiles, rarefied clonality, cryptic scan, linkage
    masks) in XLA around it. Selected via `--engine pallas`
    (profile/pipeline.py); parity vs site_stats is asserted in
    tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
    """
    M, B, L = counts.shape
    counts = counts.astype(jnp.int32)
    Lp = -(-L // tile) * tile
    if Lp != L:
        counts = jnp.pad(counts, ((0, 0), (0, 0), (0, Lp - L)))
        ref_codes = jnp.pad(ref_codes, (0, Lp - L),
                            constant_values=4)
    core = pallas_site_stats(counts, ref_codes, null_lut, freq_lut,
                             min_cov=min_cov, tile=tile,
                             interpret=interpret)
    core = {k: v[:, :L] if v.ndim == 2 else v for k, v in core.items()}
    counts = counts[:, :, :L]
    ref_codes = ref_codes[:L]

    exact_total = counts.sum(axis=1)
    present = exact_total > 0
    cum = jnp.cumsum(counts, axis=0)                     # [M, 4, L]
    total = core["total"].astype(jnp.int32)
    morphia = core["morphia"].astype(jnp.int8)
    con = core["con"].astype(jnp.int8)
    var = core["var"].astype(jnp.int8)
    cls = core["cls"].astype(jnp.int8)
    clon_val = core["clon"]
    row = core["row"] & present
    counted = total >= min_cov
    ref_b = ref_codes.astype(jnp.int32)
    con_is_ref = con.astype(jnp.int32) == ref_b[None, :]
    is_base_call = ((morphia > 1) | ((morphia == 1) & ~con_is_ref) |
                    (morphia == 0))
    call = jnp.where(is_base_call, con.astype(jnp.int8),
                     jnp.int8(CALL_NOSNP))
    call = jnp.where(counted, call, jnp.int8(CALL_UNCOUNTED))
    clon = jnp.where(present & counted, clon_val.astype(jnp.float32),
                     jnp.nan)

    ref_sel = jax.nn.one_hot(jnp.clip(ref_b, 0, 3), 4, axis=0,
                             dtype=cum.dtype)
    ref_count = (cum * ref_sel[None, :, :]).sum(axis=1)

    # rarefied clonality: identical draw scheme (and key) to site_stats
    # (counter-based threefry — see sitestats._clonR_values)
    from .sitestats import _clonR_values
    with jax.numpy_dtype_promotion("standard"):
        p = cum.astype(jnp.float32) / jnp.maximum(
            total.astype(jnp.float32), 1.0)[:, None, :]
    clonR_set = present & (total >= min_covR)
    cdf = jnp.cumsum(p, axis=1)
    clonR_val = _clonR_values(rng_key, cdf,
                              jnp.arange(L, dtype=jnp.uint32),
                              rarefied_draws)
    clonR = jnp.where(clonR_set, clonR_val, jnp.nan)

    emits_snp = row & (morphia >= 2)
    any_snp_incl = jnp.cumsum(emits_snp.astype(jnp.int32), axis=0) > 0
    any_snp_before = jnp.concatenate(
        [jnp.zeros((1, L), dtype=bool), any_snp_incl[:-1]], axis=0)
    cryptic_here = present & counted & any_snp_before & (
        (call == CALL_NOSNP) | (morphia == 1))
    cryptic = cryptic_here.any(axis=0)
    any_snp = any_snp_incl[-1]
    con_oh = jax.nn.one_hot(con, 4, axis=1, dtype=jnp.int32)
    var_oh = jax.nn.one_hot(var, 4, axis=1, dtype=jnp.int32)
    bases_mask = (((con_oh | var_oh) *
                   emits_snp[:, None, :]).sum(axis=0) > 0)

    return dict(
        present=present, cum=cum, total=total, morphia=morphia,
        con=con, var=var, call=call, row=row, cls=cls,
        clon=clon, clonR=clonR, clonR_set=clonR_set,
        cryptic=cryptic, any_snp=any_snp, bases_mask=bases_mask,
        ref_count=ref_count,
    )


@functools.partial(jax.jit, static_argnames=("min_cov", "tile",
                                             "interpret"))
def pallas_site_stats(counts, ref_codes, null_lut, freq_lut,
                      min_cov: int = 5, tile: int = 2048,
                      interpret: bool = False):
    """
    counts [M, 4, L] int32 (L a multiple of `tile`), ref_codes [L] uint8.
    Returns dict of [M, L] outputs (see module docstring).
    """
    M, B, L = counts.shape
    assert L % tile == 0, (L, tile)
    grid = (L // tile,)

    # the Mosaic TPU lowering rejects 64-bit types (jax_enable_x64 is on
    # globally for the exact-accumulation paths) — force 32-bit operands
    counts = counts.astype(jnp.int32)
    ref_codes = ref_codes.astype(jnp.int32)
    null_lut = null_lut.astype(jnp.int32)
    freq_lut = freq_lut.astype(jnp.int32)

    kern = functools.partial(_kernel, M=M, min_cov=min_cov)
    out_shapes = dict(
        total=jax.ShapeDtypeStruct((M, L), jnp.int32),
        morphia=jax.ShapeDtypeStruct((M, L), jnp.int32),
        con=jax.ShapeDtypeStruct((M, L), jnp.int32),
        var=jax.ShapeDtypeStruct((M, L), jnp.int32),
        clon=jax.ShapeDtypeStruct((M, L), jnp.float32),
        row=jax.ShapeDtypeStruct((M, L), jnp.bool_),
        cls=jax.ShapeDtypeStruct((M, L), jnp.int32),
    )
    ml_spec = pl.BlockSpec((M, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    # trace with x64 disabled: Mosaic rejects 64-bit types, and numpy-style
    # helpers (sum, take_along_axis) otherwise promote to int64 because
    # jax_enable_x64 is on globally for the exact-accumulation paths
    # LUT lookups in XLA (gathers Mosaic cannot lower); [M, L] int32 each
    total = counts.sum(axis=1, dtype=jnp.int32)
    total = jnp.cumsum(total, axis=0)
    tc = jnp.minimum(total, null_lut.shape[0] - 1)
    min_bases = null_lut[tc].astype(jnp.int32)
    freq_min = freq_lut[tc].astype(jnp.int32)

    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, 4, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                ml_spec,
                ml_spec,
            ],
            out_specs={k: ml_spec for k in out_shapes},
            out_shape=out_shapes,
            interpret=interpret,
        )(counts, ref_codes, min_bases, freq_min)
    return outs

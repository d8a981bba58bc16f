"""
Per-scaffold pileup construction and profiling.

Replaces the reference's pysam pileup loop (profile/profile_utilities.py:
115-286) with a dense-tensor pipeline: decoded base events of filtered
read pairs scatter into counts[M, 4, L] (M = distinct pair-mismatch levels
on the scaffold), then the site_stats kernel computes clonality, SNV calls
and the cryptic scan for every (mm, position) cell in one fused pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..io.bam import BamArrays
from ..kernels import nullmodel
from ..kernels.sitestats import site_stats, freq_min_count_lut
from .filter_reads import PairSet


@dataclass
class ScaffoldPileup:
    """Dense pileup inputs for one scaffold."""

    name: str
    rid: int
    length: int
    mm_values: np.ndarray          # int64 [M] sorted distinct pair mms
    counts: np.ndarray             # int32 [M, 4, L] exact-mm base counts
    # per-event arrays for linkage capture (events of counted bases)
    ev_pos: np.ndarray             # int32 positions
    ev_base: np.ndarray            # uint8 base codes
    ev_mm_idx: np.ndarray          # int32 index into mm_values
    ev_qname: np.ndarray           # int64 qname ids


def build_scaffold_pileup(bam: BamArrays, pairs: PairSet, rid: int,
                          length: int) -> Optional[ScaffoldPileup]:
    """
    Collect counted base events (qual >= 30, ACTG, pileup-eligible reads
    whose pair passed filtering) and scatter into the dense count tensor.

    pysam-parity notes (see io/bam.py): with the reference's stepper
    ('nofilter') orphans are NOT excluded from the pileup, and base
    qualities have already been mate-overlap tweaked during decode.
    """
    qids, mms = pairs.r2m_for_scaffold(rid)
    if len(qids) == 0:
        return None
    n_q = int(bam.qname_id.max()) + 1 if bam.n_records else 0
    qid2mm = np.full(n_q, -1, dtype=np.int64)
    qid2mm[qids] = mms

    rec_mask = (bam.ref_id == rid) & (qid2mm[bam.qname_id] >= 0)
    recs = np.nonzero(rec_mask)[0]
    if len(recs) == 0:
        return None

    ev_idx = _expand_events(bam.ev_off[recs], bam.ev_len[recs])
    ev_mm = np.repeat(qid2mm[bam.qname_id[recs]], bam.ev_len[recs])
    ev_qname = np.repeat(bam.qname_id[recs], bam.ev_len[recs])

    pos = bam.ev_pos[ev_idx]
    base = bam.ev_base[ev_idx]
    qual = bam.ev_qual[ev_idx]
    keep = (qual >= 30) & (base < 4)
    pos, base, ev_mm, ev_qname = (pos[keep], base[keep], ev_mm[keep],
                                  ev_qname[keep])
    if len(pos) == 0:
        return None

    mm_values, mm_idx = np.unique(ev_mm, return_inverse=True)
    M = len(mm_values)
    flat = (mm_idx.astype(np.int64) * 4 + base) * length + pos
    counts = np.bincount(flat, minlength=M * 4 * length).reshape(
        M, 4, length).astype(np.int32)

    return ScaffoldPileup(name=bam.ref_names[rid], rid=rid, length=length,
                          mm_values=mm_values, counts=counts,
                          ev_pos=pos.astype(np.int32), ev_base=base,
                          ev_mm_idx=mm_idx.astype(np.int32),
                          ev_qname=ev_qname)


def _expand_events(offs: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate [off, off+len) ranges without a Python loop."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    starts = np.zeros(len(offs), dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    out[starts] = offs
    out[starts[1:]] -= offs[:-1] + lens[:-1] - 1
    return np.cumsum(out)


@dataclass
class ScaffoldStats:
    """site_stats outputs materialized to host numpy (see sitestats.py)."""

    pileup: ScaffoldPileup
    arrays: Dict[str, np.ndarray]

    def __getattr__(self, name):
        try:
            return self.arrays[name]
        except KeyError:
            raise AttributeError(name)

    @property
    def mm_values(self):
        return self.pileup.mm_values


def _bucket(n: int, step: int) -> int:
    return -(-n // step) * step


def run_site_stats(pileup: ScaffoldPileup, ref_codes: np.ndarray,
                   null_lut: np.ndarray, freq_lut: np.ndarray,
                   min_cov: int = 5, rarefied_coverage: int = 50,
                   seed: int = 42, pad_shapes: bool = True) -> ScaffoldStats:
    """
    Run the site-stats kernel for one scaffold.

    Shapes are bucketed (mm axis to multiples of 8, position axis to
    multiples of 4096) so scaffolds share compiled kernels on TPU; padding
    cells carry zero counts / ref code 4 and are masked naturally, and all
    outputs are sliced back to true dimensions.
    """
    counts = pileup.counts
    M, _, L = counts.shape
    if pad_shapes:
        Mp, Lp = max(_bucket(M, 8), 8), max(_bucket(L, 4096), 4096)
        if (Mp, Lp) != (M, L):
            cp = np.zeros((Mp, 4, Lp), counts.dtype)
            cp[:M, :, :L] = counts
            rp = np.full(Lp, 4, dtype=ref_codes.dtype)
            rp[:L] = ref_codes
            counts, ref_codes = cp, rp
    key = jax.random.fold_in(jax.random.PRNGKey(seed), pileup.rid)
    out = site_stats(counts, ref_codes, null_lut, freq_lut, key,
                     min_cov=min_cov, min_covR=rarefied_coverage,
                     rarefied_draws=rarefied_coverage)
    arrays = {}
    for k, v in out.items():
        v = np.asarray(v)
        if k == "bases_mask":                    # [4, L]
            v = v[:, :L]
        elif v.ndim == 3:                        # [M, 4, L]
            v = v[:M, :, :L]
        elif v.ndim == 2:                        # [M, L]
            v = v[:M, :L]
        elif v.ndim == 1:                        # [L]
            v = v[:L]
        arrays[k] = v
    return ScaffoldStats(pileup=pileup, arrays=arrays)


def make_luts(cfg_variant) -> Tuple[np.ndarray, np.ndarray]:
    """Resolve (null threshold LUT, min-freq LUT) from a VariantConfig."""
    null_lut = nullmodel.null_thresholds(
        cfg_variant.null_model, fdr=cfg_variant.fdr,
        error_rate=cfg_variant.null_model_error_rate,
        max_coverage=cfg_variant.null_model_max_coverage)
    freq_lut = freq_min_count_lut(
        cfg_variant.min_freq,
        max_coverage=cfg_variant.null_model_max_coverage)
    return null_lut, freq_lut

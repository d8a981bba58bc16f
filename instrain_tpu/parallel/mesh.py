"""
Multi-chip execution: genome-axis sharding over a jax.sharding.Mesh.

The reference parallelizes with process pools over 10 kb genome windows and
a merge stage (SURVEY §2.16). The TPU-native equivalent shards the
position axis (the workload's "sequence" axis) across devices: each device
owns a slab of position tiles, runs the fused site-stats kernel locally,
and scaffold-level summaries reduce across the mesh with psum — the
reductions ride ICI, while host->device routing of read batches is the
only DCN traffic.

`sharded_profile_step` is the canonical multi-chip step: counts tensors
[tiles, M, 4, tile_len] sharded over the mesh on the tile axis ->
per-position stats (sharded) + scaffold-level reductions (replicated).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "pos") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def pad_to_tiles(counts: np.ndarray, ref_codes: np.ndarray, tile_len: int,
                 n_shards: int):
    """
    [M, 4, L] -> ([T, M, 4, tile_len], [T, tile_len], valid mask [T, tile_len])
    with T a multiple of n_shards (padding tiles are masked out).
    """
    M, _, L = counts.shape
    n_tiles = -(-L // tile_len)
    n_tiles = -(-n_tiles // n_shards) * n_shards
    padded_L = n_tiles * tile_len
    cp = np.zeros((M, 4, padded_L), counts.dtype)
    cp[:, :, :L] = counts
    rp = np.full(padded_L, 4, ref_codes.dtype)
    rp[:L] = ref_codes
    valid = np.zeros(padded_L, bool)
    valid[:L] = True
    tiles = cp.reshape(M, 4, n_tiles, tile_len).transpose(2, 0, 1, 3)
    return (np.ascontiguousarray(tiles), rp.reshape(n_tiles, tile_len),
            valid.reshape(n_tiles, tile_len))


def _tile_stats(counts, ref_codes, valid, null_lut, freq_lut, min_cov):
    """Per-tile site stats (subset of kernels.sitestats used for the
    scaffold-level reductions). counts [T, M, 4, l]."""
    cum = jnp.cumsum(counts, axis=1)                 # [T, M, 4, l]
    total = cum.sum(axis=2)                          # [T, M, l]
    maxcov = null_lut.shape[0] - 1
    tc = jnp.minimum(total, maxcov)
    thresh = jnp.maximum(null_lut[tc], freq_lut[tc])[:, :, None, :]
    base_present = cum >= thresh
    morphia = base_present.sum(axis=2)               # [T, M, l]
    con = jnp.argmax(cum, axis=2)                    # [T, M, l]
    ref = ref_codes[:, None, :]
    counted = (total >= min_cov) & valid[:, None, :]
    present = (counts.sum(axis=2) > 0) & valid[:, None, :]
    is_snv = counted & present & (
        (morphia > 1) | ((morphia == 1) & (con != ref)) | (morphia == 0))

    p = cum / jnp.maximum(total, 1)[:, :, None, :]
    clon = (p * p).sum(axis=2)

    return dict(
        coverage_sum=jnp.where(valid[:, None, :], total, 0).sum(axis=(0, 2)),
        covered=((total > 0) & valid[:, None, :]).sum(axis=(0, 2)),
        counted=counted.sum(axis=(0, 2)),
        clon_sum=jnp.where(counted & present, clon, 0).sum(axis=(0, 2)),
        snv_sites=(is_snv & (morphia > 1)).sum(axis=(0, 2)),
        sns_sites=(is_snv & (morphia == 1)).sum(axis=(0, 2)),
    )


@functools.partial(jax.jit,
                   static_argnames=("mesh", "min_cov"))
def sharded_profile_step(counts, ref_codes, valid, null_lut, freq_lut,
                         mesh: Mesh, min_cov: int = 5):
    """
    The full multi-chip profile step: tiles sharded over the mesh, local
    fused stats, psum-reduced scaffold aggregates.

    counts: [T, M, 4, tile_len] (T divisible by mesh size)
    Returns {metric: [M]} aggregates, replicated on all devices.
    """
    axis = mesh.axis_names[0]
    spec_tiles = P(axis)
    spec_rep = P()

    def step(counts, ref_codes, valid, null_lut, freq_lut):
        local = _tile_stats(counts, ref_codes, valid, null_lut, freq_lut,
                            min_cov)
        return {k: jax.lax.psum(v, axis) for k, v in local.items()}

    return shard_map(
        step, mesh=mesh,
        in_specs=(spec_tiles, spec_tiles, spec_tiles, spec_rep, spec_rep),
        out_specs=spec_rep,
    )(counts, ref_codes, valid, null_lut, freq_lut)


def sharded_scaffold_summary(counts: np.ndarray, ref_codes: np.ndarray,
                             mesh: Mesh, null_lut: np.ndarray,
                             freq_lut: np.ndarray, tile_len: int = 2048,
                             min_cov: int = 5) -> Dict[str, np.ndarray]:
    """Host-side wrapper: pad/tile one scaffold, place shardings, run."""
    n = mesh.devices.size
    tiles, refs, valid = pad_to_tiles(counts, ref_codes, tile_len, n)
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, PartitionSpecLead(axis))
    out = sharded_profile_step(
        jax.device_put(tiles, NamedSharding(mesh, P(axis))),
        jax.device_put(refs, NamedSharding(mesh, P(axis))),
        jax.device_put(valid, NamedSharding(mesh, P(axis))),
        jnp.asarray(null_lut), jnp.asarray(freq_lut),
        mesh=mesh, min_cov=min_cov)
    return {k: np.asarray(v) for k, v in out.items()}


def PartitionSpecLead(axis):
    return P(axis)

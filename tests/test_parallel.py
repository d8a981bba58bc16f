"""
Multi-chip tests on the 8-device virtual CPU mesh: the REAL profile
kernels sharded over a jax.sharding.Mesh.

- kernel level: the position-sharded hybrid run and the scaffold-sharded
  batch run match their unsharded runs exactly — including the
  PRNG-based rarefied clonality, because the counter-based threefry
  draws are sharding-invariant.
- pipeline level: a full profile() of the sars BAM with mesh_devices=8
  produces the same SNV / scaffold / linkage tables and covT/clonT
  views as the single-device run.
"""

import jax
import numpy as np
import pandas as pd
import pytest

from instrain_tpu.config import ProfileConfig, VariantConfig
from instrain_tpu.kernels.nullmodel import analytic_null_thresholds
from instrain_tpu.kernels.sitestats import freq_min_count_lut
from instrain_tpu.parallel.mesh import make_mesh
from instrain_tpu.profile import compact
from instrain_tpu.profile.pileup import ScaffoldPileup


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


@pytest.fixture(scope="module")
def luts():
    return (analytic_null_thresholds(max_coverage=1000),
            freq_min_count_lut(0.05, max_coverage=1000))


def _synthetic_pileup(seed: int, M: int = 5, L: int = 9001):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 12, (M, 4, L)).astype(np.int32)
    counts[rng.random((M, 4, L)) < 0.6] = 0
    refs = rng.integers(0, 4, L).astype(np.uint8)
    pu = ScaffoldPileup(name=f"synth{seed}", rid=seed, length=L,
                        mm_values=np.arange(M), counts=counts)
    return pu, refs


def _assert_stats_equal(a, b, with_dense: bool):
    assert (a.M, a.L) == (b.M, b.L)
    for grp in ("rows", "agg", "linkage", "masks"):
        ga, gb = getattr(a, grp), getattr(b, grp)
        assert set(ga) == set(gb), grp
        for k in ga:
            va, vb = np.asarray(ga[k]), np.asarray(gb[k])
            if va.dtype.kind == "f":
                np.testing.assert_array_equal(
                    np.nan_to_num(va, nan=-7.5), np.nan_to_num(vb, nan=-7.5),
                    err_msg=f"{grp}.{k}")
            else:
                np.testing.assert_array_equal(va, vb,
                                              err_msg=f"{grp}.{k}")
    if with_dense:
        for k in a.dense:
            va = np.nan_to_num(np.asarray(a.dense[k]), nan=-7.5)
            vb = np.nan_to_num(np.asarray(b.dense[k]), nan=-7.5)
            # dense arrays may carry different padding; compare valid region
            np.testing.assert_array_equal(va[:a.M, :a.L], vb[:b.M, :b.L],
                                          err_msg=f"dense.{k}")


def test_hybrid_position_sharded_matches_unsharded(mesh8, luts):
    """run_site_stats_hybrid with the position axis split 8 ways is
    bit-identical to the single-device two-phase run."""
    pu, refs = _synthetic_pileup(3)
    cs1 = compact.run_site_stats_hybrid(pu, refs, *luts)
    cs8 = compact.run_site_stats_hybrid(pu, refs, *luts, mesh=mesh8)
    _assert_stats_equal(cs1, cs8, with_dense=True)


def test_compact_position_sharded_matches_unsharded(mesh8, luts):
    pu, refs = _synthetic_pileup(11, M=3, L=4097)
    cs1 = compact.run_site_stats_compact(pu, refs, *luts)
    cs8 = compact.run_site_stats_compact(pu, refs, *luts, mesh=mesh8)
    _assert_stats_equal(cs1, cs8, with_dense=False)


def test_batch_scaffold_sharded_matches_unsharded(mesh8, luts):
    """The batch engine sharded over the scaffold axis (with padding to
    the mesh size: 3 and 11 scaffolds on 8 devices) is bit-identical to
    the unsharded batch, per scaffold."""
    for n_scaff in (3, 11):
        pus, codes = zip(*[_synthetic_pileup(100 + i, M=3, L=3000 + 17 * i)
                           for i in range(n_scaff)])
        r1 = compact.run_site_stats_compact_batch(
            list(pus), list(codes), *luts, with_dense=True)
        r8 = compact.run_site_stats_compact_batch(
            list(pus), list(codes), *luts, with_dense=True, mesh=mesh8)
        assert len(r1) == len(r8) == n_scaff
        for a, b in zip(r1, r8):
            assert (a is None) == (b is None)
            if a is not None:
                _assert_stats_equal(a, b, with_dense=True)


@pytest.fixture(scope="module")
def sars_fasta(tmp_path_factory, sars_ref_seq):
    p = tmp_path_factory.mktemp("fa") / "sars.fasta"
    seq = sars_ref_seq.tobytes().decode()
    with open(p, "w") as f:
        f.write(">MT039887.1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    return str(p)


def test_profile_sharded_full_table_equality(tmp_path, sars_bam, sars_fasta,
                                             ref_null_model):
    """THE multi-chip correctness gate: profile() of the real sars BAM on
    an 8-device mesh produces the same full SNV + scaffold + linkage
    tables and covT/clonT views as the single-device run (reference
    analogue: the split/merge worker runtime,
    profile_controller.py:157-193, must not change results vs -p 1)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from instrain_tpu.profile.pipeline import profile

    outs = {}
    for label, mesh_devices in (("1dev", 0), ("8dev", 8)):
        cfg = ProfileConfig(output=str(tmp_path / label),
                            skip_plot_generation=True,
                            skip_genome_wide=True)
        cfg.variant.null_model = ref_null_model
        cfg.mesh_devices = mesh_devices
        # keep the kernel small: 8 virtual devices share 2 host cores
        # here, and the XLA CPU collective rendezvous aborts if thread
        # skew exceeds 40 s — the equality statement is unaffected
        cfg.filter.maximum_reads = 6000
        cfg.rarefied_coverage = 8
        outs[label] = profile(sars_bam, sars_fasta, cfg)

    # SNV tables: exact
    for tbl in ("raw_snp_table", "cumulative_snv_table"):
        a = outs["1dev"].get(tbl).reset_index(drop=True)
        b = outs["8dev"].get(tbl).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # scaffold table: exact on ints/classes; clonality means differ only
    # by f32 summation order between the dense (host numpy) and sharded
    # (device f64) paths
    a = outs["1dev"].get("cumulative_scaffold_table")
    b = outs["8dev"].get("cumulative_scaffold_table")
    assert len(a) == len(b)
    for col in a.columns:
        if col == "scaffold":
            assert (a[col] == b[col]).all()
            continue
        av = a[col].values.astype(float)
        bv = b[col].values.astype(float)
        mask = ~(np.isnan(av) & np.isnan(bv))
        tol = 1e-6 if col.startswith("nucl_diversity") else 1e-9
        np.testing.assert_allclose(av[mask], bv[mask], rtol=tol, atol=tol,
                                   err_msg=col)

    # linkage: exact (the rarefied draws use the same host PRNG seed)
    a = outs["1dev"].get("raw_linkage_table").reset_index(drop=True)
    b = outs["8dev"].get("raw_linkage_table").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # per-position stored views
    for view in ("covT", "clonT", "clonTR"):
        va, vb = outs["1dev"].get(view), outs["8dev"].get(view)
        assert set(va) == set(vb)
        for s in va:
            assert set(va[s]) == set(vb[s])
            for mm in va[s]:
                pd.testing.assert_series_equal(va[s][mm], vb[s][mm],
                                               check_dtype=False)

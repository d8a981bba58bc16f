"""
SNV-calling kernel tests: randomized-input oracle comparison against the
reference's pure-Python call_snv_site / update_snp_table, plus golden-file
parity on the sars-cov-2 profile.
"""

import numpy as np
import pandas as pd
import pytest

import jax

from instrain_tpu.kernels.nullmodel import (analytic_null_thresholds,
                                            load_null_model_file)
from instrain_tpu.kernels.sitestats import (CLASS_NAMES, freq_min_count_lut,
                                            site_stats)
from reference_oracle import import_reference


@pytest.fixture(scope="module")
def oracle():
    return import_reference("inStrain.profile.snv_utilities")


@pytest.fixture(scope="module")
def oracle_model(ref_null_model, oracle):
    return oracle.generate_snp_model(ref_null_model, fdr=1e-6)


def test_null_model_matches_reference_parser(ref_null_model, oracle,
                                             oracle_model):
    lut = load_null_model_file(ref_null_model, fdr=1e-6)
    for cov in range(1, 10001):
        expected = oracle_model.get(cov, oracle_model[-1])
        assert lut[min(cov, len(lut) - 1)] == expected, cov


def _run_kernel(counts, ref_codes, null_lut, freq_lut, min_cov=5):
    out = site_stats(counts.astype(np.int32), ref_codes.astype(np.uint8),
                     null_lut, freq_lut, jax.random.PRNGKey(0),
                     min_cov=min_cov)
    return {k: np.asarray(v) for k, v in out.items()}


def test_call_snv_site_oracle(oracle, oracle_model, ref_null_model):
    """Randomized counts: kernel call/morphia == reference call_snv_site."""
    rng = np.random.default_rng(0)
    n = 4000
    # counts spanning interesting regimes incl. threshold boundaries
    counts = np.zeros((1, 4, n), dtype=np.int64)
    counts[0, :, : n // 2] = rng.integers(0, 30, (4, n // 2))
    counts[0, :, n // 2:] = rng.integers(0, 6, (4, n - n // 2))
    ref_codes = rng.integers(0, 5, n)

    null_lut = load_null_model_file(ref_null_model, fdr=1e-6)
    freq_lut = freq_min_count_lut(0.05)
    out = _run_kernel(counts, ref_codes, null_lut, freq_lut)

    P2C = {"A": 0, "C": 1, "T": 2, "G": 3}
    C2P = "ACTG"
    for i in range(n):
        c = counts[0, :, i]
        ref_b = "ACTGN"[ref_codes[i]]
        snp, morphia = oracle.call_snv_site(c, ref_b, oracle_model,
                                            min_cov=5, min_freq=0.05)
        got_call = out["call"][0, i]
        got_mor = out["morphia"][0, i]
        if snp is None:
            assert got_call == -2, (i, c, snp, got_call)
        elif snp == -1:
            assert got_call == -1, (i, c, snp, got_call)
            assert got_mor == morphia
        else:
            assert got_call == P2C[snp], (i, c, snp, got_call)
            assert got_mor == morphia


def test_snp_class_oracle(oracle, oracle_model, ref_null_model):
    """Randomized counts: class codes match reference calc_snp_class."""
    rng = np.random.default_rng(1)
    n = 2000
    counts = np.zeros((1, 4, n), dtype=np.int64)
    counts[0] = rng.integers(0, 40, (4, n))
    ref_codes = rng.integers(0, 5, n)
    null_lut = load_null_model_file(ref_null_model, fdr=1e-6)
    freq_lut = freq_min_count_lut(0.05)
    out = _run_kernel(counts, ref_codes, null_lut, freq_lut)

    P2C = {"A": 0, "C": 1, "T": 2, "G": 3}
    C2P = "ACTG"
    for i in range(n):
        if not out["row"][0, i]:
            continue
        c = counts[0, :, i]
        ref_b = "ACTGN"[ref_codes[i]]
        con = C2P[out["con"][0, i]]
        var = C2P[out["var"][0, i]]
        morphia = int(out["morphia"][0, i])
        expected = oracle.calc_snp_class(con, ref_b, var, c, morphia,
                                         oracle_model, min_cov=5,
                                         min_freq=0.05)
        assert CLASS_NAMES[out["cls"][0, i]] == expected, (i, c)


def test_update_snp_table_oracle(oracle, oracle_model, ref_null_model):
    """
    Multi-mm positions: row emission, cumulative counts, cryptic flags and
    clonality match the reference's per-position mm scan.
    """
    from collections import defaultdict

    rng = np.random.default_rng(2)
    M, L = 5, 300
    counts = rng.integers(0, 8, (M, 4, L))
    # sparsify the mm axis like real data
    counts[rng.random((M, 4, L)) < 0.5] = 0
    ref_codes = rng.integers(0, 4, L)

    null_lut = load_null_model_file(ref_null_model, fdr=1e-6)
    freq_lut = freq_min_count_lut(0.05)
    out = _run_kernel(counts, ref_codes, null_lut, freq_lut)

    for pos in range(L):
        MMcounts = {}
        for m in range(M):
            if counts[m, :, pos].sum() > 0:
                MMcounts[m] = counts[m, :, pos]
        Stable = defaultdict(list)
        clonT, clonTR, p2c = {}, {}, {}
        oracle.update_snp_table(Stable, clonT, clonTR, MMcounts, p2c, pos,
                                "scaf", L, "ACTGN"[ref_codes[pos]],
                                oracle_model, min_cov=5, min_covR=50,
                                min_freq=0.05)
        ref_rows = list(zip(Stable["mm"], Stable["con_base"],
                            Stable["var_base"], Stable["allele_count"],
                            Stable["class"]))
        got_rows = [(m, "ACTG"[out["con"][m, pos]],
                     "ACTG"[out["var"][m, pos]],
                     int(out["morphia"][m, pos]),
                     CLASS_NAMES[out["cls"][m, pos]])
                    for m in range(M) if out["row"][m, pos]]
        assert got_rows == ref_rows, (pos, MMcounts)
        assert bool(out["cryptic"][pos]) == p2c.get(pos, False), pos
        # clonality values at set cells
        for m in range(M):
            ref_has = m in clonT and not np.isnan(clonT[m][pos])
            got_has = not np.isnan(out["clon"][m, pos])
            assert ref_has == got_has, (pos, m)
            if ref_has:
                assert abs(clonT[m][pos] - out["clon"][m, pos]) < 1e-6


def test_freq_lut_matches_float_division():
    for f in (0.05, 0.01, 0.1, 0.33):
        lut = freq_min_count_lut(f, max_coverage=3000)
        for T in (1, 7, 20, 100, 999, 3000):
            c = lut[T]
            assert c / T >= f
            if c > 0:
                assert (c - 1) / T < f


class TestSarsGolden:
    """Golden-file parity on the sars profile: BIT-EXACT. The golden was
    built on a legacy-htslib pileup whose mate-overlap machinery skips any
    record with |tlen| >= 2*l_qseq (see native/bam.cc
    bd_tweak_overlaps_ex); with that rule emulated, every SNV row, every
    covT value and every linkage row reproduces exactly."""

    def test_snp_table_rows_exact(self, sars_profiled, sars_is):
        from instrain_tpu.profile import tables
        st = sars_profiled["stats"]
        snp = tables.cumulative_snv_table(
            tables.snp_table(st, sars_profiled["ref_codes"]))
        gold = pd.read_csv(sars_is + "/raw_data/cumulative_snv_table.csv.gz",
                           index_col=0)
        gold = gold.rename(columns={
            "refBase": "ref_base", "conBase": "con_base",
            "varBase": "var_base", "baseCoverage": "position_coverage"})
        m = pd.merge(gold, snp, on=["position", "mm"], how="outer",
                     suffixes=("_g", "_o"), indicator=True)
        assert (m["_merge"] == "both").all()
        assert len(m) == len(gold) == len(snp)
        for col in ["ref_base", "con_base", "var_base", "allele_count",
                    "A", "C", "T", "G", "position_coverage"]:
            assert (m[col + "_g"] == m[col + "_o"]).all(), col

    def test_coverage_breadth(self, sars_profiled, sars_is):
        from instrain_tpu.profile import tables
        st = sars_profiled["stats"]
        cov = tables.coverage_table(st)
        gold = pd.read_csv(
            sars_is + "/raw_data/cumulative_scaffold_table.csv.gz",
            index_col=0)
        m = pd.merge(gold, cov, on="mm", suffixes=("_g", "_o"))
        assert len(m) == len(gold) == len(cov)
        assert np.allclose(m["breadth_g"], m["breadth_o"], atol=1e-12)
        assert np.allclose(m["unmaskedBreadth"], m["breadth_minCov"],
                           atol=1e-12)
        assert np.allclose(m["coverage_g"], m["coverage_o"], rtol=1e-12)
        assert np.array_equal(m["median_cov"], m["coverage_median"])
        assert np.allclose(m["std_cov"], m["coverage_std"], atol=1e-12)
        assert np.allclose(1 - m["median_clonality"],
                           m["nucl_diversity_median"], atol=1e-12)
        assert np.array_equal(m["SNPs"], m["divergent_site_count"])
        assert np.array_equal(m["consensus_SNPs"],
                              m["consensus_divergent_sites"])
        assert np.array_equal(m["population_SNPs"],
                              m["population_divergent_sites"])
        # clonality means: golden averages float32 values in float64
        assert np.allclose(1 - m["mean_clonality"], m["nucl_diversity"],
                           atol=1e-6)

    def test_covT_positions_exact(self, sars_profiled, sars_is):
        import h5py
        from instrain_tpu.profile import tables
        covT = tables.covT_view(sars_profiled["stats"])
        f = h5py.File(sars_is + "/raw_data/covT.hd5", "r")
        assert set(int(k.split("::")[1]) for k in f.keys()) == set(covT)
        for k in f.keys():
            mm = int(k.split("::")[1])
            d = np.array(f[k])
            gpos, gval = d[1].astype(int), d[0].astype(int)
            s = covT[mm]
            # identical position sets AND identical values
            assert np.array_equal(np.sort(gpos), s.index.values), mm
            assert np.array_equal(
                gval[np.argsort(gpos, kind="stable")],
                s.values.astype(int)), mm

    def test_linkage_table_exact(self, sars_profiled, sars_is):
        from instrain_tpu.profile import linkage as lk
        st = sars_profiled["stats"]
        L = st.pileup.length
        ld = lk.calculate_linkage(st, lk.window_starts_for(L, 10000),
                                  min_snp=20)
        gold = pd.read_csv(sars_is + "/raw_data/raw_linkage_table.csv.gz",
                           index_col=0)
        key = ["position_A", "position_B", "mm"]
        m = pd.merge(gold, ld, on=key, how="outer", suffixes=("_g", "_o"),
                     indicator=True)
        assert (m["_merge"] == "both").all()
        assert len(m) == len(gold) == len(ld)
        for col in ["countAB", "countAb", "countaB", "countab", "total",
                    "distance", "allele_A", "allele_a", "allele_B",
                    "allele_b"]:
            assert (m[col + "_g"] == m[col + "_o"]).all(), col
        for col in ["r2", "d_prime"]:
            assert np.allclose(m[col + "_g"], m[col + "_o"], atol=1e-12,
                               equal_nan=True), col


class TestCounterPRNG:
    """The counter-based threefry behind the rarefied draws
    (kernels/sitestats.py:_threefry2x32/_clonR_values): the generator is
    the REAL Threefry-2x32 permutation (bit-identical to JAX's own), and
    the draw values are gather-invariant — drawing at a gathered subset
    of positions reproduces the dense draw exactly, which is what lets
    the sparse kernels run the draw loop only at qualifying positions."""

    def test_threefry_matches_jax(self):
        from instrain_tpu.kernels.sitestats import _threefry2x32
        try:
            from jax._src import prng as jprng
        except ImportError:
            pytest.skip("jax internal prng module moved")
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        key = rng.integers(0, 2**32, 2, dtype=np.uint32)
        cnt = rng.integers(0, 2**32, 64, dtype=np.uint32)
        ref = np.asarray(jprng.threefry_2x32(jnp.asarray(key),
                                             jnp.asarray(cnt)))
        a, b = _threefry2x32(jnp.uint32(key[0]), jnp.uint32(key[1]),
                             jnp.asarray(cnt[:32]), jnp.asarray(cnt[32:]))
        assert np.array_equal(ref, np.concatenate([np.asarray(a),
                                                   np.asarray(b)]))

    def test_clonR_gather_invariant(self):
        from instrain_tpu.kernels.sitestats import _clonR_values
        import jax.numpy as jnp
        rng = np.random.default_rng(7)
        M, L = 4, 257
        p = rng.random((M, 4, L)).astype(np.float32)
        p /= p.sum(axis=1, keepdims=True)
        cdf = jnp.cumsum(jnp.asarray(p), axis=1)
        key = np.asarray(jax.random.PRNGKey(42))
        dense = np.asarray(_clonR_values(
            key, cdf, jnp.arange(L, dtype=jnp.uint32), 20))
        sel = np.sort(rng.choice(L, 37, replace=False)).astype(np.uint32)
        gathered = np.asarray(_clonR_values(
            key, cdf[:, :, sel], jnp.asarray(sel), 20))
        np.testing.assert_array_equal(dense[:, sel], gathered)

    def test_median_select_matches_numpy(self):
        """The sort-free masked median (kernels/sitestats.py:
        _median_select, a W-way selection in float32 bit space) must
        equal np.median of the masked values exactly — including
        even/odd counts, all-masked rows, repeated values, zeros, and
        single-member rows."""
        from instrain_tpu.kernels.sitestats import _median_select
        import jax.numpy as jnp
        rng = np.random.default_rng(3)
        R, L = 12, 513
        vals = rng.choice(
            np.array([0.0, 0.25, 0.3, 0.5, 1.0, 17.5, 40960.0],
                     dtype=np.float32), size=(R, L))
        mask = rng.random((R, L)) < rng.random((R, 1))
        mask[0] = False                       # all-masked row -> NaN
        mask[1] = False
        mask[1, 7] = True                     # single-member row
        count = mask.sum(axis=1)
        got = np.asarray(_median_select(
            jnp.where(jnp.asarray(mask), jnp.asarray(vals), jnp.inf),
            jnp.asarray(count)))
        for r in range(R):
            if count[r] == 0:
                assert np.isnan(got[r])
            else:
                assert got[r] == np.median(vals[r][mask[r]]), r

    def test_median_select_large_random(self):
        """Continuous random values (no ties) and extreme magnitudes:
        the 7-pass W-way bit-space narrowing must land on the exact
        order statistics for arbitrary non-negative float32s."""
        from instrain_tpu.kernels.sitestats import _median_select
        import jax.numpy as jnp
        rng = np.random.default_rng(11)
        R, L = 6, 2048
        vals = (rng.random((R, L)).astype(np.float32) *
                np.float32(10.0) **
                rng.integers(-30, 30, (R, 1)).astype(np.float32))
        mask = rng.random((R, L)) < 0.7
        count = mask.sum(axis=1)
        got = np.asarray(_median_select(
            jnp.where(jnp.asarray(mask), jnp.asarray(vals), jnp.inf),
            jnp.asarray(count)))
        want = [np.median(vals[r][mask[r]]) for r in range(R)]
        np.testing.assert_array_equal(got, np.array(want, np.float32))

    def test_ffill_expand_matches_scan(self):
        """The unrolled doubling forward-fill must be bit-identical to
        the sequential scan it replaced, for float/NaN and int/-1
        fills, and its `have` output must equal cumsum(set) > 0."""
        from instrain_tpu.kernels.sitestats import (_ffill_expand,
                                                    _ffill_scan)
        import jax.numpy as jnp
        rng = np.random.default_rng(5)
        for M in (1, 2, 3, 8, 13):
            L = 257
            set_mask = jnp.asarray(rng.random((M, L)) < 0.3)
            fvals = jnp.asarray(rng.random((M, L)).astype(np.float32))
            ivals = jnp.asarray(rng.integers(0, 50, (M, L)).astype(
                np.int32))
            (f_new, i_new), have = _ffill_expand(
                [fvals, ivals], set_mask, [jnp.nan, -1])
            f_old = _ffill_scan(jnp.where(set_mask, fvals, 0.0),
                                set_mask, jnp.nan)
            i_old = _ffill_scan(ivals, set_mask, -1)
            np.testing.assert_array_equal(np.asarray(f_new),
                                          np.asarray(f_old))
            np.testing.assert_array_equal(np.asarray(i_new),
                                          np.asarray(i_old))
            np.testing.assert_array_equal(
                np.asarray(have),
                np.cumsum(np.asarray(set_mask), axis=0) > 0)

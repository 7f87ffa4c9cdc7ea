"""Cross-validation parity and internal-consistency tests.

Golden comparisons: LOO residual tensors, PRESS/RMSE matrices and
optimal-component selections vs. the reference library
(/root/reference/src/pls.cpp:469-549, 229-305); LSO under bit-exact
GCC-compatible partitions.  Consistency: the rank-1 downdate LOO must
agree with brute-force masked refits to near machine precision.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt
from pls_tpu.cv.loo import cv_loo_downdate
from pls_tpu.cv.lso import lso_sizes
from pls_tpu.utils.gcc_rng import GccRng


class TestLOO:
    def test_toy_residuals(self, toy, golden):
        X, Y = toy
        loo = pt.cv_loo(jnp.asarray(X), jnp.asarray(Y), 2)
        for k in range(2):
            np.testing.assert_allclose(
                np.asarray(loo.errors[k]), golden(f"toy_loo_resid_y{k}"),
                atol=1e-10,
            )

    def test_toy_rmse_and_optimal(self, toy, golden):
        X, Y = toy
        loo = pt.cv_loo(jnp.asarray(X), jnp.asarray(Y), 2)
        rmse = np.sqrt(np.asarray(pt.validation(loo, pt.MSE)))
        np.testing.assert_allclose(rmse, golden("toy_loo_rmse"), atol=1e-10)
        np.testing.assert_array_equal(
            np.asarray(pt.optimal_num_components(loo)),
            golden("toy_loo_opt").ravel().astype(int),
        )

    def test_toy_press(self, toy, golden):
        X, Y = toy
        loo = pt.cv_loo(jnp.asarray(X), jnp.asarray(Y), 2)
        press = np.asarray(pt.validation(loo, pt.RESS))
        np.testing.assert_allclose(press, golden("toy_loo_press"), atol=1e-9)

    def test_nir_residuals(self, nir, golden):
        X, Y = nir
        loo = pt.cv_loo(jnp.asarray(X), jnp.asarray(Y), 10)
        np.testing.assert_allclose(
            np.asarray(loo.errors[0]), golden("nir_loo_resid_y0"), atol=1e-9
        )
        rmse = np.sqrt(np.asarray(pt.validation(loo, pt.MSE)))
        np.testing.assert_allclose(rmse, golden("nir_loo_rmse"), atol=1e-10)
        np.testing.assert_array_equal(
            np.asarray(pt.optimal_num_components(loo)), [3]
        )

    def test_downdate_equals_bruteforce(self, toy):
        """O(K²)-per-fold downdate LOO (KERNEL_TYPE2) == masked refits."""
        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        brute = pt.cv_loo(X, Y, 2, pt.KERNEL_TYPE2)
        fast = cv_loo_downdate(X, Y, 2)
        np.testing.assert_allclose(
            np.asarray(fast.errors), np.asarray(brute.errors), atol=1e-9
        )

    def test_type2_loo_equals_type1_loo(self, toy):
        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        e1 = pt.cv_loo(X, Y, 2, pt.KERNEL_TYPE1).errors
        e2 = pt.cv_loo(X, Y, 2, pt.KERNEL_TYPE2).errors
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-9)

    def test_batch_size_invariance(self, toy):
        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        a = pt.cv_loo(X, Y, 2, batch_size=10)
        b = pt.cv_loo(X, Y, 2, batch_size=3)
        np.testing.assert_allclose(
            np.asarray(a.errors), np.asarray(b.errors), atol=1e-12
        )


class TestLSO:
    def test_sizes_rounding(self):
        # reference rounding: test = trunc(frac*N + 0.5) (pls.cpp:516)
        assert lso_sizes(10, 0.3) == (7, 3)
        assert lso_sizes(60, 0.3) == (42, 18)
        with pytest.raises(ValueError):
            lso_sizes(10, 0.01)

    def test_toy_parity_gcc_partitions(self, toy, golden):
        X, Y = toy
        parts = GccRng().lso_partitions(10, 100)
        np.testing.assert_array_equal(parts, golden("toy_lso_parts").astype(int))
        lso = pt.cv_lso(
            jnp.asarray(X), jnp.asarray(Y), 2, 0.3, 100, partitions=parts
        )
        for k in range(2):
            np.testing.assert_allclose(
                np.asarray(lso.errors[k]), golden(f"toy_lso_resid_y{k}"),
                atol=1e-10,
            )
        rmse = np.sqrt(np.asarray(pt.validation(lso, pt.MSE)))
        np.testing.assert_allclose(rmse, golden("toy_lso_rmse"), atol=1e-10)
        np.testing.assert_array_equal(
            np.asarray(pt.optimal_num_components(lso)),
            golden("toy_lso_opt").ravel().astype(int),
        )

    def test_nir_parity_prefix(self, nir, golden):
        """First 40 replicates of the reference's 600-trial LSO (residual
        blocks are per-replicate independent given the partitions)."""
        X, Y = nir
        trials = 40
        parts = GccRng().lso_partitions(60, trials)
        np.testing.assert_array_equal(
            parts, golden("nir_lso_parts").astype(int)[:trials]
        )
        lso = pt.cv_lso(
            jnp.asarray(X), jnp.asarray(Y), 10, 0.3, trials, partitions=parts
        )
        _, test_size = lso_sizes(60, 0.3)
        gold = golden("nir_lso_resid_y0")[: trials * test_size]
        np.testing.assert_allclose(np.asarray(lso.errors[0]), gold, atol=1e-9)

    def test_jax_native_rng_runs(self, toy):
        X, Y = toy
        import jax

        lso = pt.cv_lso(
            jnp.asarray(X), jnp.asarray(Y), 2, 0.3, 8, key=jax.random.key(0)
        )
        assert lso.errors.shape == (2, 8 * 3, 2)
        assert np.all(np.isfinite(np.asarray(lso.errors)))


class TestNewData:
    def test_toy_parity(self, toy, golden):
        X, Y = toy
        f = pt.fit(jnp.asarray(X), jnp.asarray(Y), 2)
        nd = pt.cv_new_data(f, jnp.asarray(X)[5:], jnp.asarray(Y)[5:])
        assert nd.method == "NEW DATA"
        for k in range(2):
            np.testing.assert_allclose(
                np.asarray(nd.errors[k]), golden(f"toy_newdata_resid_y{k}"),
                atol=1e-10,
            )

    def test_column_mismatch_raises(self, toy):
        X, Y = toy
        f = pt.fit(jnp.asarray(X), jnp.asarray(Y), 2)
        with pytest.raises(ValueError):
            pt.cv_new_data(f, jnp.asarray(X)[:, :5], jnp.asarray(Y))


class TestDerivedMetrics:
    def test_q_squared_loo(self, nir, golden):
        """Q² from LOO must equal 1 − PRESS/SST computed by hand."""
        import pls_tpu as pt
        from pls_tpu.cv.validation import q_squared, rmsep
        from pls_tpu.ops.stats import sst

        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        loo = pt.cv_loo(X, Y, 10)
        q2 = np.asarray(q_squared(loo, Y))
        press = np.asarray(pt.validation(loo, pt.RESS))
        expect = 1 - press / np.asarray(sst(Y))[:, None]
        np.testing.assert_allclose(q2, expect, atol=1e-12)
        # and RMSEP equals the golden RMSE matrix
        np.testing.assert_allclose(
            np.asarray(rmsep(loo)), golden("nir_loo_rmse"), atol=1e-10
        )
        # sanity: Q² at the optimum is high for the NIR calibration
        assert q2[0, 2] > 0.95


class TestLooFromStats:
    def test_matches_cv_loo_downdate(self, nir):
        """Stats-level LOO (streamed XX/XY + held-out rows) must equal the
        materialized-X downdate path."""
        from pls_tpu.cv.loo import cv_loo_from_stats

        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        ref = cv_loo_downdate(X, Y, 5)
        XX = X.T @ X
        XY = X.T @ Y
        got = cv_loo_from_stats(XX, XY, X, Y, 5)
        np.testing.assert_allclose(
            np.asarray(got.errors), np.asarray(ref.errors), atol=1e-10
        )

    def test_fold_subset(self, nir):
        """LOO over a subset of fold rows (the 1000-of-1M north-star shape)."""
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        idx = jnp.asarray([3, 17, 41])
        sub = cv_loo_downdate(X, Y, 4, fold_indices=idx)
        full = cv_loo_downdate(X, Y, 4)
        np.testing.assert_allclose(
            np.asarray(sub.errors),
            np.asarray(full.errors[:, np.asarray(idx), :]),
            atol=1e-11,
        )


class TestBlockDowndate:
    """K-fold / LSO via implicit block downdates (XXf = XX − XfᵀXf) must
    agree with brute-force masked refits to near machine precision
    (models/kernel_pls.fit_from_stats_blockdowndated)."""

    def test_kfold_downdate_equals_bruteforce(self, nir):
        from pls_tpu.cv.kfold import cv_kfold_downdate

        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        brute = pt.cv_kfold(X, Y, 4, k=6, key=7, method=pt.KERNEL_TYPE2)
        fast = cv_kfold_downdate(X, Y, 4, k=6, key=7)
        np.testing.assert_allclose(
            np.asarray(fast.errors), np.asarray(brute.errors), atol=1e-9
        )

    def test_kfold_downdate_unequal_folds(self, toy):
        """N=10 into k=3 folds (sizes 4/3/3): the zero-padding path."""
        from pls_tpu.cv.kfold import cv_kfold_downdate

        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        assign = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2, 0])
        brute = pt.cv_kfold(
            X, Y, 2, k=3, assignments=assign, method=pt.KERNEL_TYPE2
        )
        fast = cv_kfold_downdate(X, Y, 2, k=3, assignments=assign)
        np.testing.assert_allclose(
            np.asarray(fast.errors), np.asarray(brute.errors), atol=1e-9
        )

    def test_kfold_downdate_batch_size_invariance(self, nir):
        from pls_tpu.cv.kfold import cv_kfold_downdate

        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        a = cv_kfold_downdate(X, Y, 3, k=5, key=1, batch_size=5)
        b = cv_kfold_downdate(X, Y, 3, k=5, key=1, batch_size=2)
        np.testing.assert_allclose(
            np.asarray(a.errors), np.asarray(b.errors), atol=1e-12
        )

    def test_lso_downdate_equals_bruteforce(self, toy):
        from pls_tpu.cv.lso import cv_lso_downdate

        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        parts = GccRng().lso_partitions(10, 20)
        brute = pt.cv_lso(
            X, Y, 2, 0.3, 20, partitions=parts, method=pt.KERNEL_TYPE2
        )
        fast = cv_lso_downdate(X, Y, 2, 0.3, 20, partitions=parts)
        np.testing.assert_allclose(
            np.asarray(fast.errors), np.asarray(brute.errors), atol=1e-9
        )

    def test_kfold_from_stats_matches_downdate(self, nir):
        """Streamed-stats k-fold (fold blocks supplied one at a time) must
        equal the in-memory downdate path."""
        from pls_tpu.cv.kfold import cv_kfold_downdate, cv_kfold_from_stats

        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        N = X.shape[0]
        k = 5
        # contiguous-block folds so the concatenated from-stats layout is
        # row order
        assign = np.arange(N) * k // N
        ref = cv_kfold_downdate(X, Y, 4, k=k, assignments=assign)
        XX = X.T @ X
        XY = X.T @ Y
        folds = (
            (X[assign == f], Y[assign == f]) for f in range(k)
        )
        got = cv_kfold_from_stats(XX, XY, folds, 4)
        np.testing.assert_allclose(
            np.asarray(got.errors), np.asarray(ref.errors), atol=1e-10
        )

    def test_kfold_downdate_feeds_validation_stack(self, nir):
        """The downdate Residual flows through PRESS/optimal-components."""
        from pls_tpu.cv.kfold import cv_kfold_downdate

        X, Y = nir
        res = cv_kfold_downdate(jnp.asarray(X), jnp.asarray(Y), 6, k=10, key=0)
        press = pt.validation(res, pt.RESS)
        assert press.shape == (1, 6)
        opt = pt.optimal_num_components(res)
        assert 1 <= int(np.asarray(opt)[0]) <= 6

"""NIPALS / SIMPLS variant tests (north-star extensions; not in the
reference, which only has the kernel algorithms)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt


class TestNipals:
    def test_single_y_equals_kernel(self, nir):
        """For M == 1 all PLS1 algorithms produce identical predictions."""
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        fk = pt.fit(X, Y, 5, pt.KERNEL_TYPE1)
        fn = pt.fit(X, Y, 5, pt.NIPALS)
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(fn)), np.asarray(pt.coefficients(fk)),
            atol=1e-8,
        )

    def test_multi_y_predictions_close(self, toy):
        """PLS2 NIPALS and kernel-PLS are different algorithms (NIPALS
        deflates X and Y), but for well-conditioned data the fitted values
        track closely at matched component counts."""
        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        fk = pt.fit(X, Y, 2, pt.KERNEL_TYPE1)
        fn = pt.fit(X, Y, 2, pt.NIPALS)
        yk = np.asarray(pt.fitted_values(fk, X))
        yn = np.asarray(pt.fitted_values(fn, X))
        # same order of magnitude of agreement as published comparisons
        assert np.max(np.abs(yk - yn)) < 0.3
        # and explained variance within a point
        evk = np.asarray(pt.explained_variance(fk, X, Y))
        evn = np.asarray(pt.explained_variance(fn, X, Y))
        np.testing.assert_allclose(evn, evk, atol=0.05)

    def test_x_reconstruction(self, toy):
        """NIPALS deflates X, so X = T Pᵀ + E with shrinking residual."""
        X, Y = toy
        X = jnp.asarray(X)
        f = pt.fit(X, jnp.asarray(Y), 5, pt.NIPALS)
        E = np.asarray(X) - np.asarray(f.T) @ np.asarray(f.P).T
        full_norm = np.linalg.norm(np.asarray(X))
        assert np.linalg.norm(E) < 0.6 * full_norm

    def test_scores_equal_xr(self, nir):
        """R = W(PᵀW)⁻¹ must reproduce the deflation-space scores from the
        ORIGINAL X: T == X R."""
        X, Y = nir
        X = jnp.asarray(X)
        f = pt.fit(X, jnp.asarray(Y), 4, pt.NIPALS)
        np.testing.assert_allclose(
            np.asarray(X @ f.R), np.asarray(f.T), atol=1e-8
        )


class TestSimpls:
    def test_single_y_equals_kernel(self, nir):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        fk = pt.fit(X, Y, 5, pt.KERNEL_TYPE1)
        fs = pt.fit(X, Y, 5, pt.SIMPLS)
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(fs)), np.asarray(pt.coefficients(fk)),
            atol=1e-8,
        )

    def test_scores_orthonormal(self, toy):
        """SIMPLS scores are orthonormal by construction."""
        X, Y = toy
        f = pt.fit(jnp.asarray(X), jnp.asarray(Y), 2, pt.SIMPLS)
        G = np.asarray(f.T).T @ np.asarray(f.T)
        np.testing.assert_allclose(G, np.eye(2), atol=1e-10)

    def test_multi_y_explained_variance_close(self, toy):
        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        fk = pt.fit(X, Y, 2, pt.KERNEL_TYPE1)
        fs = pt.fit(X, Y, 2, pt.SIMPLS)
        evk = np.asarray(pt.explained_variance(fk, X, Y))
        evs = np.asarray(pt.explained_variance(fs, X, Y))
        np.testing.assert_allclose(evs, evk, atol=0.05)


class TestCVWithVariants:
    @pytest.mark.parametrize("method", [pt.NIPALS, pt.SIMPLS])
    def test_loo_runs_and_is_sane(self, nir, method):
        """Masked-row CV works for the variant fitters too; on single-Y
        data their LOO errors match the kernel LOO closely."""
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        loo_k = pt.cv_loo(X, Y, 3, pt.KERNEL_TYPE1)
        loo_v = pt.cv_loo(X, Y, 3, method)
        np.testing.assert_allclose(
            np.asarray(loo_v.errors), np.asarray(loo_k.errors), atol=1e-6
        )


class TestMultiYAgreement:
    """BASELINE.json config #3: SIMPLS vs NIPALS agreement on
    multi-response data."""

    @pytest.fixture(scope="class")
    def multi_y(self):
        rng = np.random.default_rng(11)
        N, K, M = 80, 30, 4
        X = rng.normal(size=(N, K))
        B = rng.normal(size=(K, M)) / np.sqrt(K)
        Y = X @ B + 0.05 * rng.normal(size=(N, M))
        # z-score as the reference pipeline does
        X = (X - X.mean(0)) / X.std(0, ddof=1)
        Y = (Y - Y.mean(0)) / Y.std(0, ddof=1)
        return jnp.asarray(X), jnp.asarray(Y)

    def test_predictions_agree(self, multi_y):
        X, Y = multi_y
        A = 6
        fn = pt.fit(X, Y, A, pt.NIPALS)
        fs = pt.fit(X, Y, A, pt.SIMPLS)
        fk = pt.fit(X, Y, A, pt.KERNEL_TYPE1)
        yn = np.asarray(pt.fitted_values(fn, X))
        ys = np.asarray(pt.fitted_values(fs, X))
        yk = np.asarray(pt.fitted_values(fk, X))
        scale = np.abs(yk).max()
        # all three variants capture the same signal on well-conditioned data
        assert np.abs(yn - yk).max() / scale < 0.05
        assert np.abs(ys - yk).max() / scale < 0.05

    def test_cv_model_comparison(self, multi_y):
        """compare_models on matched LOO partitions: valid p-values with
        the Wilcoxon antisymmetry p(1 vs 2) + p(2 vs 1) == 1, and the
        self-comparison at 0.5.  (On this data the comparison genuinely
        detects SIMPLS beating kernel-PLS2 on one response — PLS2
        variants are NOT equivalent for M > 1.)"""
        from pls_tpu.cv.validation import compare_models

        X, Y = multi_y
        loo_k = pt.cv_loo(X, Y, 4, pt.KERNEL_TYPE1)
        loo_s = pt.cv_loo(X, Y, 4, pt.SIMPLS)
        p12 = np.asarray(compare_models(loo_k, loo_s, 4, 4))
        p21 = np.asarray(compare_models(loo_s, loo_k, 4, 4))
        assert p12.shape == (4,)
        assert np.all((p12 >= 0) & (p12 <= 1))
        np.testing.assert_allclose(p12 + p21, 1.0, atol=1e-6)
        p_self = np.asarray(compare_models(loo_k, loo_k, 4, 4))
        np.testing.assert_allclose(p_self, 0.5, atol=1e-9)

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

"""Kernel PLS (Rosipal & Trejo 2001) tests.

Key invariants: with a linear kernel on centered X, dual KPLS is exactly
primal PLS (same fitted values); scores are orthonormal; an RBF kernel
recovers a nonlinear map that linear PLS cannot.
"""

import jax.numpy as jnp
import numpy as np

import pls_tpu as pt
from pls_tpu.models.kpls import fit_kpls, kernel_matrix, predict_kpls


class TestKPLS:
    def test_linear_kernel_equals_primal_pls(self, toy):
        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        kf = fit_kpls(X, Y, 2, kernel="linear")
        f = pt.fit(X, Y, 2, pt.NIPALS)
        np.testing.assert_allclose(
            np.asarray(predict_kpls(kf, X)),
            np.asarray(pt.fitted_values(f, X)),
            atol=1e-8,
        )

    def test_linear_kernel_equals_primal_pls_single_y(self, nir):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        kf = fit_kpls(X, Y, 4, kernel="linear")
        f = pt.fit(X, Y, 4)
        np.testing.assert_allclose(
            np.asarray(predict_kpls(kf, X)),
            np.asarray(pt.fitted_values(f, X)),
            atol=1e-8,
        )

    def test_scores_orthonormal(self, nir):
        X, Y = nir
        kf = fit_kpls(jnp.asarray(X), jnp.asarray(Y), 5, kernel="rbf")
        G = np.asarray(kf.T.T @ kf.T)
        np.testing.assert_allclose(G, np.eye(5), atol=1e-8)

    def test_rbf_beats_linear_on_nonlinear_target(self):
        rng = np.random.default_rng(0)
        X = rng.uniform(-2, 2, size=(80, 2))
        y = np.sin(2.0 * X[:, 0]) + 0.5 * np.cos(3.0 * X[:, 1])
        Xz = jnp.asarray(np.asarray(pt.colwise_z_scores(X)))
        Yz = jnp.asarray(np.asarray(pt.colwise_z_scores(y)))

        def r2(yhat):
            yh = np.asarray(yhat)[:, 0]
            yt = np.asarray(Yz)[:, 0]
            return 1.0 - np.sum((yt - yh) ** 2) / np.sum(yt**2)

        flin = pt.fit(Xz, Yz, 2)
        kf = fit_kpls(Xz, Yz, 20, kernel="rbf", gamma=1.0)
        assert r2(pt.fitted_values(flin, Xz)) < 0.2
        assert r2(predict_kpls(kf, Xz)) > 0.9
        # and it generalizes: held-out grid
        Xt = rng.uniform(-2, 2, size=(50, 2))
        yt = np.sin(2.0 * Xt[:, 0]) + 0.5 * np.cos(3.0 * Xt[:, 1])
        Xtz = (Xt - np.mean(X, axis=0)) / np.std(X, axis=0, ddof=1)
        ytz = (yt - np.mean(y)) / np.std(y, ddof=1)
        yhat = np.asarray(predict_kpls(kf, jnp.asarray(Xtz)))[:, 0]
        assert 1.0 - np.sum((ytz - yhat) ** 2) / np.sum(ytz**2) > 0.8

    def test_component_truncation(self, nir):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        kf = fit_kpls(X, Y, 6, kernel="rbf")
        # truncating the A-component model == fitting fewer components
        kf3 = fit_kpls(X, Y, 3, kernel="rbf")
        np.testing.assert_allclose(
            np.asarray(predict_kpls(kf, X, comp=3)),
            np.asarray(predict_kpls(kf3, X)),
            atol=1e-8,
        )

    def test_kernel_matrix_forms(self):
        rng = np.random.default_rng(1)
        X1 = jnp.asarray(rng.normal(size=(5, 3)))
        X2 = jnp.asarray(rng.normal(size=(4, 3)))
        lin = np.asarray(kernel_matrix(X1, X2, "linear"))
        np.testing.assert_allclose(lin, np.asarray(X1) @ np.asarray(X2).T)
        rbf = np.asarray(kernel_matrix(X1, X1, "rbf", gamma=0.5))
        np.testing.assert_allclose(np.diag(rbf), 1.0, atol=1e-12)
        assert np.all(rbf <= 1.0 + 1e-12) and np.all(rbf > 0)
        poly = np.asarray(kernel_matrix(X1, X2, "poly", gamma=1.0, degree=2))
        np.testing.assert_allclose(
            poly, (np.asarray(X1) @ np.asarray(X2).T + 1.0) ** 2, rtol=1e-12
        )

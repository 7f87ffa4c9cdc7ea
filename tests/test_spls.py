"""Sparse PLS tests: dense limit equals NIPALS; supports are the right
size; variable selection recovers planted signal; the shared prediction
stack (R-recurrence under X-deflation + thresholding) stays exact."""

import jax.numpy as jnp
import numpy as np

import pls_tpu as pt
from pls_tpu.models.sparse import fit_spls, selected_variables


class TestSPLS:
    def test_dense_limit_is_nipals(self, toy):
        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        K, M = X.shape[1], Y.shape[1]
        fs = fit_spls(X, Y, 2, keep_x=K, keep_y=M)
        fn = pt.fit(X, Y, 2, pt.NIPALS)
        np.testing.assert_allclose(
            np.asarray(pt.fitted_values(fs, X)),
            np.asarray(pt.fitted_values(fn, X)),
            atol=1e-8,
        )

    def test_support_size(self, nir):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        f = fit_spls(X, Y, 3, keep_x=25)
        W = np.asarray(f.W)
        for a in range(3):
            assert np.count_nonzero(W[:, a]) == 25
        sel = np.asarray(selected_variables(f))
        assert 25 <= sel.sum() <= 75

    def test_scores_match_direct_weights(self, nir):
        """T = X R must hold exactly (the Gram-Schmidt R recurrence is
        exact for thresholded weights too)."""
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        f = fit_spls(X, Y, 4, keep_x=30)
        np.testing.assert_allclose(
            np.asarray(X @ f.R), np.asarray(f.T), atol=1e-9
        )

    def test_recovers_planted_support(self):
        rng = np.random.default_rng(0)
        n, k = 60, 50
        X = rng.normal(size=(n, k))
        beta = np.zeros(k)
        beta[[3, 17, 31]] = [3.0, -2.5, 2.0]
        y = X @ beta + 0.1 * rng.normal(size=n)
        Xz = jnp.asarray(np.asarray(pt.colwise_z_scores(X)))
        Yz = jnp.asarray(np.asarray(pt.colwise_z_scores(y)))
        f = fit_spls(Xz, Yz, 1, keep_x=3)
        sel = np.flatnonzero(np.asarray(selected_variables(f)))
        np.testing.assert_array_equal(sel, [3, 17, 31])

    def test_per_component_keeps_and_prediction(self, nir):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        f = fit_spls(X, Y, 3, keep_x=(50, 25, 10))
        W = np.asarray(f.W)
        assert [np.count_nonzero(W[:, a]) for a in range(3)] == [50, 25, 10]
        yhat = pt.fitted_values(f, X)
        ev = 1.0 - float(np.sum((np.asarray(Y) - np.asarray(yhat)) ** 2)) / float(
            np.sum(np.asarray(Y) ** 2)
        )
        assert ev > 0.9  # 85 informative channels still calibrate octane

    def test_validation_errors(self, toy):
        X, Y = toy
        import pytest

        with pytest.raises(ValueError):
            fit_spls(jnp.asarray(X), jnp.asarray(Y), 2, keep_x=(5,))
        with pytest.raises(ValueError):
            fit_spls(jnp.asarray(X), jnp.asarray(Y), 2, keep_x=0)

"""OPLS (Trygg & Wold 2002) tests — capability extension beyond the
reference; invariants from the paper:

- orthogonal scores are exactly Y-orthogonal (single y: t_oᵀy = 0 because
  t_oᵀy = w_oᵀXᵀy ∝ w_oᵀw = 0 by the Gram-Schmidt step);
- for single y, OPLS(n_o orthogonal + 1 predictive) spans the same score
  subspace as an (n_o+1)-component PLS model, so fitted values agree;
- n_ortho = 0 degenerates to plain PLS;
- the new-data filter reproduces the training-time filtration.
"""

import jax.numpy as jnp
import numpy as np

import pls_tpu as pt
from pls_tpu.models import opls


class TestOPLS:
    def test_zero_ortho_is_plain_pls(self, nir):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        of = opls.fit_opls(X, Y, n_ortho=0, A=3)
        f = pt.fit(X, Y, 3)
        np.testing.assert_allclose(
            np.asarray(opls.predict(of, X)),
            np.asarray(pt.fitted_values(f, X)),
            atol=1e-10,
        )
        assert of.n_ortho == 0
        assert of.W_o.shape == (X.shape[1], 0)

    def test_ortho_scores_orthogonal_to_y(self, nir):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        of = opls.fit_opls(X, Y, n_ortho=3, A=1)
        # t_oᵀ y == 0 exactly (theory); f64 roundoff in practice
        proj = np.asarray(of.T_o.T @ Y)
        np.testing.assert_allclose(proj, 0.0, atol=1e-8)
        # successive orthogonal scores are mutually orthogonal
        G = np.asarray(of.T_o.T @ of.T_o)
        np.testing.assert_allclose(G - np.diag(np.diag(G)), 0.0, atol=1e-8)

    def test_single_y_fitted_values_match_pls(self, nir):
        """OPLS with n_o + 1 components predicts identically to
        (n_o+1)-component PLS on the training data (Trygg & Wold §3)."""
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        for n_o in (1, 2, 4):
            of = opls.fit_opls(X, Y, n_ortho=n_o, A=1)
            f = pt.fit(X, Y, n_o + 1)
            np.testing.assert_allclose(
                np.asarray(opls.predict(of, X)),
                np.asarray(pt.fitted_values(f, X)),
                atol=1e-7,
            )

    def test_correct_reproduces_training_filter(self, nir):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        of = opls.fit_opls(X, Y, n_ortho=2, A=1)
        Xf, T_o = opls.correct(of, X)
        np.testing.assert_allclose(
            np.asarray(T_o), np.asarray(of.T_o), atol=1e-9
        )
        # filtered X has the orthogonal variation removed: refitting the
        # orthogonal extractor on Xf finds ~nothing correlated structure
        # of comparable size (r2x of next ortho comp drops)
        of2 = opls.fit_opls(Xf, Y, n_ortho=1, A=1)
        assert float(of2.r2x_o[0]) < float(of.r2x_o[0])

    def test_r2x_fractions(self, nir):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        of = opls.fit_opls(X, Y, n_ortho=3, A=1)
        r2x = np.asarray(of.r2x_o)
        assert r2x.shape == (3,)
        assert np.all(r2x > 0) and np.all(r2x < 1)
        assert r2x.sum() < 1.0

    def test_multi_y(self, toy):
        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        of = opls.fit_opls(X, Y, n_ortho=2, A=2)
        yhat = opls.predict(of, X)
        assert yhat.shape == Y.shape
        assert np.all(np.isfinite(np.asarray(yhat)))
        # prediction at truncated component count also works
        y1 = opls.predict(of, X, comp=1)
        assert y1.shape == Y.shape

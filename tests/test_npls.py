"""Trilinear N-PLS (pls_tpu/models/npls.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt


def _trilinear_data(I=60, J=14, K=9, R=3, noise=0.05, m=1, seed=0):
    """X = Σ_r t_r ∘ b_r ∘ c_r + noise;  y = T β + noise."""
    rng = np.random.default_rng(seed)
    T = rng.normal(size=(I, R))
    Bf = rng.normal(size=(J, R))
    Cf = rng.normal(size=(K, R))
    X = np.einsum("ir,jr,kr->ijk", T, Bf, Cf) + noise * rng.normal(size=(I, J, K))
    beta = rng.normal(size=(R, m))
    Y = T @ beta + noise * rng.normal(size=(I, m))
    X -= X.mean(axis=0, keepdims=True)
    Y -= Y.mean(axis=0, keepdims=True)
    return X, Y, Bf, Cf


def test_recovers_trilinear_structure():
    X, Y, Bf, Cf = _trilinear_data()
    fit = pt.fit_npls(jnp.asarray(X), jnp.asarray(Y), 3)
    pred = np.asarray(pt.predict_npls(fit, jnp.asarray(X)))
    r2 = 1 - np.sum((Y - pred) ** 2) / np.sum(Y**2)
    assert r2 > 0.97
    # the first component's mode weights align with SOME true factor
    wj = np.asarray(fit.WJ[:, 0])
    wk = np.asarray(fit.WK[:, 0])
    cj = np.abs(Bf.T @ wj) / (np.linalg.norm(Bf, axis=0) * np.linalg.norm(wj))
    ck = np.abs(Cf.T @ wk) / (np.linalg.norm(Cf, axis=0) * np.linalg.norm(wk))
    assert cj.max() > 0.8 and ck.max() > 0.8


def test_beats_unfolded_pls_out_of_sample():
    """The trilinear constraint regularizes: with few samples and noise,
    N-PLS generalizes at least as well as PLS on the unfolded matrix."""
    X, Y, _, _ = _trilinear_data(I=40, noise=0.35, seed=1)
    Xte, Yte, _, _ = _trilinear_data(I=200, noise=0.0, seed=1)
    A = 3
    nf = pt.fit_npls(jnp.asarray(X), jnp.asarray(Y), A)
    uf = pt.fit(jnp.asarray(X.reshape(40, -1)), jnp.asarray(Y), A)
    err_n = np.sum(
        (Yte - np.asarray(pt.predict_npls(nf, jnp.asarray(Xte)))) ** 2
    )
    err_u = np.sum(
        (Yte - np.asarray(pt.fitted_values(uf, jnp.asarray(Xte.reshape(200, -1))))) ** 2
    )
    assert err_n < 1.2 * err_u  # at worst comparable; usually better


def test_k1_degenerates_to_matrix_pls():
    """With a singleton third mode, N-PLS is ordinary PLS1 (weights match
    NIPALS; predictions near-identical)."""
    rng = np.random.default_rng(2)
    Xm = rng.normal(size=(50, 12))
    y = Xm @ rng.normal(size=(12, 1)) + 0.1 * rng.normal(size=(50, 1))
    Xm -= Xm.mean(0)
    y -= y.mean(0)
    nf = pt.fit_npls(jnp.asarray(Xm[:, :, None]), jnp.asarray(y), 3)
    from pls_tpu.models.nipals import fit_nipals

    mf = fit_nipals(jnp.asarray(Xm), jnp.asarray(y), 3)
    # first-component weights identical up to sign
    w_n = np.asarray(nf.WJ[:, 0])
    w_m = np.asarray(mf.W[:, 0])
    s = np.sign(w_n @ w_m)
    np.testing.assert_allclose(w_n * s, w_m, atol=1e-6)
    p_n = np.asarray(pt.predict_npls(nf, jnp.asarray(Xm[:, :, None])))
    p_m = np.asarray(pt.fitted_values(mf, jnp.asarray(Xm)))
    assert np.corrcoef(p_n.ravel(), p_m.ravel())[0, 1] > 0.999


def test_multiresponse_and_scores_shape():
    X, Y, _, _ = _trilinear_data(m=3, seed=3)
    fit = pt.fit_npls(jnp.asarray(X), jnp.asarray(Y), 4)
    assert fit.A == 4 and fit.B.shape == (4, 3)
    S = pt.scores_npls(fit, jnp.asarray(X))
    assert S.shape == (60, 4)
    np.testing.assert_allclose(np.asarray(S), np.asarray(fit.T), atol=1e-8)
    pred = np.asarray(pt.predict_npls(fit, jnp.asarray(X)))
    r2 = 1 - np.sum((Y - pred) ** 2) / np.sum(Y**2)
    assert r2 > 0.9


def test_checkpoint_roundtrip(tmp_path):
    X, Y, _, _ = _trilinear_data(seed=4)
    fit = pt.fit_npls(jnp.asarray(X), jnp.asarray(Y), 2)
    p = tmp_path / "npls.npz"
    pt.save_fit(fit, str(p))
    back = pt.load_fit(str(p))
    np.testing.assert_allclose(np.asarray(back.WJ), np.asarray(fit.WJ))
    assert back.method == "npls"

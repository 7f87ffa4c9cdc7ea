"""O2PLS (models/o2pls.py): bidirectional orthogonal PLS."""

import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.models.o2pls import (
    fit_o2pls,
    predict_x,
    predict_y,
    transform,
)


def _planted(N=200, K=30, M=12, n=2, seed=0, orth_scale=2.0):
    """Two blocks sharing n latent directions, each with one strong
    block-specific direction whose SCORES are independent of the shared
    latent (the O2PLS notion of orthogonal variation — its loading may
    overlap the joint loading space, which is exactly when filtering
    matters for prediction)."""
    rng = np.random.default_rng(seed)
    T = rng.normal(size=(N, n))  # shared latent
    W = np.linalg.qr(rng.normal(size=(K, n)))[0]
    C = np.linalg.qr(rng.normal(size=(M, n)))[0]
    t_x = rng.normal(size=(N, 1))  # X-specific scores
    u_y = rng.normal(size=(N, 1))  # Y-specific scores
    p_x = rng.normal(size=(K, 1))
    p_x /= np.linalg.norm(p_x)
    q_y = rng.normal(size=(M, 1))
    q_y /= np.linalg.norm(q_y)
    X = T @ W.T + orth_scale * t_x @ p_x.T + 0.05 * rng.normal(size=(N, K))
    Y = T @ C.T + orth_scale * u_y @ q_y.T + 0.05 * rng.normal(size=(N, M))
    X -= X.mean(0)
    Y -= Y.mean(0)
    return jnp.asarray(X), jnp.asarray(Y), W, C


def test_shapes_and_r2():
    X, Y, _, _ = _planted()
    f = fit_o2pls(X, Y, n=2, nx=1, ny=1)
    N, K = X.shape
    M = Y.shape[1]
    assert f.W.shape == (K, 2) and f.C.shape == (M, 2)
    assert f.W_Yosc.shape == (K, 1) and f.C_Xosc.shape == (M, 1)
    assert f.T.shape == (N, 2) and f.U_Xosc.shape == (N, 1)
    assert 0 < float(f.r2x_joint) <= 1 and 0 < float(f.r2y_joint) <= 1
    assert np.all(np.asarray(f.r2x_orth) > 0)
    assert float(f.r2x_joint + f.r2x_orth.sum()) <= 1 + 1e-9


def test_reduces_to_pls_svd_when_no_orth():
    X, Y, _, _ = _planted()
    f = fit_o2pls(X, Y, n=2, nx=0, ny=0)
    u, _, vt = np.linalg.svd(np.asarray(X).T @ np.asarray(Y))
    # same subspaces up to sign
    assert np.allclose(np.abs(np.asarray(f.W).T @ u[:, :2]), np.eye(2), atol=1e-8)
    assert np.allclose(np.abs(np.asarray(f.C).T @ vt[:2].T), np.eye(2), atol=1e-8)


def test_recovers_joint_subspace_despite_orth_variation():
    X, Y, W_true, C_true = _planted(orth_scale=3.0)
    f = fit_o2pls(X, Y, n=2, nx=1, ny=1)
    # principal angles between span(W) and span(W_true) small (finite
    # sample: svd of X'Y is a noisy estimator, so not ~1e-8)
    s = np.linalg.svd(np.asarray(f.W).T @ W_true, compute_uv=False)
    assert np.all(s > 0.9), s
    s = np.linalg.svd(np.asarray(f.C).T @ C_true, compute_uv=False)
    assert np.all(s > 0.9), s
    # filtering must not do WORSE than no filtering at recovering W
    f0 = fit_o2pls(X, Y, n=2, nx=0, ny=0)
    s0 = np.linalg.svd(np.asarray(f0.W).T @ W_true, compute_uv=False)
    assert s.min() >= s0.min() - 1e-6


def test_orth_filtering_improves_prediction():
    X, Y, _, _ = _planted(N=240, orth_scale=3.0, seed=1)
    Xtr, Xte = X[:200], X[200:]
    Ytr, Yte = Y[:200], Y[200:]
    f_o2 = fit_o2pls(Xtr, Ytr, n=2, nx=1, ny=1)
    f_plain = fit_o2pls(Xtr, Ytr, n=2, nx=0, ny=0)

    def press(f):
        return float(jnp.sum((predict_y(f, Xte) - Yte) ** 2))

    assert press(f_o2) < press(f_plain)
    # and the fit is genuinely predictive of the JOINT part — Yte also
    # carries strong Y-specific variation that is unpredictable from X by
    # construction, so total R² is bounded well below 1 here
    ss_tot = float(jnp.sum((Yte - Ytr.mean(0)) ** 2))
    assert 1 - press(f_o2) / ss_tot > 0.05


def test_bidirectional_symmetry():
    """With only one block filtered, block-swapping is EXACTLY symmetric
    (with both filtered it is approximate — the X loop runs first)."""
    X, Y, _, _ = _planted(seed=2)
    f_xy = fit_o2pls(X, Y, n=2, nx=1, ny=0)
    f_yx = fit_o2pls(Y, X, n=2, nx=0, ny=1)
    got = np.asarray(predict_x(f_xy, Y))
    want = np.asarray(predict_y(f_yx, Y))
    assert np.allclose(got, want, atol=1e-8)
    # both-filtered: X-block filtering runs first, so block-swapping gives
    # a genuinely different (but same-family) model — differences stay
    # bounded rather than vanishing
    f2 = fit_o2pls(X, Y, n=2, nx=1, ny=1)
    g2 = fit_o2pls(Y, X, n=2, nx=1, ny=1)
    a = np.asarray(predict_x(f2, Y))
    b = np.asarray(predict_y(g2, Y))
    assert np.linalg.norm(a - b) < 0.3 * np.linalg.norm(a)


def test_transform_scores():
    X, Y, _, _ = _planted()
    f = fit_o2pls(X, Y, n=2, nx=1, ny=1)
    T_new, U_new = transform(f, X_new=X, Y_new=Y)
    assert np.allclose(np.asarray(T_new), np.asarray(f.T), atol=1e-8)
    assert np.allclose(np.asarray(U_new), np.asarray(f.U), atol=1e-8)
    # inner relation holds reasonably: U ≈ T B_T
    resid = np.asarray(f.U - f.T @ f.B_T)
    assert np.linalg.norm(resid) < 0.5 * np.linalg.norm(np.asarray(f.U))


def test_validation_errors():
    X, Y, _, _ = _planted()
    with pytest.raises(ValueError):
        fit_o2pls(X, Y, n=0)
    with pytest.raises(ValueError):
        fit_o2pls(X, Y, n=2, nx=-1)
    with pytest.raises(ValueError):
        fit_o2pls(X, Y[:-1], n=2)
    with pytest.raises(ValueError):
        fit_o2pls(X, Y, n=13)  # > M=12

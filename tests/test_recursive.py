"""Recursive / adaptive PLS (pls_tpu/models/recursive.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt
from pls_tpu.models.recursive import RecursivePLS


def _chunks(B, n_chunks=6, c=40, k=10, m=2, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_chunks):
        X = rng.normal(size=(c, k))
        Y = X @ B + noise * rng.normal(size=(c, m))
        out.append((X, Y))
    return out


def test_lambda_one_equals_batch():
    rng = np.random.default_rng(1)
    B = rng.normal(size=(10, 2))
    chunks = _chunks(B)
    r = RecursivePLS(K=10, M=2, lam=1.0)
    for Xc, Yc in chunks:
        r.update(Xc, Yc)
    fit_r = r.fit(4)
    Xall = jnp.asarray(np.vstack([c[0] for c in chunks]))
    Yall = jnp.asarray(np.vstack([c[1] for c in chunks]))
    batch = pt.fit(Xall, Yall, 4, pt.KERNEL_TYPE2)
    np.testing.assert_allclose(
        np.asarray(pt.coefficients(fit_r)),
        np.asarray(pt.coefficients(batch)),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(float(r.n_eff), Xall.shape[0])


def test_forgetting_tracks_drift():
    rng = np.random.default_rng(2)
    B1 = rng.normal(size=(10, 1))
    B2 = -B1  # abrupt coefficient flip halfway
    old = _chunks(B1, n_chunks=8, m=1, seed=3)
    new = _chunks(B2, n_chunks=8, m=1, seed=4)
    Xte = rng.normal(size=(200, 10))
    Yte = Xte @ B2  # current regime

    errs = {}
    for lam in (1.0, 0.6):
        r = RecursivePLS(K=10, M=1, lam=lam)
        for Xc, Yc in old + new:
            r.update(Xc, Yc)
        f = r.fit(6)
        pred = np.asarray(pt.fitted_values(f, jnp.asarray(Xte)))
        errs[lam] = float(np.sqrt(np.mean((Yte - pred) ** 2)))
    # forgetting adapts to the new regime; the growing window is stuck
    # between the two
    assert errs[0.6] < 0.3 * errs[1.0]


def test_effective_count_decay():
    r = RecursivePLS(K=3, M=1, lam=0.5)
    X = np.eye(3)
    y = np.ones((3, 1))
    r.update(X, y).update(X, y)
    # n_eff = 0.5*3 + 3 = 4.5
    np.testing.assert_allclose(float(r.n_eff), 4.5)


def test_bad_lambda_rejected():
    with pytest.raises(ValueError):
        RecursivePLS(K=3, M=1, lam=0.0)
    with pytest.raises(ValueError):
        RecursivePLS(K=3, M=1, lam=1.5)

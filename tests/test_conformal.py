"""Conformal prediction intervals (pls_tpu/cv/conformal.py):
jackknife+ and split conformal — coverage and structural properties."""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt


def _linear_data(n, k=12, m=1, noise=0.5, seed=0):
    """One exchangeable draw: same coefficient matrix for all rows."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, k))
    B = rng.normal(size=(k, m)) * (1 + np.arange(m))  # fixed by seed
    Y = X @ B + noise * rng.normal(size=(n, m))
    return X - X.mean(0), Y - Y.mean(0)


def _split(X, Y, n_tr):
    return X[:n_tr], Y[:n_tr], X[n_tr:], Y[n_tr:]


def test_jackknife_plus_coverage():
    X, Y = _linear_data(420, seed=0)
    Xtr, Ytr, Xte, Yte = _split(X, Y, 120)
    lo, hi, pred = pt.jackknife_plus_intervals(
        jnp.asarray(Xtr), jnp.asarray(Ytr), jnp.asarray(Xte), A=6, alpha=0.1
    )
    lo, hi, pred = map(np.asarray, (lo, hi, pred))
    assert lo.shape == hi.shape == pred.shape == Yte.shape
    assert (hi > lo).all()
    covered = ((Yte >= lo) & (Yte <= hi)).mean()
    # theory: >= 1-2*alpha = 0.8; typical ~= 1-alpha = 0.9
    assert covered >= 0.82
    # point prediction sits inside its own interval
    assert ((pred >= lo) & (pred <= hi)).mean() > 0.99


def test_jackknife_plus_width_tracks_noise():
    widths = []
    for noise in (0.2, 2.0):
        X, Y = _linear_data(80, noise=noise, seed=2)
        lo, hi, _ = pt.jackknife_plus_intervals(
            jnp.asarray(X), jnp.asarray(Y), jnp.asarray(X[:20]), A=6, alpha=0.1
        )
        widths.append(float(np.mean(np.asarray(hi) - np.asarray(lo))))
    assert widths[1] > 3 * widths[0]


def test_split_conformal_coverage_and_constant_width():
    X, Y = _linear_data(700, seed=3)
    Xtr, Ytr, Xte, Yte = _split(X, Y, 300)
    lo, hi, pred = pt.split_conformal_intervals(
        jnp.asarray(Xtr), jnp.asarray(Ytr), jnp.asarray(Xte), A=6, alpha=0.1
    )
    lo, hi, pred = map(np.asarray, (lo, hi, pred))
    w = hi - lo
    # constant width per response by construction
    np.testing.assert_allclose(w, np.broadcast_to(w[0:1, :], w.shape), rtol=1e-6)
    covered = ((Yte >= lo) & (Yte <= hi)).mean()
    assert covered >= 0.85
    np.testing.assert_allclose(pred, (lo + hi) / 2, rtol=1e-6)


def test_cv_plus_coverage_near_jackknife_plus():
    X, Y = _linear_data(420, seed=6)
    Xtr, Ytr, Xte, Yte = _split(X, Y, 120)
    lo, hi, pred = pt.cv_plus_intervals(
        jnp.asarray(Xtr), jnp.asarray(Ytr), jnp.asarray(Xte),
        A=6, n_folds=10, alpha=0.1,
    )
    lo, hi = np.asarray(lo), np.asarray(hi)
    assert (hi > lo).all()
    covered = ((Yte >= lo) & (Yte <= hi)).mean()
    assert covered >= 0.82
    # with n_folds = N, CV+ has the same structure as jackknife+
    loj, hij, _ = pt.jackknife_plus_intervals(
        jnp.asarray(Xtr), jnp.asarray(Ytr), jnp.asarray(Xte), A=6, alpha=0.1
    )
    # widths in the same ballpark (CV+ slightly wider on average)
    w_cv = float(np.mean(hi - lo))
    w_jk = float(np.mean(np.asarray(hij) - np.asarray(loj)))
    assert 0.7 * w_jk < w_cv < 2.0 * w_jk


def test_multiresponse_and_nir():
    from pls_tpu import datasets

    X, y = datasets.load_nir()
    Xz = jnp.asarray(pt.ZScorer.fit(jnp.asarray(X)).transform(X))
    yz = jnp.asarray(pt.ZScorer.fit(jnp.asarray(y)).transform(y))
    lo, hi, pred = pt.jackknife_plus_intervals(Xz, yz, Xz[:10], A=5, alpha=0.2)
    assert np.asarray(hi - lo).min() > 0
    # m = 2 responses flow through every quantile axis correctly
    X2, Y2 = _linear_data(60, m=2, seed=5)
    lo2, hi2, p2 = pt.split_conformal_intervals(
        jnp.asarray(X2), jnp.asarray(Y2), jnp.asarray(X2[:5]), A=4
    )
    assert lo2.shape == (5, 2) and hi2.shape == (5, 2) and p2.shape == (5, 2)


def test_estimator_predict_interval_raw_units():
    from pls_tpu.estimator import PLSRegressor

    rng = np.random.default_rng(7)
    X = rng.normal(size=(120, 10))
    y = 50.0 + X @ rng.normal(size=(10, 1)) * 3.0 + 0.5 * rng.normal(size=(120, 1))
    est = PLSRegressor(n_components=5).fit(X, y)
    for kind in ("jackknife+", "cv+", "split"):
        lo, hi, pred = est.predict_interval(X, y, X, alpha=0.1, kind=kind)
        assert lo.shape == hi.shape == pred.shape == y.shape
        assert (hi > lo).all()
        # raw units: interval brackets the raw-unit target most of the time
        assert ((y >= lo) & (y <= hi)).mean() > 0.8
        if kind != "split":
            # full-data point prediction consistent with est.predict
            # ("split" predicts from the training-split fit by design)
            np.testing.assert_allclose(pred, est.predict(X), rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        est.predict_interval(X, y, X, kind="bogus")

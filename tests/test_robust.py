"""Robust IRPLS (pls_tpu/models/robust.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt
from pls_tpu.models.robust import fit_robust


def _data(n=80, k=10, m=1, noise=0.1, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, k))
    B = rng.normal(size=(k, m))
    Y = X @ B + noise * rng.normal(size=(n, m))
    return X - X.mean(0), Y - Y.mean(0), B


def test_clean_data_close_to_plain_fit():
    X, Y, _ = _data()
    f_rob, w = fit_robust(jnp.asarray(X), jnp.asarray(Y), 5)
    f_ols = pt.fit(jnp.asarray(X), jnp.asarray(Y), 5)
    # Gaussian residuals: most weights stay high and coefficients barely move
    assert float(jnp.mean(w)) > 0.8
    assert float(jnp.median(w)) > 0.95
    B_r = np.asarray(pt.coefficients(f_rob))
    B_o = np.asarray(pt.coefficients(f_ols))
    assert np.linalg.norm(B_r - B_o) < 0.05 * np.linalg.norm(B_o)


@pytest.mark.parametrize("loss", ["huber", "bisquare"])
def test_outliers_downweighted(loss):
    X, Y, B = _data(seed=1)
    Yc = Y.copy()
    bad = [3, 17, 42]
    Yc[bad] += 25.0  # gross Y outliers
    f_rob, w = fit_robust(jnp.asarray(X), jnp.asarray(Yc), 5, loss=loss)
    f_ols = pt.fit(jnp.asarray(X), jnp.asarray(Yc), 5)
    w = np.asarray(w)
    # the planted outliers are rejected; clean samples keep high weights
    assert w[bad].max() < 0.2
    clean = np.setdiff1d(np.arange(len(w)), bad)
    assert np.median(w[clean]) > 0.8
    # robust coefficients stay near the clean-data truth; OLS is dragged
    f_clean = pt.fit(jnp.asarray(X), jnp.asarray(Y), 5)
    B_clean = np.asarray(pt.coefficients(f_clean))
    err_rob = np.linalg.norm(np.asarray(pt.coefficients(f_rob)) - B_clean)
    err_ols = np.linalg.norm(np.asarray(pt.coefficients(f_ols)) - B_clean)
    assert err_rob < 0.25 * err_ols


def test_multiresponse_and_type2():
    X, Y, _ = _data(m=3, seed=2)
    Y[5] += 30.0
    f, w = fit_robust(jnp.asarray(X), jnp.asarray(Y), 4, pt.KERNEL_TYPE2)
    assert np.asarray(w)[5] < 0.2
    assert np.isfinite(np.asarray(pt.coefficients(f))).all()


def test_unknown_loss_rejected():
    X, Y, _ = _data()
    with pytest.raises(ValueError):
        fit_robust(jnp.asarray(X), jnp.asarray(Y), 3, loss="l5")


def test_estimator_facade():
    from pls_tpu.estimator import RobustPLSRegressor

    X, Y, _ = _data(seed=5)
    Yc = Y + Y.mean() + 3.0  # raw units
    Yc[7] += 40.0
    est = RobustPLSRegressor(n_components=4, loss="bisquare").fit(X, Yc)
    assert est.sample_weight_[7] < 0.2
    assert est.coef_.shape == (1, 10)
    pred = est.predict(X)
    assert pred.shape == (80, 1)
    # the rejected row barely influences its own prediction (no fit leak)
    clean = np.setdiff1d(np.arange(80), [7])
    resid = np.abs(Yc[clean] - pred[clean])
    assert np.median(resid) < 1.0

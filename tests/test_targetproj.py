"""Target projection + selectivity ratio (models/predict.py) and
sample_weight through the estimator facade."""

import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.estimator import PLSRegressor
from pls_tpu.models.kernel_pls import fit
from pls_tpu.models.predict import (
    coefficients,
    fitted_values,
    selectivity_ratio,
    target_projection,
)


def _data(n=60, K=25, informative=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, K))
    beta = np.zeros(K)
    # magnitudes bounded away from zero so "informative" means informative
    beta[:informative] = rng.uniform(1.0, 2.0, size=informative) * rng.choice(
        [-1.0, 1.0], size=informative
    )
    y = X @ beta + 0.1 * rng.normal(size=n)
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = (y - y.mean()) / y.std(ddof=1)
    return jnp.asarray(X), jnp.asarray(y[:, None])


def test_target_projection_identity():
    """ŷ = t_TP · ‖b‖ — the TP score carries ALL predictive information."""
    X, y = _data()
    f = fit(X, y, A=5)
    t_tp, p_tp = target_projection(f, X, comp=5)
    b = np.asarray(coefficients(f, 5))[:, 0]
    yhat = np.asarray(fitted_values(f, X, 5))[:, 0]
    assert np.allclose(np.asarray(t_tp) * np.linalg.norm(b), yhat, atol=1e-9)
    # p_TP is the least-squares loading: X ≈ t_TP p_TPᵀ minimizes residual
    resid = np.asarray(X) - np.outer(np.asarray(t_tp), np.asarray(p_tp))
    assert np.allclose(resid.T @ np.asarray(t_tp), 0, atol=1e-8)


def test_selectivity_ratio_screens_variables():
    # N large enough that sample correlations track the true betas
    # (at small N an informative column can legitimately decorrelate
    # from y in-sample, which SR faithfully reports)
    X, y = _data(n=400, informative=8)
    f = fit(X, y, A=10)
    sr = np.asarray(selectivity_ratio(f, X, comp=10))
    assert sr.shape == (25,)
    assert np.all(sr >= 0)
    # every informative variable outranks every uninformative one
    assert sr[:8].min() > sr[8:].max()


def test_selectivity_ratio_multi_response_column():
    X, y = _data()
    Y2 = jnp.concatenate([y, -2.0 * y], axis=1)
    f = fit(X, Y2, A=5)
    sr0 = np.asarray(selectivity_ratio(f, X, y_col=0))
    sr1 = np.asarray(selectivity_ratio(f, X, y_col=1))
    # b1 = -2 b0 → same TP direction → identical SR
    assert np.allclose(sr0, sr1, atol=1e-8)


@pytest.mark.parametrize("scale", [False, True])
def test_estimator_sample_weight_equals_row_repetition(scale):
    """Integer weights ≡ physically repeated rows — including through the
    internal z-scoring (scale=True uses weighted moments)."""
    X, y = _data(n=30)
    X = np.asarray(X) * 2.0 + 5.0  # raw units so scaling matters
    y = np.asarray(y) * 3.0 - 1.0
    w = np.ones(30)
    w[:5] = 3.0  # triple-weight the first five rows
    est_w = PLSRegressor(n_components=4, scale=scale).fit(
        X, y, sample_weight=w
    )
    X_rep = np.concatenate([np.repeat(X[:5], 3, axis=0), X[5:]])
    y_rep = np.concatenate([np.repeat(y[:5], 3, axis=0), y[5:]])
    est_r = PLSRegressor(n_components=4, scale=scale).fit(X_rep, y_rep)
    assert np.allclose(est_w.coef_, est_r.coef_, atol=1e-9)
    assert np.allclose(est_w.intercept_, est_r.intercept_, atol=1e-9)
    assert np.allclose(est_w.predict(X), est_r.predict(X), atol=1e-8)

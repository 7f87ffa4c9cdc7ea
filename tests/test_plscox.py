"""PLS-Cox survival (models/plscox.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.models.plscox import (
    _breslow_cumhaz,
    concordance_index,
    fit_plscox,
    predict_plscox,
)


def _surv_data(N=300, K=20, seed=0, censor_rate=0.3, ties=False):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N, K))
    X = (X - X.mean(0)) / X.std(0)
    beta = np.zeros(K)
    beta[:5] = [1.0, -0.8, 0.6, -0.5, 0.4]
    eta = X @ beta
    t = rng.exponential(np.exp(-eta))  # higher risk → earlier failure
    c = rng.exponential(np.quantile(t, 1 - censor_rate) * 2, size=N)
    time = np.minimum(t, c)
    event = (t <= c).astype(float)
    if ties:
        time = np.round(time, 1)  # force tied event times
    return jnp.asarray(X), jnp.asarray(time), jnp.asarray(event), beta


def test_breslow_cumhaz_matches_loop():
    """Vectorized suffix-cumsum Breslow == explicit risk-set loop."""
    rng = np.random.default_rng(1)
    N = 40
    time = np.sort(np.round(rng.exponential(size=N), 1))  # with ties
    event = (rng.uniform(size=N) < 0.7).astype(float)
    eta = rng.normal(size=N)
    got = np.asarray(
        _breslow_cumhaz(
            jnp.asarray(time), jnp.asarray(event), jnp.asarray(eta)
        )
    )
    w = np.exp(eta)
    want = np.empty(N)
    for i in range(N):
        lam = 0.0
        for tj in np.unique(time[(event > 0) & (time <= time[i])]):
            d = np.sum((time == tj) & (event > 0))
            risk = np.sum(w[time >= tj])
            lam += d / risk
        want[i] = lam
    assert np.allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("ties", [False, True])
def test_recovers_risk_direction(ties):
    X, time, event, beta = _surv_data(ties=ties)
    f = fit_plscox(X, time, event, A=3)
    assert float(f.score_norm) < 1e-6  # Newton converged on the scores
    coef = np.asarray(f.coef)
    assert np.corrcoef(coef, beta)[0, 1] > 0.8
    risk = np.asarray(predict_plscox(f, X))
    ci = concordance_index(time, event, risk)
    assert ci > 0.75, ci


def test_holdout_concordance():
    X, time, event, _ = _surv_data(N=400, seed=2)
    f = fit_plscox(X[:300], time[:300], event[:300], A=3)
    risk = np.asarray(predict_plscox(f, X[300:]))
    ci = concordance_index(time[300:], event[300:], risk)
    assert ci > 0.7, ci


def test_wide_k_gg_n():
    """K >> N — the genomics regime a plain Cox fit cannot touch."""
    X, time, event, beta = _surv_data(N=60, K=200, seed=3)
    f = fit_plscox(X, time, event, A=2)
    risk = np.asarray(predict_plscox(f, X))
    assert concordance_index(time, event, risk) > 0.7
    assert np.isfinite(np.asarray(f.coef)).all()


def test_validation():
    X, time, event, _ = _surv_data(N=40)
    with pytest.raises(ValueError):
        fit_plscox(X, time[:-1], event[:-1], A=2)
    with pytest.raises(ValueError):
        fit_plscox(X, time, event, A=0)


def test_concordance_index_sanity():
    time = np.array([1.0, 2.0, 3.0, 4.0])
    event = np.ones(4)
    assert concordance_index(time, event, np.array([4.0, 3, 2, 1])) == 1.0
    assert concordance_index(time, event, np.array([1.0, 2, 3, 4])) == 0.0
    assert concordance_index(time, event, np.zeros(4)) == 0.5

"""Sklearn-protocol estimator tests (pls_tpu/estimator.py)."""

import numpy as np
import pytest

import pls_tpu as pt
from pls_tpu.estimator import PLSRegressor


@pytest.fixture(scope="module")
def raw_nir():
    from pls_tpu import datasets

    return datasets.load_nir()


def test_fit_predict_score(raw_nir):
    X, y = raw_nir
    est = PLSRegressor(n_components=5).fit(X, y)
    # sklearn convention: (n_targets, n_features), raw units
    assert est.coef_.shape == (1, 401)
    pred = est.predict(X)
    assert pred.shape == (60, 1)
    # raw-unit predictions: mean near the octane mean, high train R²
    assert abs(pred.mean() - y.mean()) < 0.5
    assert est.score(X, y) > 0.97
    # coef_/intercept_ reproduce predict under sklearn's contract:
    # y = (X - x_mean) @ coef_.T + intercept_
    manual = (X - X.mean(axis=0)) @ est.coef_.T + est.intercept_
    np.testing.assert_allclose(manual, pred, rtol=1e-6, atol=1e-6)


def test_coef_matches_sklearn(raw_nir):
    sk = pytest.importorskip("sklearn.cross_decomposition")
    X, y = raw_nir
    est = PLSRegressor(n_components=5).fit(X, y)
    ref = sk.PLSRegression(n_components=5).fit(X, y)
    np.testing.assert_allclose(est.coef_, ref.coef_, atol=1e-6)
    np.testing.assert_allclose(est.intercept_, ref.intercept_, atol=1e-8)


def test_matches_manual_pipeline(raw_nir):
    """Estimator == z-score both → fit → predict → inverse, the reference
    CLI convention."""
    import jax.numpy as jnp

    X, y = raw_nir
    est = PLSRegressor(n_components=3).fit(X, y)
    zx, zy = pt.ZScorer.fit(X), pt.ZScorer.fit(y)
    f = pt.fit(zx.transform(X), zy.transform(y), 3)
    manual = np.asarray(zy.inverse(pt.fitted_values(f, zx.transform(X))))
    np.testing.assert_allclose(est.predict(X), manual, atol=1e-9)


def test_transform_scores(raw_nir):
    X, y = raw_nir
    est = PLSRegressor(n_components=4).fit(X, y)
    T = est.transform(X)
    assert T.shape == (60, 4)
    # type-1 scores are orthogonal
    G = T.T @ T
    off = np.abs(G - np.diag(np.diag(G))).max()
    assert off < 1e-6 * np.diag(G).max()


def test_params_protocol():
    est = PLSRegressor(n_components=7)
    p = est.get_params()
    assert p["n_components"] == 7
    est.set_params(n_components=3, method=pt.SIMPLS)
    assert est.n_components == 3 and est.method is pt.SIMPLS
    with pytest.raises(ValueError):
        est.set_params(bogus=1)


def test_vip_property(raw_nir):
    X, y = raw_nir
    est = PLSRegressor(n_components=3).fit(X, y)
    v = est.vip_
    assert v.shape == (401,)
    np.testing.assert_allclose(np.mean(v**2), 1.0, rtol=1e-6)


def test_unscaled_mode(raw_nir):
    X, y = raw_nir
    est = PLSRegressor(n_components=3, scale=False).fit(X, y)
    # without internal scaling the estimator works in raw space directly
    assert est.predict(X).shape == (60, 1)


def test_sklearn_gridsearchcv_interop():
    """PLSRegressor must survive sklearn's clone/get_params/set_params
    machinery inside GridSearchCV — pins the estimator protocol against
    the ecosystem's actual consumer, not just our own tune.py."""
    pytest.importorskip("sklearn")
    import numpy as np
    from sklearn.model_selection import GridSearchCV

    from pls_tpu.estimator import PLSRegressor

    rng = np.random.default_rng(0)
    X = rng.normal(size=(60, 10))
    y = 2 * X[:, 0] - X[:, 1] + 0.05 * rng.normal(size=60)
    gs = GridSearchCV(
        PLSRegressor(),
        {"n_components": [1, 2, 4]},
        cv=3,
        scoring="neg_mean_squared_error",
    )
    gs.fit(X, y)
    assert gs.best_params_["n_components"] >= 2
    pred = gs.predict(X[:5])
    assert pred.shape[0] == 5

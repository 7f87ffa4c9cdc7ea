"""sklearn-protocol facades for the extended model families
(SPLSRegressor / OPLSRegressor / KPLSRegressor)."""

import numpy as np

from pls_tpu.estimator import (
    KPLSRegressor,
    OPLSRegressor,
    PLSRegressor,
    SPLSRegressor,
)


def _data(n=50, k=10, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, k))
    beta = np.zeros(k)
    beta[:3] = [2.0, -1.0, 0.5]
    y = X @ beta + 0.1 * rng.normal(size=n) + 5.0  # un-centered raw units
    return X, y


class TestSPLSRegressor:
    def test_fit_predict_score(self):
        X, y = _data()
        m = SPLSRegressor(n_components=2, keep_x=3).fit(X, y)
        assert m.score(X, y) > 0.95
        assert m.selected_.sum() <= 6
        assert set(np.flatnonzero(m.selected_)) >= {0, 1}
        assert m.transform(X).shape == (50, 2)

    def test_dense_default_matches_plsregressor_family(self):
        X, y = _data()
        dense = SPLSRegressor(n_components=2).fit(X, y)
        assert dense.score(X, y) > 0.9

    def test_params_roundtrip(self):
        m = SPLSRegressor(keep_x=5)
        p = m.get_params()
        assert p["keep_x"] == 5
        m.set_params(keep_x=7, n_components=3)
        assert m.keep_x == 7 and m.n_components == 3


class TestOPLSRegressor:
    def test_fit_predict(self):
        X, y = _data()
        m = OPLSRegressor(n_ortho=2, n_components=1).fit(X, y)
        assert m.score(X, y) > 0.9
        assert m.r2x_ortho_.shape == (2,)
        assert m.transform_ortho(X).shape == (50, 2)

    def test_matches_pls_at_same_total_components(self):
        X, y = _data()
        m_opls = OPLSRegressor(n_ortho=2, n_components=1).fit(X, y)
        m_pls = PLSRegressor(n_components=3).fit(X, y)
        np.testing.assert_allclose(
            m_opls.predict(X), m_pls.predict(X), atol=1e-6
        )


class TestKPLSRegressor:
    def test_nonlinear_fit(self):
        rng = np.random.default_rng(1)
        X = rng.uniform(-2, 2, size=(80, 2))
        y = np.sin(2 * X[:, 0]) * np.cos(X[:, 1]) + 3.0
        lin = PLSRegressor(n_components=2).fit(X, y)
        ker = KPLSRegressor(n_components=20, kernel="rbf", gamma=1.0).fit(X, y)
        assert lin.score(X, y) < 0.3
        assert ker.score(X, y) > 0.9

    def test_raw_units_roundtrip(self):
        X, y = _data()
        m = KPLSRegressor(n_components=5, kernel="linear").fit(X, y)
        pred = m.predict(X)
        # predictions come back in raw y units (mean ~5), not z-scores
        assert abs(np.mean(pred) - np.mean(y)) < 0.5

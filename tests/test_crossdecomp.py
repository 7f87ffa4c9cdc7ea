"""Cross-decomposition family (PLSCanonical / CCA / PLSSVD) vs sklearn.

sklearn.cross_decomposition is the de-facto specification for these
models' conventions (power-method formulation, canonical deflation,
per-component sign fix); our implementations follow the same conventions
(models/crossdecomp.py), so weights/scores/loadings/coefficients must
agree to tight tolerances without any sign post-processing.
"""

import numpy as np
import pytest

import pls_tpu as pt

sk = pytest.importorskip("sklearn.cross_decomposition")


def _data(n=40, k=8, m=5, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(n, 3))
    X = L @ rng.normal(size=(3, k)) + 0.3 * rng.normal(size=(n, k))
    Y = L @ rng.normal(size=(3, m)) + 0.3 * rng.normal(size=(n, m))
    return X, Y


@pytest.mark.parametrize("scale", [True, False])
def test_plscanonical_matches_sklearn(scale):
    X, Y = _data()
    A = 3
    ours = pt.PLSCanonical(n_components=A, scale=scale).fit(X, Y)
    ref = sk.PLSCanonical(n_components=A, scale=scale).fit(X, Y)

    np.testing.assert_allclose(ours.x_weights_, ref.x_weights_, atol=1e-8)
    np.testing.assert_allclose(ours.y_weights_, ref.y_weights_, atol=1e-8)
    np.testing.assert_allclose(ours.x_loadings_, ref.x_loadings_, atol=1e-8)
    np.testing.assert_allclose(ours.y_loadings_, ref.y_loadings_, atol=1e-8)
    # training-data scores via the public transform API (T = Xc R, U = Yc Ry)
    rxs_tr, rys_tr = ref.transform(X, Y)
    np.testing.assert_allclose(ours.x_scores_, rxs_tr, atol=1e-8)
    np.testing.assert_allclose(ours.y_scores_, rys_tr, atol=1e-8)
    np.testing.assert_allclose(ours.x_rotations_, ref.x_rotations_, atol=1e-8)
    np.testing.assert_allclose(ours.predict(X), ref.predict(X), atol=1e-7)
    # sklearn-compatible raw-unit coefficients and intercept
    np.testing.assert_allclose(ours.coef_, ref.coef_, atol=1e-7)
    np.testing.assert_allclose(ours.intercept_, ref.intercept_, atol=1e-9)
    xs, ys = ours.transform(X, Y)
    rxs, rys = ref.transform(X, Y)
    np.testing.assert_allclose(xs, rxs, atol=1e-7)
    np.testing.assert_allclose(ys, rys, atol=1e-7)


def test_cca_matches_sklearn():
    X, Y = _data(seed=1)
    A = 3
    ours = pt.CCA(n_components=A).fit(X, Y)
    ref = sk.CCA(n_components=A).fit(X, Y)
    np.testing.assert_allclose(ours.x_weights_, ref.x_weights_, atol=1e-6)
    np.testing.assert_allclose(ours.y_weights_, ref.y_weights_, atol=1e-6)
    np.testing.assert_allclose(ours.x_scores_, ref.transform(X), atol=1e-6)
    np.testing.assert_allclose(ours.predict(X), ref.predict(X), atol=1e-6)


def test_cca_scores_maximally_correlated():
    # the defining property: per-component corr(t, u) ≥ mode-A's
    X, Y = _data(seed=2)
    cca = pt.CCA(n_components=2).fit(X, Y)
    pls = pt.PLSCanonical(n_components=2).fit(X, Y)
    for j in range(2):
        r_cca = np.corrcoef(cca.x_scores_[:, j], cca.y_scores_[:, j])[0, 1]
        r_pls = np.corrcoef(pls.x_scores_[:, j], pls.y_scores_[:, j])[0, 1]
        assert r_cca >= r_pls - 1e-10


def test_plssvd_matches_sklearn():
    X, Y = _data(seed=3)
    A = 3
    ours = pt.PLSSVD(n_components=A).fit(X, Y)
    ref = sk.PLSSVD(n_components=A).fit(X, Y)
    np.testing.assert_allclose(ours.x_weights_, ref.x_weights_, atol=1e-8)
    np.testing.assert_allclose(ours.y_weights_, ref.y_weights_, atol=1e-8)
    xs, ys = ours.transform(X, Y)
    rxs, rys = ref.transform(X, Y)
    np.testing.assert_allclose(xs, rxs, atol=1e-7)
    np.testing.assert_allclose(ys, rys, atol=1e-7)


def test_functional_api_jits_and_checkpoints(tmp_path):
    import jax.numpy as jnp

    X, Y = _data(seed=4)
    Xc = jnp.asarray(X - X.mean(0))
    Yc = jnp.asarray(Y - Y.mean(0))
    fit = pt.fit_plscanonical(Xc, Yc, 3)
    B = pt.cd_coefficients(fit)
    assert B.shape == (X.shape[1], Y.shape[1])
    # scores roundtrip through rotations
    np.testing.assert_allclose(
        np.asarray(pt.cd_transform(fit, Xc)), np.asarray(fit.T), atol=1e-8
    )
    # generic checkpointing covers the new pytree
    path = tmp_path / "cd.npz"
    pt.save_fit(fit, str(path))
    back = pt.load_fit(str(path))
    np.testing.assert_allclose(np.asarray(back.W), np.asarray(fit.W))
    assert back.mode == "canonical"


def test_constant_first_y_column_not_nan():
    """Regression: a constant first Y column (zero after centering) used to
    seed the power iteration with u0 = 0, silently producing all-NaN
    weights/scores in mode A and mode B."""
    X, Y = _data(m=4, seed=6)
    Y = np.column_stack([np.ones(X.shape[0]), Y])  # constant first column
    for est in (pt.PLSCanonical(n_components=2, scale=False),
                pt.CCA(n_components=2, scale=False)):
        est.fit(X, Y)
        assert np.isfinite(est.x_weights_).all()
        assert np.isfinite(est.x_scores_).all()
        assert np.isfinite(est.predict(X)).all()
    # and the fitted directions still match sklearn's on the same data
    ours = pt.PLSCanonical(n_components=2, scale=False).fit(X, Y)
    ref = sk.PLSCanonical(n_components=2, scale=False).fit(X, Y)
    np.testing.assert_allclose(ours.x_weights_, ref.x_weights_, atol=1e-6)


def test_plssvd_estimator_has_no_predict():
    X, Y = _data(seed=5)
    est = pt.PLSSVD(n_components=2).fit(X, Y)
    with pytest.raises(AttributeError):
        est.predict(X)

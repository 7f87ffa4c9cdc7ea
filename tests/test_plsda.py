"""PLS-DA classifier (models/plsda.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.models.plsda import (
    PLSDAClassifier,
    fit_plsda,
    one_hot,
    predict_classes,
    predict_proba,
)


def _blobs(rng, n_per, centers, spread=0.3):
    K = centers.shape[1]
    X = np.concatenate(
        [c + spread * rng.normal(size=(n_per, K)) for c in centers]
    )
    y = np.repeat(np.arange(len(centers)), n_per)
    perm = rng.permutation(len(y))
    return X[perm], y[perm]


def test_one_hot():
    oh = one_hot(jnp.array([0, 2, 1]), 3)
    assert oh.shape == (3, 3)
    np.testing.assert_array_equal(
        np.asarray(oh), [[1, 0, 0], [0, 0, 1], [0, 1, 0]]
    )


def test_functional_separable():
    rng = np.random.default_rng(0)
    centers = np.array([[3.0, 0, 0, 0], [0, 3.0, 0, 0], [0, 0, 3.0, 0]])
    X, y = _blobs(rng, 40, centers)
    Xc = jnp.asarray(X - X.mean(0))
    f = fit_plsda(Xc, jnp.asarray(y), 3, A=3)
    pred = np.asarray(predict_classes(f, Xc))
    assert np.mean(pred == y) > 0.97
    proba = np.asarray(predict_proba(f, Xc))
    assert proba.shape == (len(y), 3)
    np.testing.assert_allclose(proba.sum(1), 1.0, rtol=1e-5)


def test_estimator_roundtrip_and_labels():
    rng = np.random.default_rng(1)
    centers = np.array([[2.5, 0, 0], [0, 2.5, 0]])
    X, y_int = _blobs(rng, 60, centers)
    y = np.array(["neg", "pos"])[y_int]  # arbitrary label values

    clf = PLSDAClassifier(n_components=2).fit(X, y)
    assert list(clf.classes_) == ["neg", "pos"]
    assert clf.score(X, y) > 0.97
    pred = clf.predict(X)
    assert set(pred) <= {"neg", "pos"}

    # held-out generalization
    Xt, yt_int = _blobs(rng, 40, centers)
    assert clf.score(Xt, np.array(["neg", "pos"])[yt_int]) > 0.95

    proba = clf.predict_proba(Xt)
    assert proba.shape == (len(yt_int), 2)
    np.testing.assert_allclose(proba.sum(1), 1.0, rtol=1e-5)

    scores = clf.transform(Xt)
    assert scores.shape == (len(yt_int), 2)


def test_estimator_params_and_errors():
    clf = PLSDAClassifier(n_components=3, scale=False)
    p = clf.get_params()
    assert p["n_components"] == 3 and p["scale"] is False
    clf.set_params(n_components=1)
    assert clf.n_components == 1
    with pytest.raises(ValueError):
        clf.set_params(bogus=1)
    with pytest.raises(ValueError):
        clf.fit(np.zeros((4, 3)), np.zeros(4))  # single class


def test_imbalanced_priors_help():
    """With a 9:1 class imbalance and overlapping blobs, adding priors to
    the decision values must not hurt accuracy on the training mix."""
    rng = np.random.default_rng(2)
    X0 = 0.0 + 1.0 * rng.normal(size=(180, 5))
    X1 = 0.8 + 1.0 * rng.normal(size=(20, 5))
    X = np.concatenate([X0, X1])
    y = np.array([0] * 180 + [1] * 20)
    clf = PLSDAClassifier(n_components=2).fit(X, y)
    assert clf.score(X, y) >= 0.85

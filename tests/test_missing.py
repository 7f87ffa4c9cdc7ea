"""Missing-data PLS (pls_tpu/models/missing.py): NaN-tolerant NIPALS,
masked scoring, EM imputation, NaN-aware column stats."""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt
from pls_tpu.models.missing import (
    fit_nipals_missing,
    impute_pls,
    nan_column_stats,
    predict_missing,
    scores_missing,
)
from pls_tpu.models.nipals import fit_nipals


@pytest.fixture(scope="module")
def nir_z():
    from pls_tpu import datasets

    X, y = datasets.load_nir()
    Xz = np.asarray(pt.ZScorer.fit(jnp.asarray(X)).transform(X))
    yz = np.asarray(pt.ZScorer.fit(jnp.asarray(y)).transform(y))
    return Xz, yz


def _punch_holes(X, frac, seed=0):
    rng = np.random.default_rng(seed)
    Xm = X.copy()
    holes = rng.random(X.shape) < frac
    # never blank a full row or column
    holes[:, 0] = False
    holes[0, :] = False
    Xm[holes] = np.nan
    return Xm, holes


def test_reduces_to_dense_nipals_when_complete(nir_z):
    Xz, yz = nir_z
    fm = fit_nipals_missing(jnp.asarray(Xz), jnp.asarray(yz), 5)
    fd = fit_nipals(jnp.asarray(Xz), jnp.asarray(yz), 5)
    for name in ("W", "P", "Q", "R", "T"):
        np.testing.assert_allclose(
            np.asarray(getattr(fm, name)),
            np.asarray(getattr(fd, name)),
            atol=1e-8,
            err_msg=name,
        )
    # masked scoring of complete data = plain projection
    np.testing.assert_allclose(
        np.asarray(scores_missing(fm, jnp.asarray(Xz))),
        np.asarray(Xz @ np.asarray(fm.R)),
        atol=1e-6,
    )


def test_tolerates_missing_entries(nir_z):
    Xz, yz = nir_z
    Xm, holes = _punch_holes(Xz, 0.05)
    assert np.isnan(Xm).any()
    fm = fit_nipals_missing(jnp.asarray(Xm), jnp.asarray(yz), 4)
    assert np.isfinite(np.asarray(fm.W)).all()
    assert np.isfinite(np.asarray(fm.T)).all()
    # model fitted on gappy data still predicts complete data well
    pred = np.asarray(pt.fitted_values(fm, jnp.asarray(Xz)))
    r2 = 1 - np.sum((yz - pred) ** 2) / np.sum(yz**2)
    assert r2 > 0.9
    # and close to the no-missing model's predictions
    fd = fit_nipals(jnp.asarray(Xz), jnp.asarray(yz), 4)
    pref = np.asarray(pt.fitted_values(fd, jnp.asarray(Xz)))
    assert np.corrcoef(pred.ravel(), pref.ravel())[0, 1] > 0.99


def test_predict_missing_new_data(nir_z):
    Xz, yz = nir_z
    fd = fit_nipals(jnp.asarray(Xz), jnp.asarray(yz), 4)
    Xm, _ = _punch_holes(Xz, 0.05, seed=1)
    pred_gappy = np.asarray(predict_missing(fd, jnp.asarray(Xm)))
    pred_full = np.asarray(pt.fitted_values(fd, jnp.asarray(Xz)))
    assert np.isfinite(pred_gappy).all()
    # gappy scoring degrades gracefully: still highly correlated
    assert np.corrcoef(pred_gappy.ravel(), pred_full.ravel())[0, 1] > 0.98


def test_impute_beats_mean_imputation(nir_z):
    Xz, yz = nir_z
    Xm, holes = _punch_holes(Xz, 0.10, seed=2)
    Xc, fit = impute_pls(jnp.asarray(Xm), jnp.asarray(yz), 5, n_outer=30)
    Xc = np.asarray(Xc)
    assert np.isfinite(Xc).all()
    # observed entries untouched
    np.testing.assert_allclose(Xc[~holes], Xz[~holes], atol=1e-12)
    err_pls = np.sqrt(np.mean((Xc[holes] - Xz[holes]) ** 2))
    err_mean = np.sqrt(np.mean(Xz[holes] ** 2))  # mean imputation = 0-fill
    assert err_pls < 0.5 * err_mean
    assert np.isfinite(np.asarray(fit.W)).all()


def test_nan_column_stats():
    rng = np.random.default_rng(3)
    X = rng.normal(loc=2.0, scale=3.0, size=(200, 6))
    Xm, holes = _punch_holes(X, 0.2, seed=4)
    mean, sd = nan_column_stats(jnp.asarray(Xm))
    for j in range(6):
        col = Xm[:, j]
        col = col[np.isfinite(col)]
        np.testing.assert_allclose(float(mean[j]), col.mean(), rtol=1e-6)
        np.testing.assert_allclose(float(sd[j]), col.std(ddof=1), rtol=1e-6)
    # constant / empty-ish columns get the guard value 1
    Xm[:, 2] = 5.0
    Xm[1:, 3] = np.nan
    mean2, sd2 = nan_column_stats(jnp.asarray(Xm))
    assert float(sd2[2]) == 1.0
    assert float(sd2[3]) == 1.0
    np.testing.assert_allclose(float(mean2[2]), 5.0)

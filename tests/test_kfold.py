"""K-fold / leave-group-out CV (cv/kfold.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.cv.kfold import cv_group, cv_kfold, kfold_assignments
from pls_tpu.cv.loo import cv_loo
from pls_tpu.cv.validation import optimal_num_components, validation
from pls_tpu.models.kernel_pls import fit
from pls_tpu.models.predict import residuals_all_components
from pls_tpu.types import MSE


def test_assignments_balanced_and_seeded():
    a = kfold_assignments(23, 5, key=0)
    counts = np.bincount(np.asarray(a), minlength=5)
    assert counts.max() - counts.min() <= 1
    b = kfold_assignments(23, 5, key=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = kfold_assignments(23, 5, key=1)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_kfold_equals_loo_when_k_is_n(toy):
    X, Y = toy
    r_loo = cv_loo(X, Y, 2)
    r_k = cv_kfold(X, Y, 2, k=X.shape[0], key=None)
    np.testing.assert_allclose(
        np.asarray(r_k.errors), np.asarray(r_loo.errors), atol=1e-10
    )
    assert r_k.method == "10-FOLD"


def test_kfold_matches_manual_refits(toy):
    """Each row's recorded error must equal a from-scratch fit on the
    complement of its fold."""
    X, Y = toy
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    N = X.shape[0]
    k, A = 3, 2
    assign = np.asarray(kfold_assignments(N, k, key=42))
    r = cv_kfold(X, Y, A, k=k, assignments=jnp.asarray(assign))
    for fid in range(k):
        keep = assign != fid
        f = fit(X[keep], Y[keep], A)
        res = residuals_all_components(f, X[~keep], Y[~keep])  # (h, A, M)
        got = np.asarray(r.errors)[:, ~keep, :]  # (M, h, A)
        np.testing.assert_allclose(
            got, np.transpose(np.asarray(res), (2, 0, 1)), atol=1e-9
        )


def test_kfold_feeds_validation_stack(nir):
    X, Y = nir
    r = cv_kfold(X, Y, 6, k=5, key=7)
    press = validation(r, MSE)
    assert press.shape == (1, 6)
    opt = optimal_num_components(r)
    assert 1 <= int(opt[0]) <= 6


def test_kfold_validates_k(toy):
    X, Y = toy
    with pytest.raises(ValueError):
        cv_kfold(X, Y, 2, k=1)
    with pytest.raises(ValueError):
        cv_kfold(X, Y, 2, k=X.shape[0] + 1)


def test_group_cv_matches_manual(toy):
    X, Y = toy
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    N = X.shape[0]
    groups = np.array([10, 10, 10, 7, 7, 7, 3, 3, 3, 3])[:N]
    r = cv_group(X, Y, groups, 2)
    assert r.method == "GROUP"
    for g in np.unique(groups):
        keep = groups != g
        f = fit(X[keep], Y[keep], 2)
        res = residuals_all_components(f, X[~keep], Y[~keep])
        got = np.asarray(r.errors)[:, ~keep, :]
        np.testing.assert_allclose(
            got, np.transpose(np.asarray(res), (2, 0, 1)), atol=1e-9
        )
    with pytest.raises(ValueError):
        cv_group(X, Y, np.zeros(N), 2)

"""Hyper-parameter tuning: k-fold grid search over estimator parameters.

Not in the reference (whose only model-selection tool is the Wilcoxon
component test, /root/reference/src/pls.cpp:263-289 — kept as
cv/validation.optimal_num_components).  This module covers the knobs the
extended families add: keep_x for sparse PLS, (gamma, n_components) for
kernel PLS, n_ortho for OPLS — anything speaking the estimator protocol
(fit/predict/get_params/set_params, estimator.py).

Folds reuse one shuffled permutation (explicit PRNG key), and every fold
has the SAME train/test sizes (remainder rows join the last fold's train
side), so each (param, fold) fit hits the same jit cache entry — the
compile cost is paid once per parameter setting, not once per fold.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import jax
import numpy as np


def kfold_split(n: int, n_folds: int, key: jax.Array | None = None):
    """List of (train_idx, test_idx) numpy index arrays.  Equal-size test
    folds of n // n_folds rows (shuffled when a key is given); the n %
    n_folds leftover rows are always in training."""
    if not (2 <= n_folds <= n):
        raise ValueError(f"need 2 <= n_folds <= N, got {n_folds} / {n}")
    perm = (
        np.asarray(jax.random.permutation(key, n))
        if key is not None
        else np.arange(n)
    )
    fold_size = n // n_folds
    splits = []
    for f in range(n_folds):
        test = perm[f * fold_size : (f + 1) * fold_size]
        train = np.setdiff1d(perm, test)
        splits.append((train, test))
    return splits


@dataclass
class GridResult:
    """One grid point: its parameters, per-fold RMSE, and the mean."""

    params: dict
    fold_rmse: np.ndarray
    rmse: float


def grid_search_cv(
    make_estimator,
    param_grid: dict,
    X,
    Y,
    *,
    n_folds: int = 5,
    key: jax.Array | None = None,
):
    """Exhaustive k-fold CV over the cartesian product of `param_grid`.

    make_estimator: zero-arg factory returning a fresh estimator
      (anything with set_params/fit/predict — estimator.py facades).
    param_grid: {name: [values...]}.

    Returns (best: GridResult, results: list[GridResult]) with results in
    grid order; best minimizes mean RMSE over folds.
    """
    X = np.asarray(X)
    Y = np.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    splits = kfold_split(X.shape[0], n_folds, key)

    names = list(param_grid)
    results: list[GridResult] = []
    for values in itertools.product(*(param_grid[n] for n in names)):
        params = dict(zip(names, values))
        fold_rmse = []
        for train, test in splits:
            est = make_estimator().set_params(**params)
            est.fit(X[train], Y[train])
            pred = np.asarray(est.predict(X[test])).reshape(Y[test].shape)
            fold_rmse.append(float(np.sqrt(np.mean((pred - Y[test]) ** 2))))
        fold_rmse = np.asarray(fold_rmse)
        results.append(GridResult(params, fold_rmse, float(fold_rmse.mean())))
    best = min(results, key=lambda r: r.rmse)
    return best, results


def tune_spls_keepx(
    X, Y, A: int, keep_grid, *, n_folds: int = 5, key: jax.Array | None = None
):
    """Select sparse-PLS keep_x by k-fold RMSE.  Returns (best, results)."""
    from pls_tpu.estimator import SPLSRegressor

    return grid_search_cv(
        lambda: SPLSRegressor(n_components=A),
        {"keep_x": list(keep_grid)},
        X, Y, n_folds=n_folds, key=key,
    )


def tune_kpls(
    X, Y, *, gamma_grid, ncomp_grid, kernel: str = "rbf",
    n_folds: int = 5, key: jax.Array | None = None,
):
    """Joint (gamma, n_components) selection for kernel PLS."""
    from pls_tpu.estimator import KPLSRegressor

    return grid_search_cv(
        lambda: KPLSRegressor(kernel=kernel),
        {"gamma": list(gamma_grid), "n_components": list(ncomp_grid)},
        X, Y, n_folds=n_folds, key=key,
    )

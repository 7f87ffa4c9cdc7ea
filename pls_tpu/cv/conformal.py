"""Distribution-free prediction intervals: jackknife+ and split conformal.

The reference quantifies uncertainty only in aggregate (PRESS/RMSE over a
CV — /root/reference/src/pls.cpp:229-261); per-prediction intervals are
what a deployed regression actually needs.  Two standard constructions:

- **Jackknife+** (Barber, Candès, Ramdas & Tibshirani 2021, Ann. Stat.
  49:486): for each LOO fold i, keep the held-out absolute residual Rᵢ
  and the fold model's prediction ŷ₋ᵢ(x) at the new point; the interval
  is [q⁻_α{ŷ₋ᵢ(x) − Rᵢ}, q⁺_α{ŷ₋ᵢ(x) + Rᵢ}].  Guaranteed ≥ 1−2α
  coverage with NO distributional assumptions; in practice ≈ 1−α.
  Folds ride the same vmapped masked-fit engine as cv_LOO (cv/loo.py),
  so N fold models cost one batched fit sweep, and fold predictions at
  the new points are computed inside each fold (no K×M×N coefficient
  tensor is ever materialized).

- **Split conformal** (Papadopoulos et al. 2002): one fit on a training
  split, residual quantile on a disjoint calibration split, constant
  interval width.  One fit total — the cheap option for very large N.

Both operate in the caller's (typically z-scored) units on centered
data, like every other cv/ module; the estimator facade is the place
where raw-unit conversion lives.
"""

from __future__ import annotations

import jax.numpy as jnp

from pls_tpu.models.kernel_pls import fit
from pls_tpu.models.predict import coefficients, fitted_values
from pls_tpu.types import KERNEL_TYPE1, METHOD
from pls_tpu.utils.batching import padded_map


def _order_stat(sorted_vals: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-th order statistic (1-based) along axis 0, clipped to range."""
    idx = jnp.clip(k - 1, 0, sorted_vals.shape[0] - 1)
    return sorted_vals[idx]


def jackknife_plus_intervals(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    X_new: jnp.ndarray,
    A: int,
    *,
    alpha: float = 0.1,
    method: METHOD = KERNEL_TYPE1,
    comp: int | None = None,
    batch_size: int | None = None,
    precision: str | None = "highest",
):
    """Jackknife+ prediction intervals for each row of X_new.

    Returns (lo, hi, pred): each (n_new, M); `pred` is the full-data
    model's point prediction.  Coverage ≥ 1−2α guaranteed, ≈ 1−α
    typical.  Cost: one LOO sweep of masked fits (vmapped/chunked).
    """
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    X_new = jnp.asarray(X_new)
    N = X.shape[0]
    if batch_size is None:
        batch_size = min(N, 64)

    def fold(i):
        mask = (jnp.arange(N) != i).astype(X.dtype)
        f = fit(X, Y, A, method, row_mask=mask, precision=precision)
        B = coefficients(f, comp)  # (K, M)
        resid = jnp.abs(Y[i] - X[i] @ B)  # (M,) held-out LOO residual
        preds = X_new @ B  # (n_new, M) fold-model predictions
        return preds, resid

    preds, resids = padded_map(fold, jnp.arange(N), batch_size)
    # preds (N, n_new, M); resids (N, M)
    lows = jnp.sort(preds - resids[:, None, :], axis=0)
    highs = jnp.sort(preds + resids[:, None, :], axis=0)
    # jackknife+ order statistics with the (N+1) finite-sample correction
    k_lo = int(jnp.floor(alpha * (N + 1)))
    k_hi = int(jnp.ceil((1.0 - alpha) * (N + 1)))
    lo = _order_stat(lows, max(k_lo, 1))
    hi = _order_stat(highs, min(k_hi, N))
    f_full = fit(X, Y, A, method, precision=precision)
    pred = fitted_values(f_full, X_new, comp)
    return lo, hi, pred


def cv_plus_intervals(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    X_new: jnp.ndarray,
    A: int,
    *,
    n_folds: int = 10,
    alpha: float = 0.1,
    key=None,
    method: METHOD = KERNEL_TYPE1,
    comp: int | None = None,
    precision: str | None = "highest",
):
    """CV+ prediction intervals (the k-fold jackknife+ of Barber et al.
    2021 §3): n_folds masked fits instead of N, same ≥ 1−2α guarantee —
    the scalable choice when N is large.

    Every training row i contributes (ŷ_fold(i)(x) ± Rᵢ) built from the
    model that did NOT see row i.  Returns (lo, hi, pred), each
    (n_new, M).
    """
    import jax

    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    X_new = jnp.asarray(X_new)
    N = X.shape[0]
    n_folds = min(n_folds, N)
    if key is None:
        key = jax.random.key(0)
    fold_of = jax.random.permutation(key, jnp.arange(N) % n_folds)

    def fold(j):
        mask = (fold_of != j).astype(X.dtype)
        f = fit(X, Y, A, method, row_mask=mask, precision=precision)
        return coefficients(f, comp)  # (K, M)

    # n_folds is small: materializing (n_folds, K, M) is fine
    Bs = padded_map(fold, jnp.arange(n_folds), n_folds)
    B_of_row = Bs[fold_of]  # (N, K, M)
    resid = jnp.abs(Y - jnp.einsum("nk,nkm->nm", X, B_of_row))  # (N, M)
    preds = jnp.einsum("pk,fkm->fpm", X_new, Bs)  # (n_folds, n_new, M)
    preds_of_row = preds[fold_of]  # (N, n_new, M)
    lows = jnp.sort(preds_of_row - resid[:, None, :], axis=0)
    highs = jnp.sort(preds_of_row + resid[:, None, :], axis=0)
    k_lo = int(jnp.floor(alpha * (N + 1)))
    k_hi = int(jnp.ceil((1.0 - alpha) * (N + 1)))
    lo = _order_stat(lows, max(k_lo, 1))
    hi = _order_stat(highs, min(k_hi, N))
    f_full = fit(X, Y, A, method, precision=precision)
    pred = fitted_values(f_full, X_new, comp)
    return lo, hi, pred


def split_conformal_intervals(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    X_new: jnp.ndarray,
    A: int,
    *,
    alpha: float = 0.1,
    calib_frac: float = 0.3,
    key=None,
    method: METHOD = KERNEL_TYPE1,
    comp: int | None = None,
    precision: str | None = "highest",
):
    """Split-conformal intervals: ONE fit on ⌈(1−calib_frac)N⌉ training
    rows, the conformity quantile from the held-out calibration rows,
    constant width per response.

    Returns (lo, hi, pred), each (n_new, M).  Exchangeability of rows is
    the only assumption; pass a jax PRNG `key` to randomize the split
    (default: deterministic key 0).
    """
    import jax

    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    X_new = jnp.asarray(X_new)
    N = X.shape[0]
    n_cal = max(int(round(calib_frac * N)), 1)
    if key is None:
        key = jax.random.key(0)
    perm = jax.random.permutation(key, N)
    cal_idx, tr_idx = perm[:n_cal], perm[n_cal:]
    # masked fit on the training rows (same batching trick as CV)
    mask = jnp.zeros((N,), X.dtype).at[tr_idx].set(1.0)
    f = fit(X, Y, A, method, row_mask=mask, precision=precision)
    B = coefficients(f, comp)
    scores = jnp.abs(Y[cal_idx] - X[cal_idx] @ B)  # (n_cal, M)
    # conformal quantile: ⌈(1−α)(n_cal+1)⌉-th order statistic
    k = int(jnp.ceil((1.0 - alpha) * (n_cal + 1)))
    q = _order_stat(jnp.sort(scores, axis=0), min(k, n_cal))  # (M,)
    pred = X_new @ B
    return pred - q[None, :], pred + q[None, :], pred

"""Statistical inference on PLS models: jackknife coefficient uncertainty
(Martens & Martens 2000, Food Qual. Pref. 11:5-16) and Y-permutation
model validation (Lindgren et al. 1996, J. Chemometrics 10:521-532).

Not in the reference (which stops at Wilcoxon-based component selection,
/root/reference/src/pls.cpp:263-289); these are the standard chemometrics
significance tools built on the same batched-fit machinery:

- Jackknife: the LOO sub-models' coefficients are a vmapped masked-fit
  sweep (identical machinery to cv/loo.py); the Martens variance estimate
  s²(b) = ((N−1)/N) Σᵢ (bᵢ − b̄)² yields per-coefficient t-statistics and
  normal-approximation p-values — which predictors significantly
  contribute at a given component count.
- Permutation test: refit under `n_perm` random permutations of Y's rows
  (a vmapped axis of explicit PRNG keys) and compare the observed R²
  (and optionally LOO-downdate Q²) against the null distribution.
  p = (1 + #{perm ≥ observed}) / (n_perm + 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pls_tpu.models.kernel_pls import fit
from pls_tpu.models.predict import coefficients, explained_variance
from pls_tpu.ops.special import normalcdf_exact
from pls_tpu.types import METHOD
from pls_tpu.utils.batching import padded_map


def jackknife_coefficients(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    A: int,
    method: METHOD = METHOD.KERNEL_TYPE1,
    *,
    comp: int | None = None,
    batch_size: int | None = None,
    precision: str | None = "highest",
) -> jnp.ndarray:
    """(N, K, M) leave-one-out coefficient estimates: fold i's B is fit
    with row i masked out (exact, same masked-reduction argument as
    cv/loo.py)."""
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    N = X.shape[0]
    if batch_size is None:
        batch_size = min(N, 64)

    def fold(i):
        mask = (jnp.arange(N) != i).astype(X.dtype)
        f = fit(X, Y, A, method, row_mask=mask, precision=precision)
        return coefficients(f, comp)

    return padded_map(fold, jnp.arange(N), batch_size)


def coefficient_significance(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    A: int,
    method: METHOD = METHOD.KERNEL_TYPE1,
    *,
    comp: int | None = None,
    batch_size: int | None = None,
    precision: str | None = "highest",
):
    """Martens-jackknife coefficient uncertainty.

    Returns (B, se, t, p): the full-data coefficients (K, M), the jackknife
    standard error s(b) with the (N−1)/N small-sample factor, the
    t-statistic B/s, and two-sided normal-approximation p-values.  A
    coefficient with p below the chosen α contributes significantly to the
    model at this component count.
    """
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    N = X.shape[0]
    B = coefficients(fit(X, Y, A, method, precision=precision), comp)
    Bs = jackknife_coefficients(
        X, Y, A, method, comp=comp, batch_size=batch_size, precision=precision
    )
    # Martens & Martens: s²(b) = ((N−1)/N) Σᵢ (bᵢ − b̄)²
    Bbar = jnp.mean(Bs, axis=0)
    var = (N - 1) / N * jnp.sum((Bs - Bbar) ** 2, axis=0)
    se = jnp.sqrt(var)
    t = jnp.where(se > 0, B / jnp.where(se > 0, se, 1.0), jnp.inf * jnp.sign(B))
    p = 2.0 * (1.0 - normalcdf_exact(jnp.abs(t)))
    return B, se, t, p


def permutation_test(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    A: int,
    num_permutations: int,
    key: jax.Array,
    method: METHOD = METHOD.KERNEL_TYPE1,
    *,
    comp: int | None = None,
    batch_size: int | None = None,
    precision: str | None = "highest",
):
    """Y-permutation test of model validity.

    Refits the model under `num_permutations` row-permutations of Y and
    compares each permuted fit's mean explained variance (R² averaged over
    Y columns, at truncation `comp`) against the observed one.

    Returns (r2_observed, r2_null, p_value):
      r2_observed : scalar — the real model's mean R²
      r2_null     : (num_permutations,) null distribution
      p_value     : (1 + #{null ≥ observed}) / (num_permutations + 1)

    A p-value near 1/(n+1) with a null distribution well below the
    observed R² indicates the Y-correlation is real, not chance capacity
    of a wide X (the classic overfitting check for K >> N designs).
    """
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    N = X.shape[0]
    if batch_size is None:
        batch_size = min(num_permutations, 32)

    def mean_r2(Xm, Ym):
        f = fit(Xm, Ym, A, method, precision=precision)
        return jnp.mean(explained_variance(f, Xm, Ym, comp))

    r2_obs = mean_r2(X, Y)

    keys = jax.random.split(key, num_permutations)

    def perm(k):
        Yp = Y[jax.random.permutation(k, N)]
        return mean_r2(X, Yp)

    r2_null = padded_map(perm, keys, batch_size)
    p = (1.0 + jnp.sum(r2_null >= r2_obs)) / (num_permutations + 1.0)
    return r2_obs, r2_null, p

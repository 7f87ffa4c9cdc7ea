"""Bootstrap resampling: coefficient confidence intervals.

Not in the reference; required by the north star (BASELINE.json:
"coefficient intervals via the bootstrap machinery").  Reuses the
masked-fit machinery of cv/: a bootstrap replicate is a fit with integer
row *weights* (how many times each row was drawn).  The kernel algorithms
consume X only through weighted reductions, so integer-weighted fits are
arithmetically identical to fitting the resampled matrix — and replicates
become a vmap axis, shardable over the 'folds' mesh axis.

Weighting note: for a count vector c, the resampled cross-products are
XᵀCY and XᵀCX with C = diag(c).  We apply sqrt-counts to X and Y rows
(so Xw = √C X gives XwᵀXw = XᵀCX and XwᵀYw = XᵀCY); for kernel type 1
the per-component t is only ever consumed through XᵀCt and tᵀCt, which
the √C-scaled rows reproduce exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pls_tpu.models.kernel_pls import fit
from pls_tpu.models.predict import coefficients
from pls_tpu.types import METHOD
from pls_tpu.utils.batching import padded_map


def bootstrap_coefficients(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    A: int,
    num_replicates: int,
    key: jax.Array,
    method: METHOD = METHOD.KERNEL_TYPE1,
    *,
    batch_size: int | None = None,
    precision: str | None = "highest",
) -> jnp.ndarray:
    """(num_replicates, K, M) bootstrap distribution of B."""
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    N = X.shape[0]
    if batch_size is None:
        batch_size = min(num_replicates, 32)

    keys = jax.random.split(key, num_replicates)

    def rep(k):
        idx = jax.random.randint(k, (N,), 0, N)
        counts = jnp.zeros((N,), X.dtype).at[idx].add(1.0)
        w = jnp.sqrt(counts)
        f = fit(X * w[:, None], Y * w[:, None], A, method, precision=precision)
        return coefficients(f)

    return padded_map(rep, keys, batch_size)


def bootstrap_coefficient_intervals(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    A: int,
    num_replicates: int,
    key: jax.Array,
    method: METHOD = METHOD.KERNEL_TYPE1,
    *,
    alpha: float = 0.05,
    batch_size: int | None = None,
    precision: str | None = "highest",
):
    """Percentile CIs for the regression coefficients.

    Returns (lower, upper, Bs): (K, M) bounds at the alpha/2 and
    1-alpha/2 percentiles, plus the raw (num_replicates, K, M) draws.
    """
    Bs = bootstrap_coefficients(
        X, Y, A, num_replicates, key, method,
        batch_size=batch_size, precision=precision,
    )
    lower = jnp.quantile(Bs, alpha / 2, axis=0)
    upper = jnp.quantile(Bs, 1 - alpha / 2, axis=0)
    return lower, upper, Bs

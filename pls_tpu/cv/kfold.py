"""K-fold and leave-group-out cross-validation.

Not in the reference (tjhladish/PLS ships LOO / Monte-Carlo LSO / new-data
only — /root/reference/src/pls.cpp:469-549); standard CV flavors any
framework user expects.  Built on the same masked-fit machinery as
cv/loo.py: a fold is a {0,1} row mask, every use of X/Y in the kernel
algorithms is a masked reduction, so folds are a pure batch axis
(vmap/lax.map), chunkable and shardable over a mesh 'folds' axis.

- `cv_kfold`:   random (or caller-assigned) partition into k folds; each
  row is held out exactly once, so the error tensor has the same
  (M, N, A) layout as LOO and feeds the whole validation stack
  (PRESS/MSE/RMSE, Wilcoxon optimal-component selection) unchanged.
  k = N reproduces LOO exactly.
- `cv_group`:   leave-group-out over caller-provided integer group labels
  (e.g. batches, patients, instrument runs) — each distinct group is a
  fold.  Same (M, N, A) layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pls_tpu.models.kernel_pls import fit
from pls_tpu.models.predict import residuals_all_components
from pls_tpu.types import METHOD, Residual
from pls_tpu.utils.batching import padded_map


def kfold_assignments(
    n: int, k: int, key: jax.Array | int | None = None
) -> jnp.ndarray:
    """(N,) fold labels in [0, k): balanced sizes (|size_i − size_j| ≤ 1),
    shuffled with an explicit jax PRNG key (None = unshuffled blocks)."""
    base = jnp.arange(n) % k
    if key is None:
        return base
    if isinstance(key, int):
        key = jax.random.key(key)
    return jax.random.permutation(key, base)


def _cv_by_assignment(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    assign: jnp.ndarray,
    fold_ids: jnp.ndarray,
    A: int,
    method: METHOD,
    label: str,
    *,
    batch_size: int | None,
    power_iters: int | None,
    precision: str | None,
) -> Residual:
    """Shared engine: one masked fit per fold id, residuals scattered back
    to each row's own fold. Returns Residual errors (M, N, A)."""
    N = X.shape[0]
    k = int(fold_ids.shape[0])
    if batch_size is None:
        batch_size = min(k, 32)

    def fold(fid):
        mask = (assign != fid).astype(X.dtype)
        f = fit(
            X, Y, A, method,
            row_mask=mask, power_iters=power_iters, precision=precision,
        )
        return residuals_all_components(f, X, Y)  # (N, A, M)

    errs = padded_map(fold, fold_ids, batch_size)  # (k, N, A, M)
    # row i's error comes from the fold that held it out
    pos = jnp.argmax(fold_ids[:, None] == assign[None, :], axis=0)  # (N,)
    own = jnp.take_along_axis(errs, pos[None, :, None, None], axis=0)[0]
    return Residual(errors=jnp.transpose(own, (2, 0, 1)), method=label)


def cv_kfold(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    A: int,
    k: int = 10,
    method: METHOD = METHOD.KERNEL_TYPE1,
    *,
    assignments: jnp.ndarray | None = None,
    key: jax.Array | int | None = 0,
    batch_size: int | None = None,
    power_iters: int | None = None,
    precision: str | None = "highest",
) -> Residual:
    """K-fold CV. Returns Residual with errors (M, N, A).

    assignments: optional (N,) fold labels in [0, k) (overrides key);
    key: jax PRNG key or int seed for the random balanced partition.
    """
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    N = X.shape[0]
    if not (2 <= k <= N):
        raise ValueError(f"k={k} must satisfy 2 <= k <= N={N}")
    if assignments is None:
        assignments = kfold_assignments(N, k, key)
    assignments = jnp.asarray(assignments)
    return _cv_by_assignment(
        X, Y, assignments, jnp.arange(k), A, method, f"{k}-FOLD",
        batch_size=batch_size, power_iters=power_iters, precision=precision,
    )


def cv_group(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    groups: jnp.ndarray,
    A: int,
    method: METHOD = METHOD.KERNEL_TYPE1,
    *,
    batch_size: int | None = None,
    power_iters: int | None = None,
    precision: str | None = "highest",
) -> Residual:
    """Leave-group-out CV: each distinct value in `groups` (N,) is one
    fold. Returns Residual with errors (M, N, A)."""
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    groups_np = np.asarray(groups)
    uniq = np.unique(groups_np)
    if len(uniq) < 2:
        raise ValueError("need at least 2 distinct groups")
    # relabel to dense [0, G) so fold ids are a static iota
    dense = jnp.asarray(np.searchsorted(uniq, groups_np))
    return _cv_by_assignment(
        X, Y, dense, jnp.arange(len(uniq)), A, method, "GROUP",
        batch_size=batch_size, power_iters=power_iters, precision=precision,
    )

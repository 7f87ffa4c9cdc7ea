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
    x_storage: str | None = None,
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
            x_storage=x_storage,
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
    x_storage: str | None = None,
) -> Residual:
    """K-fold CV. Returns Residual with errors (M, N, A).

    assignments: optional (N,) fold labels in [0, k) (overrides key);
    key: jax PRNG key or int seed for the random balanced partition;
    x_storage="bf16": narrow-X/f32-accumulation refits (fit() docs).
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
        x_storage=x_storage,
    )


def _fold_blocks(assign: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Equal-size fold index/mask matrices from (N,) fold labels.

    Returns (idx, mask), both (k, Nf_max): row f lists fold f's row
    indices padded with 0, mask flags the real entries.  Zero-padding is
    exact for the block downdate (the padded rows are zeroed before use).
    """
    counts = np.bincount(assign, minlength=k)
    nf = int(counts.max())
    idx = np.zeros((k, nf), dtype=np.int32)
    mask = np.zeros((k, nf), dtype=bool)
    for f in range(k):
        rows = np.flatnonzero(assign == f)
        idx[f, : len(rows)] = rows
        mask[f, : len(rows)] = True
    return idx, mask


def cv_kfold_downdate(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    A: int,
    k: int = 10,
    *,
    assignments: jnp.ndarray | None = None,
    key: jax.Array | int | None = 0,
    batch_size: int | None = None,
    power_iters: int | None = None,
    precision: str | None = "highest",
    x_storage: str | None = None,
) -> Residual:
    """K-fold CV via implicit BLOCK downdates of XᵀX / XᵀY — the scalable
    formulation (KERNEL_TYPE2 semantics, like cv_loo_downdate).

    XX = XᵀX and XY = XᵀY are computed once; fold f refits from
    (XX − XfᵀXf, XY − XfᵀYf) with the downdate applied implicitly inside
    the matvec (models/kernel_pls.fit_from_stats_blockdowndated), so no
    fold ever materializes a K×K matrix and the per-fold cost is
    O(K²·A + Nf·K·A) instead of the masked refit's O(N·K²).  Fold blocks
    are zero-padded to equal size (exact — zero rows contribute nothing
    to the downdate and have zero residuals) so folds batch via lax.map.

    x_storage="bf16": X streams bfloat16 through the global XᵀX/XᵀY pass,
    the fold-block downdates, and the residual matmuls, accumulating f32
    everywhere (the fit() narrow-X policy); statistics and model state
    stay f32.  Expected ~1e-3 relative component error (docs/PERF.md).

    Exactness vs brute-force masked refits: tests/test_cv.py.
    Returns Residual with errors (M, N, A) — same layout as cv_kfold.
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
    assign_np = np.asarray(assignments)
    idx_np, mask_np = _fold_blocks(assign_np, k)
    idx = jnp.asarray(idx_np)
    mask = jnp.asarray(mask_np)
    if batch_size is None:
        batch_size = min(k, 8)

    acc = X.dtype if X.dtype.itemsize >= 4 else jnp.float32
    Xs = X
    if x_storage is not None:
        if x_storage not in ("bf16", "bfloat16"):
            raise ValueError(f"unknown x_storage {x_storage!r} (use 'bf16')")
        Xs = X.astype(jnp.bfloat16)
    if Xs.dtype.itemsize < 4:
        XX = jax.lax.dot_general(
            Xs, Xs, (((0,), (0,)), ((), ())), preferred_element_type=acc
        )
        XY = jax.lax.dot_general(
            Xs, Y.astype(Xs.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=acc,
        )
    else:
        XX = X.T @ X
        XY = X.T @ Y

    from pls_tpu.models.kernel_pls import fit_from_stats_blockdowndated

    def fold(args):
        fi, fm = args
        m = fm.astype(acc)[:, None]
        Xf = Xs[fi] * m.astype(Xs.dtype)  # zero the padded rows (exact)
        Yf = (Y[fi] * m).astype(acc)
        f = fit_from_stats_blockdowndated(
            XX, XY, Xf, Yf, A, power_iters=power_iters, precision=precision
        )
        # held-out residuals at every truncation; padded rows yield 0
        return residuals_all_components(f, Xf.astype(acc), Yf) * m[:, None, :]

    errs = padded_map(fold, (idx, mask), batch_size)  # (k, Nf, A, M)
    A_, M = errs.shape[2], errs.shape[3]
    # each real row appears in exactly one fold: scatter-add back to rows
    # (padded entries are zeroed above, so their .at[0] adds are no-ops)
    own = jnp.zeros((N, A_, M), errs.dtype).at[idx.reshape(-1)].add(
        errs.reshape(-1, A_, M)
    )
    return Residual(errors=jnp.transpose(own, (2, 0, 1)), method=f"{k}-FOLD")


def cv_kfold_from_stats(
    XX: jnp.ndarray,
    XY: jnp.ndarray,
    folds,
    A: int,
    *,
    power_iters: int | None = None,
    precision: str | None = "highest",
) -> Residual:
    """K-fold CV directly from global statistics, fold blocks streamed —
    for designs too large to materialize (the 1M×10k north star).

    XX/XY come from one streaming pass (models/streaming.StatsAccumulator,
    possibly psum-merged across hosts); `folds` is an iterable of
    (Xf, Yf) held-out blocks (each must be contained in XX/XY), e.g.
    re-streamed from the binary ingest path (utils/binio.py) one fold at
    a time — at 1M×10k / k=10 a fold block is 4 GB, the only X-sized
    object on the device.  Fold blocks may be bfloat16 (f32 accumulation,
    see fit_from_stats_blockdowndated).

    Folds run sequentially (one jitted program, reused across folds of
    equal size).  Returns Residual errors (M, ΣNf, A) concatenated in
    iteration order — feed to cv/validation exactly like cv_kfold output.
    """
    from pls_tpu.models.kernel_pls import fit_from_stats_blockdowndated

    acc = XX.dtype
    outs = []
    for Xf, Yf in folds:
        Xf = jnp.asarray(Xf)
        Yf = jnp.asarray(Yf)
        if Yf.ndim == 1:
            Yf = Yf[:, None]
        f = fit_from_stats_blockdowndated(
            XX, XY, Xf, Yf.astype(acc), A,
            power_iters=power_iters, precision=precision,
        )
        res = residuals_all_components(f, Xf.astype(acc), Yf.astype(acc))
        # backpressure: finish this fold before pulling the next block —
        # a fold block is GBs at production scale, and async dispatch
        # would otherwise pin every block's buffers at once
        outs.append(jax.block_until_ready(res))  # (Nf, A, M)
    errs = jnp.concatenate(outs, axis=0)
    return Residual(errors=jnp.transpose(errs, (2, 0, 1)), method="K-FOLD")


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

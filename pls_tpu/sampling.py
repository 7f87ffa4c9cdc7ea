"""Calibration-set sampling: Kennard–Stone, SPXY, and duplex splits.

Not in the reference (which has no sample-selection tooling); these are
the standard chemometrics answers to "which samples go in the
calibration set" — deterministic, coverage-maximizing alternatives to
random splits, used before the fit/CV stack (docs/MIGRATION.md):

- `kennard_stone` (Kennard & Stone 1969, Technometrics 11:137): start
  from the farthest pair, then repeatedly add the candidate whose
  minimum distance to the already-selected set is largest (max-min).
- `spxy` (Galvão et al. 2005, Talanta 67:736): Kennard–Stone under the
  joint distance  d = dX/max(dX) + dY/max(dY), so the selection covers
  the response space too.
- `duplex` (Snee 1977, Technometrics 19:415): alternate max-min
  additions between the calibration and validation sets, giving two
  sets with matched coverage.

TPU-first formulation: the classic implementations keep an N×N distance
matrix and do Python argmax loops.  Here the selection state is ONE
N-vector `mind` (each sample's min squared distance to the selected
set), updated per pick with a single matvec  d(·, new) = ‖x‖² +
‖x_new‖² − 2·X x_new  inside a `lax.scan` — O(N·K) per step, O(N)
memory, no pairwise matrix.  The farthest-pair seed streams row blocks
of the Gram product (`lax.map`), again never materializing N×N.  All
jit-compiled with static selection counts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kennard_stone", "spxy", "duplex", "ks_train_test_split"]

_BLOCK = 256  # farthest-pair row-block size (memory: 2 × BLOCK × N floats)


@partial(jax.jit, static_argnames=())
def _farthest_pair(Z, exclude=None):
    """(i, j) maximizing squared distance, streaming row blocks; rows
    with `exclude` True never appear in the winning pair."""
    N = Z.shape[0]
    sq = jnp.sum(Z * Z, axis=1)
    bonus = (
        jnp.zeros(N)
        if exclude is None
        else jnp.where(exclude, -jnp.inf, 0.0)
    )
    pad = (-N) % _BLOCK
    idx = jnp.arange(N + pad) % N  # padding wraps onto real rows (harmless dups)

    def blk(rows):
        D = sq[rows][:, None] + sq[None, :] - 2.0 * (Z[rows] @ Z.T)
        D = D + bonus[None, :] + bonus[rows][:, None]
        j = jnp.argmax(D, axis=1)
        return jnp.take_along_axis(D, j[:, None], axis=1)[:, 0], j

    dmax, jmax = jax.lax.map(blk, idx.reshape(-1, _BLOCK))
    dmax, jmax = dmax.reshape(-1), jmax.reshape(-1)
    i = jnp.argmax(dmax)
    return idx[i], jmax[i]


@partial(jax.jit, static_argnames=("n_select",))
def _ks_core(Z, n_select: int, i0, j0):
    """Max-min selection from seed pair (i0, j0) over the rows of Z
    (pass pre-normalized/concatenated coordinates for joint metrics)."""
    sq = jnp.sum(Z * Z, axis=1)

    def dist_to(idx):
        return sq + sq[idx] - 2.0 * (Z @ Z[idx])

    sel0 = jnp.zeros(Z.shape[0], bool).at[i0].set(True).at[j0].set(True)
    mind0 = jnp.minimum(dist_to(i0), dist_to(j0))

    def step(carry, _):
        mind, sel = carry
        nxt = jnp.argmax(jnp.where(sel, -jnp.inf, mind))
        sel = sel.at[nxt].set(True)
        mind = jnp.minimum(mind, dist_to(nxt))
        return (mind, sel), nxt

    seed = jnp.stack([i0, j0])
    if n_select == 2:
        return seed
    _, picks = jax.lax.scan(step, (mind0, sel0), None, length=n_select - 2)
    return jnp.concatenate([seed, picks])


def kennard_stone(X, n_select: int) -> np.ndarray:
    """Kennard–Stone max-min selection.  Returns (n_select,) indices in
    pick order (the first two are the farthest pair)."""
    X = jnp.asarray(X)
    N = X.shape[0]
    if not (2 <= n_select <= N):
        raise ValueError(f"need 2 <= n_select <= N, got {n_select} / {N}")
    i0, j0 = _farthest_pair(X)
    return np.asarray(_ks_core(X, n_select, i0, j0))


@jax.jit
def _spxy_seed(Xn, Yn):
    """Farthest pair under the joint metric ‖·‖_X + ‖·‖_Y (inputs
    pre-normalized so each block's max pairwise distance is 1)."""
    N = Xn.shape[0]
    sqx = jnp.sum(Xn * Xn, axis=1)
    sqy = jnp.sum(Yn * Yn, axis=1)
    pad = (-N) % _BLOCK
    idx = jnp.arange(N + pad) % N

    def blk(rows):
        Dx = sqx[rows][:, None] + sqx[None, :] - 2.0 * (Xn[rows] @ Xn.T)
        Dy = sqy[rows][:, None] + sqy[None, :] - 2.0 * (Yn[rows] @ Yn.T)
        D = jnp.sqrt(jnp.maximum(Dx, 0)) + jnp.sqrt(jnp.maximum(Dy, 0))
        j = jnp.argmax(D, axis=1)
        return jnp.take_along_axis(D, j[:, None], axis=1)[:, 0], j

    dmax, jmax = jax.lax.map(blk, idx.reshape(-1, _BLOCK))
    dmax, jmax = dmax.reshape(-1), jmax.reshape(-1)
    i = jnp.argmax(dmax)
    return idx[i], jmax[i]


@partial(jax.jit, static_argnames=("n_select",))
def _spxy_core(Xn, Yn, n_select: int, i0, j0):
    sqx = jnp.sum(Xn * Xn, axis=1)
    sqy = jnp.sum(Yn * Yn, axis=1)

    def dist_to(idx):
        dx2 = sqx + sqx[idx] - 2.0 * (Xn @ Xn[idx])
        dy2 = sqy + sqy[idx] - 2.0 * (Yn @ Yn[idx])
        return jnp.sqrt(jnp.maximum(dx2, 0)) + jnp.sqrt(jnp.maximum(dy2, 0))

    sel0 = jnp.zeros(Xn.shape[0], bool).at[i0].set(True).at[j0].set(True)
    mind0 = jnp.minimum(dist_to(i0), dist_to(j0))

    def step(carry, _):
        mind, sel = carry
        nxt = jnp.argmax(jnp.where(sel, -jnp.inf, mind))
        sel = sel.at[nxt].set(True)
        mind = jnp.minimum(mind, dist_to(nxt))
        return (mind, sel), nxt

    seed = jnp.stack([i0, j0])
    if n_select == 2:
        return seed
    _, picks = jax.lax.scan(step, (mind0, sel0), None, length=n_select - 2)
    return jnp.concatenate([seed, picks])


def spxy(X, Y, n_select: int) -> np.ndarray:
    """SPXY selection (Galvão 2005): Kennard–Stone under the joint
    normalized EUCLIDEAN distance d = dX/max(dX) + dY/max(dY) (the
    paper's metric — distances, not squared distances, sum across the
    two blocks).  X and Y are each scaled so their max pairwise distance
    is 1, then max-min runs on the summed per-block distances.  Returns
    (n_select,) indices in pick order."""
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    N = X.shape[0]
    if Y.shape[0] != N:
        raise ValueError(f"X has {N} rows but Y has {Y.shape[0]}")
    if not (2 <= n_select <= N):
        raise ValueError(f"need 2 <= n_select <= N, got {n_select} / {N}")

    def _norm(Z):
        i, j = _farthest_pair(Z)
        dmax = jnp.sum((Z[i] - Z[j]) ** 2)
        return Z / jnp.sqrt(jnp.maximum(dmax, 1e-30))

    Xn, Yn = _norm(X), _norm(Y)
    i0, j0 = _spxy_seed(Xn, Yn)
    return np.asarray(_spxy_core(Xn, Yn, n_select, i0, j0))


@partial(jax.jit, static_argnames=("n_cal",))
def _duplex_core(X, n_cal: int, i0, j0, i1, j1):
    N = X.shape[0]
    sq = jnp.sum(X * X, axis=1)

    def dist_to(idx):
        return sq + sq[idx] - 2.0 * (X @ X[idx])

    assigned0 = (
        jnp.zeros(N, bool).at[i0].set(True).at[j0].set(True)
        .at[i1].set(True).at[j1].set(True)
    )
    mind_cal0 = jnp.minimum(dist_to(i0), dist_to(j0))
    mind_val0 = jnp.minimum(dist_to(i1), dist_to(j1))

    # static alternating schedule: cal/val while both still need points,
    # then whichever set has remaining capacity takes the leftovers
    n_more_cal, n_more_val = n_cal - 2, N - n_cal - 2
    sched = []
    while n_more_cal or n_more_val:
        if n_more_cal and (len(sched) % 2 == 0 or not n_more_val):
            sched.append(True)
            n_more_cal -= 1
        else:
            sched.append(False)
            n_more_val -= 1
    order = jnp.asarray(np.asarray(sched, bool))

    def step(carry, to_cal):
        mind_cal, mind_val, assigned = carry
        mind = jnp.where(to_cal, mind_cal, mind_val)
        nxt = jnp.argmax(jnp.where(assigned, -jnp.inf, mind))
        assigned = assigned.at[nxt].set(True)
        d = dist_to(nxt)
        mind_cal = jnp.where(to_cal, jnp.minimum(mind_cal, d), mind_cal)
        mind_val = jnp.where(to_cal, mind_val, jnp.minimum(mind_val, d))
        return (mind_cal, mind_val, assigned), nxt

    _, picks = jax.lax.scan(step, (mind_cal0, mind_val0, assigned0), order)
    return picks, order


def duplex(X, n_cal: int) -> tuple[np.ndarray, np.ndarray]:
    """Duplex split (Snee 1977): the farthest pair seeds the calibration
    set, the farthest remaining pair seeds the validation set, then
    max-min additions alternate between the sets (calibration first;
    once one set is full the other takes the leftovers).  Returns
    (cal_idx (n_cal,), val_idx (N − n_cal,))."""
    X = jnp.asarray(X)
    N = X.shape[0]
    if not (2 <= n_cal <= N - 2):
        raise ValueError(f"need 2 <= n_cal <= N-2, got {n_cal} / N={N}")
    i0, j0 = _farthest_pair(X)
    excl = jnp.zeros(N, bool).at[i0].set(True).at[j0].set(True)
    i1, j1 = _farthest_pair(X, exclude=excl)
    picks, was_cal = _duplex_core(X, n_cal, i0, j0, i1, j1)
    picks, was_cal = np.asarray(picks), np.asarray(was_cal)
    cal = np.concatenate([[int(i0), int(j0)], picks[was_cal]])
    val = np.concatenate([[int(i1), int(j1)], picks[~was_cal]])
    return cal, val


def ks_train_test_split(
    X, Y=None, *, train_size: int, method: str = "kennard-stone"
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic coverage-based train/test split.  method:
    "kennard-stone" (X only), "spxy" (needs Y), or "duplex".
    Returns (train_idx, test_idx); test is the complement in original
    order for KS/SPXY, the duplex validation set for "duplex"."""
    N = np.asarray(X).shape[0]
    if method == "kennard-stone":
        train = kennard_stone(X, train_size)
    elif method == "spxy":
        if Y is None:
            raise ValueError("spxy needs Y")
        train = spxy(X, Y, train_size)
    elif method == "duplex":
        return duplex(X, train_size)
    else:
        raise ValueError(f"unknown method {method!r}")
    test = np.setdiff1d(np.arange(N), train)
    return train, test

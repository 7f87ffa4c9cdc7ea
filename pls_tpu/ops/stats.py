"""Column statistics: total sum of squares, stdev, z-scores.

Reference analogues: `PLS::SST`, `PLS::colwise_stdev`, `PLS::z_scores`,
`PLS::colwise_z_scores` — /root/reference/src/pls.cpp:69-111.

Known reference bug fixed here (documented in SURVEY.md §2 #5): the
reference's `colwise_z_scores(mat, mean, stdev)` builds a zero-guarded
`local_sd` but then divides by the *unguarded* `stdev`
(/root/reference/src/pls.cpp:100-103), so constant columns produce
NaN/inf despite the comment saying they should yield 0.  Our
implementation applies the guard as intended: a zero-stdev column
z-scores to exactly 0.
"""

from __future__ import annotations

import jax.numpy as jnp


def sst(mat: jnp.ndarray, means: jnp.ndarray | None = None) -> jnp.ndarray:
    """Total sum of squares per column: sum((x - mean)^2).

    Mirrors `PLS::SST` (/root/reference/src/pls.cpp:69-77) including its
    N < 2 => zeros convention.
    """
    mat = jnp.asarray(mat)
    if mat.ndim == 1:
        mat = mat[:, None]
    if means is None:
        means = jnp.mean(mat, axis=0)
    means = jnp.atleast_1d(jnp.asarray(means))
    if mat.shape[0] < 2:
        return jnp.zeros((mat.shape[1],), dtype=mat.dtype)
    return jnp.sum((mat - means[None, :]) ** 2, axis=0)


def colwise_stdev(mat: jnp.ndarray, means: jnp.ndarray | None = None) -> jnp.ndarray:
    """Unbiased (N-1) sample standard deviation per column
    (/root/reference/src/pls.cpp:79-87)."""
    mat = jnp.asarray(mat)
    n = mat.shape[0]
    return jnp.sqrt(sst(mat, means) / (n - 1))


def z_scores(obs: jnp.ndarray, mean: jnp.ndarray, stdev: jnp.ndarray) -> jnp.ndarray:
    """Z-score a single observation row (/root/reference/src/pls.cpp:89-91),
    with the zero-stdev guard applied (see module docstring)."""
    safe_sd = jnp.where(stdev == 0, jnp.ones_like(stdev), stdev)
    return (obs - mean) / safe_sd


def colwise_z_scores(
    mat: jnp.ndarray,
    mean: jnp.ndarray | None = None,
    stdev: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Z-score a matrix by column (/root/reference/src/pls.cpp:93-111).

    Constant (zero-stdev) columns map to exactly 0 — this is the *intended*
    behavior of the reference (its guard is dead code; see module docstring).
    1-D input is treated as a single column (returned 2-D).
    """
    mat = jnp.asarray(mat)
    if mat.ndim == 1:
        mat = mat[:, None]
    if mean is None:
        mean = jnp.mean(mat, axis=0)
    mean = jnp.atleast_1d(jnp.asarray(mean))
    if stdev is None:
        stdev = colwise_stdev(mat, mean)
    stdev = jnp.atleast_1d(jnp.asarray(stdev))
    safe_sd = jnp.where(stdev == 0, jnp.ones_like(stdev), stdev)
    return (mat - mean[None, :]) / safe_sd[None, :]

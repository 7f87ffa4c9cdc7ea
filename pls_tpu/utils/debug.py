"""Numerical-debug utilities.

The reference has no sanitizers (single-threaded Eigen; SURVEY.md §5
"race detection" row).  In a pure-functional JAX framework the analogous
tooling is NaN/Inf detection:

- `debug_nans()`: context manager enabling `jax_debug_nans` (XLA raises at
  the op producing the first NaN) — the CI-grade sanitizer.
- `assert_finite(tree, name)`: eager check on any pytree (fit states,
  residuals) raising with the offending leaf's path.
- `fit_health(fit)`: quick diagnostics on a PLSFit — per-component score
  norms tᵀt (deflation collapse shows as ~0 late components), Gram-Schmidt
  orthogonality defect, and finiteness.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from pls_tpu.types import PLSFit


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}"
                )


def fit_health(fit: PLSFit) -> dict:
    """Diagnostics dict for a fitted model; all values are host scalars."""
    out: dict = {"finite": True}
    try:
        assert_finite(fit, "fit")
    except FloatingPointError:
        out["finite"] = False
    if fit.T.size:
        tt = jnp.sum(fit.T * fit.T, axis=0)
        out["score_norms"] = [float(v) for v in tt]
        G = fit.T.T @ fit.T
        off = G - jnp.diag(jnp.diag(G))
        denom = float(jnp.max(jnp.diag(G)))
        out["score_orthogonality_defect"] = (
            float(jnp.max(jnp.abs(off))) / denom if denom > 0 else 0.0
        )
    # PᵀW should be upper-triangular with unit diagonal for kernel/NIPALS
    PtW = fit.P.T @ fit.W
    out["ptw_diag_deviation"] = float(
        jnp.max(jnp.abs(jnp.diagonal(PtW) - 1.0))
    )
    return out

"""Calibration transfer: Direct Standardization (DS) and Piecewise
Direct Standardization (PDS) — Wang, Veltkamp & Kowalski (1991), Anal.
Chem. 63:2750.

Not in the reference; the standard answer to "my PLS model was calibrated
on instrument A, how do I use spectra from instrument B?".  Both methods
learn a linear map F from a small set of *transfer samples* measured on
both instruments, such that  X_slave · F ≈ X_master ; slave spectra are
then mapped into master space and fed to the existing master-calibrated
model.

- **DS**: one global (K, K) map via ridge-regularized least squares.
  Needs n_transfer ≳ rank; heavily regularized otherwise.
- **PDS**: each master channel j is predicted from a small slave window
  [j−w, j+w] with its own local PLS model — the de-facto standard since
  local windows track wavelength shifts without a K×K estimation burden.

TPU-native formulation of PDS: the K window regressions are *one*
vmapped batch of tiny PLS fits (the masked-fit machinery makes every
window a fixed-shape (n, 2w+1) problem; edge windows are zero-padded
columns, which the kernel treats exactly as absent — see
models/kernel_pls.py).  A classical implementation is a Python loop of K
NIPALS fits; here it is a single device program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pls_tpu.models.kernel_pls import fit
from pls_tpu.models.predict import coefficients

__all__ = [
    "TransferModel",
    "direct_standardization",
    "piecewise_ds",
    "apply_transfer",
]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TransferModel:
    """Slave→master spectral map:
        X_master ≈ (X_slave − offset) · F + intercept

    F         : (K, K) transform (banded for PDS)
    offset    : (K,) slave-side centering (transfer-set slave mean)
    intercept : (K,) master-side mean added back after the map
    """

    F: jax.Array
    offset: jax.Array
    intercept: jax.Array

    def __call__(self, X_slave) -> jnp.ndarray:
        return apply_transfer(self, X_slave)


def apply_transfer(model: TransferModel, X_slave) -> jnp.ndarray:
    """Map slave-instrument spectra into master space."""
    X_slave = jnp.atleast_2d(jnp.asarray(X_slave))
    return (X_slave - model.offset[None, :]) @ model.F + model.intercept[None, :]


@partial(jax.jit, static_argnames=("ridge",))
def _ds_fit(Sm, Ss, ridge: float):
    mu_s = jnp.mean(Ss, axis=0)
    mu_m = jnp.mean(Sm, axis=0)
    Ssc = Ss - mu_s[None, :]
    Smc = Sm - mu_m[None, :]
    K = Ss.shape[1]
    G = Ssc.T @ Ssc + ridge * jnp.eye(K, dtype=Ss.dtype)
    F = jnp.linalg.solve(G, Ssc.T @ Smc)
    # fold the master mean back in as part of the map: x·F + (mu_m − 0)
    # we keep offset on the slave side and add mu_m via F's affine trick:
    # (x − mu_s)·F + mu_m  ≡  (x − (mu_s − F⁻ᵀ…)) — simpler: stash mu_m
    return F, mu_s, mu_m


def direct_standardization(
    S_master, S_slave, ridge: float = 1e-6
) -> TransferModel:
    """Global DS map from paired transfer spectra (n_transfer, K) measured
    on both instruments.  Ridge-regularized: with few transfer samples the
    problem is underdetermined and the regularizer picks the minimum-norm
    map."""
    Sm = jnp.atleast_2d(jnp.asarray(S_master))
    Ss = jnp.atleast_2d(jnp.asarray(S_slave))
    if Sm.shape != Ss.shape:
        raise ValueError(
            f"master {Sm.shape} and slave {Ss.shape} transfer sets must "
            "be paired (same shape)"
        )
    F, mu_s, mu_m = _ds_fit(Sm, Ss, float(ridge))
    return TransferModel(F=F, offset=mu_s, intercept=mu_m)


def piecewise_ds(
    S_master,
    S_slave,
    window: int = 5,
    A: int = 2,
    *,
    precision: str | None = "highest",
) -> TransferModel:
    """PDS: banded slave→master map; master channel j is regressed on the
    slave window [j−window, j+window] with a local `A`-component PLS
    model.  All K local fits run as ONE vmapped device program.

    window: half-width (band = 2·window+1 channels).
    A: local PLS components (must be ≤ 2·window+1)."""
    Sm = jnp.atleast_2d(jnp.asarray(S_master))
    Ss = jnp.atleast_2d(jnp.asarray(S_slave))
    if Sm.shape != Ss.shape:
        raise ValueError(
            f"master {Sm.shape} and slave {Ss.shape} transfer sets must "
            "be paired (same shape)"
        )
    K = Ss.shape[1]
    w = int(window)
    width = 2 * w + 1
    if not (1 <= A <= width):
        raise ValueError(f"A={A} must be in [1, 2*window+1={width}]")

    mu_s = jnp.mean(Ss, axis=0)
    mu_m = jnp.mean(Sm, axis=0)
    Ssc = Ss - mu_s[None, :]
    Smc = Sm - mu_m[None, :]

    # gather windows: cols[j] = channels j−w..j+w, out-of-range → column 0
    # with a zero VALIDITY mask (exact-zero columns are exactly "absent"
    # in the kernel fit)
    idx = np.arange(K)[:, None] + np.arange(-w, w + 1)[None, :]  # (K, width)
    valid = (idx >= 0) & (idx < K)
    idx_c = np.clip(idx, 0, K - 1)
    Xwin = Ssc[:, idx_c] * jnp.asarray(valid, Ssc.dtype)[None, :, :]
    # (n, K, width) → vmap over channel axis
    Xb = jnp.moveaxis(Xwin, 1, 0)  # (K, n, width)
    Yb = Smc.T[:, :, None]  # (K, n, 1)

    def local_fit(Xj, yj):
        f = fit(Xj, yj, A, precision=precision)
        return coefficients(f)[:, 0]  # (width,)

    B = jax.vmap(local_fit)(Xb, Yb)  # (K, width) local coefficient rows

    # scatter the bands into the (K, K) transform: F[idx[j, k], j] = B[j, k]
    F = jnp.zeros((K, K), Ss.dtype)
    rows = jnp.asarray(idx_c.reshape(-1))
    cols = jnp.repeat(jnp.arange(K), width)
    vals = (B * jnp.asarray(valid, B.dtype)).reshape(-1)
    F = F.at[rows, cols].add(vals)
    return TransferModel(F=F, offset=mu_s, intercept=mu_m)

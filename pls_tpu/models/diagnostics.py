"""Model-space monitoring diagnostics: Hotelling T², SPE/Q residuals,
leverage, and packaged control limits.

Not in the reference (which stops at Y-space residuals/SSE —
/root/reference/src/pls.cpp:453-467); these are the standard chemometrics
statistics for deciding whether a *new* observation is inside the model's
calibration domain — the piece a production deployment needs before
trusting a prediction:

- **Hotelling T²** — squared Mahalanobis distance *inside* the latent
  plane, per sample: T²ᵢ = Σₐ tᵢₐ²/s²ₐ with s²ₐ the training-score
  variances.  Large T² = extreme but model-explainable sample.
  Control limit from the F distribution (Tracy–Widom form):
      T²_lim = A(N−1)(N+1) / (N(N−A)) · F₁₋α(A, N−A).
- **SPE (Q residual)** — squared distance *off* the latent plane:
  Qᵢ = ‖xᵢ − tᵢ Pᵀ‖².  Large Q = sample the model cannot represent
  (new phenomenon / sensor fault).  Control limit by Box's moment-matched
  g·χ²_h approximation (g = v/2m, h = 2m²/v from the training SPE's
  mean m and variance v — Nomikos & MacGregor 1995).
- **Leverage** — hᵢ = 1/N + tᵢ(TᵀT)⁻¹tᵢᵀ, the regression influence of a
  (training) sample; 3·(A+1)/N is the usual screening threshold.

All per-sample statistics are pure jnp and jit/vmap-friendly; only the
scalar control limits use scipy (host-side, once per fit).

`fit_monitor` packages the statistics + limits into a `MonitorModel`
pytree so a serving process can `check()` a batch of incoming samples in
one jitted call — this is the "is this prediction trustworthy" gate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from pls_tpu.models.predict import _check_comp
from pls_tpu.types import PLSFit
from pls_tpu.utils.checkpoint import register_checkpointable


def _train_scores(fit: PLSFit, X_train: jnp.ndarray | None, comp: int):
    if fit.T.size:
        return fit.T[:, :comp]
    if X_train is None:
        raise ValueError(
            "fit has no stored scores (type-2/from-stats); pass X_train"
        )
    return X_train @ fit.R[:, :comp]


def x_residuals(
    fit: PLSFit, X_new: jnp.ndarray, comp: int | None = None
) -> jnp.ndarray:
    """X-space reconstruction residuals E = Xn − (Xn R) Pᵀ, shape (n, K).

    The part of each sample the latent plane cannot represent.
    """
    comp = _check_comp(fit, comp)
    S = X_new @ fit.R[:, :comp]
    return X_new - S @ fit.P[:, :comp].T


def spe(fit: PLSFit, X_new: jnp.ndarray, comp: int | None = None) -> jnp.ndarray:
    """Squared prediction error (Q residual) per sample, shape (n,)."""
    E = x_residuals(fit, X_new, comp)
    return jnp.sum(E * E, axis=-1)


def hotelling_t2(
    fit: PLSFit,
    X_new: jnp.ndarray,
    comp: int | None = None,
    X_train: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Hotelling T² per sample of X_new, shape (n,).

    Score variances come from the fit's stored training scores (type-1 /
    NIPALS); for fits without stored T pass the training X.
    """
    comp = _check_comp(fit, comp)
    T = _train_scores(fit, X_train, comp)
    n_train = T.shape[0]
    s2 = jnp.sum(T * T, axis=0) / (n_train - 1)  # (comp,) score variances
    S = X_new @ fit.R[:, :comp]
    return jnp.sum(S * S / s2[None, :], axis=-1)


def leverage(
    fit: PLSFit,
    X_new: jnp.ndarray | None = None,
    comp: int | None = None,
    X_train: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Regression leverage hᵢ = 1/N + tᵢ(TᵀT)⁻¹tᵢᵀ per sample, shape (n,).

    With X_new=None returns the training samples' own leverages (the
    influence diagnostic); T scores are orthogonal for type-1/NIPALS fits
    so (TᵀT)⁻¹ is diagonal, but the general solve keeps this correct for
    any fit.
    """
    comp = _check_comp(fit, comp)
    T = _train_scores(fit, X_train, comp)
    n_train = T.shape[0]
    G = T.T @ T  # (comp, comp)
    S = T if X_new is None else X_new @ fit.R[:, :comp]
    sol = jnp.linalg.solve(G, S.T).T  # (n, comp)
    return 1.0 / n_train + jnp.sum(S * sol, axis=-1)


def spe_contributions(
    fit: PLSFit, X_new: jnp.ndarray, comp: int | None = None
) -> jnp.ndarray:
    """Per-variable SPE contributions, (n, K): squared reconstruction
    residual of each variable.  Rows sum to `spe` exactly.  The standard
    fault-isolation plot: an out-of-control SPE sample's largest
    contributors point at the offending sensors/channels."""
    E = x_residuals(fit, X_new, comp)
    return E * E


def t2_contributions(
    fit: PLSFit,
    X_new: jnp.ndarray,
    comp: int | None = None,
    X_train: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-variable Hotelling-T² contributions, (n, K), via the standard
    complete-decomposition form (Westerhuis, Gurden & Smilde 2000,
    Chemom. Intell. Lab. Syst. 51:95):

        contrib(i, j) = x_{ij} · [R diag(1/s²) Rᵀ x_i]_j

    Rows sum to T² exactly; negative entries are possible (and
    meaningful: a variable can pull the score vector back toward the
    origin)."""
    comp = _check_comp(fit, comp)
    T = _train_scores(fit, X_train, comp)
    n_train = T.shape[0]
    s2 = jnp.sum(T * T, axis=0) / (n_train - 1)
    S = X_new @ fit.R[:, :comp]  # (n, comp)
    back = (S / s2[None, :]) @ fit.R[:, :comp].T  # (n, K)
    return X_new * back


def t2_limit(n_train: int, comp: int, alpha: float = 0.05) -> float:
    """F-based T² control limit at confidence 1−α (Tracy–Widom form)."""
    from scipy.stats import f as f_dist

    if n_train <= comp:
        raise ValueError(f"need n_train > comp, got {n_train} <= {comp}")
    fq = float(f_dist.ppf(1.0 - alpha, comp, n_train - comp))
    return comp * (n_train - 1) * (n_train + 1) / (n_train * (n_train - comp)) * fq


def spe_limit(spe_train, alpha: float = 0.05) -> float:
    """Box moment-matched g·χ²_h control limit from training SPE values."""
    import numpy as np
    from scipy.stats import chi2

    q = np.asarray(spe_train, dtype=float)
    m, v = q.mean(), q.var(ddof=1)
    if v <= 0 or m <= 0:  # degenerate (e.g. full-rank exact reconstruction)
        return float(m)
    g, h = v / (2.0 * m), 2.0 * m * m / v
    return float(g * chi2.ppf(1.0 - alpha, h))


@register_checkpointable
@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MonitorModel:
    """Serving-side admission gate: score projector + control limits.

    Built once from a fit + its training data (`fit_monitor`); `check`
    is a single jitted matmul-and-compare per incoming batch.
    """

    R: jax.Array        # (K, A) score projector
    P: jax.Array        # (K, A) loadings (for SPE reconstruction)
    s2: jax.Array       # (A,)   training score variances
    t2_lim: jax.Array   # ()     T² control limit
    spe_lim: jax.Array  # ()     SPE control limit
    alpha: float = field(metadata=dict(static=True), default=0.05)

    def check(self, X_new: jnp.ndarray) -> dict:
        """Per-sample statistics + in/out-of-control flags for a batch.

        Returns dict with t2, spe (n,) floats and t2_ok, spe_ok, ok (n,)
        bools; `ok` means the model's prediction for that sample is
        within its calibration domain at confidence 1−alpha.
        """
        S = X_new @ self.R
        t2 = jnp.sum(S * S / self.s2[None, :], axis=-1)
        E = X_new - S @ self.P.T
        q = jnp.sum(E * E, axis=-1)
        t2_ok = t2 <= self.t2_lim
        spe_ok = q <= self.spe_lim
        return {
            "t2": t2,
            "spe": q,
            "t2_ok": t2_ok,
            "spe_ok": spe_ok,
            "ok": jnp.logical_and(t2_ok, spe_ok),
        }

    def contributions(self, X_new: jnp.ndarray) -> dict:
        """Per-variable fault-isolation contributions for a batch:
        {'spe': (n, K), 't2': (n, K)} — rows sum to the corresponding
        check() statistics.  Call on the samples check() flagged to see
        WHICH channels broke."""
        S = X_new @ self.R
        E = X_new - S @ self.P.T
        return {
            "spe": E * E,
            "t2": X_new * ((S / self.s2[None, :]) @ self.R.T),
        }


def fit_monitor(
    fit: PLSFit,
    X_train: jnp.ndarray,
    comp: int | None = None,
    alpha: float = 0.05,
) -> MonitorModel:
    """Build a `MonitorModel` from a fit and its (preprocessed) training X."""
    comp = _check_comp(fit, comp)
    T = _train_scores(fit, X_train, comp)
    n_train = T.shape[0]
    s2 = jnp.sum(T * T, axis=0) / (n_train - 1)
    q_train = spe(fit, X_train, comp)
    return MonitorModel(
        R=fit.R[:, :comp],
        P=fit.P[:, :comp],
        s2=s2,
        t2_lim=jnp.asarray(t2_limit(n_train, comp, alpha), T.dtype),
        spe_lim=jnp.asarray(spe_limit(q_train, alpha), T.dtype),
        alpha=alpha,
    )

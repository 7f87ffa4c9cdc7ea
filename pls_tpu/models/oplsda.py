"""OPLS-DA: orthogonal-filtered discriminant analysis (Bylesjö et al. 2006,
J. Chemometrics 20:341-351) plus the S-plot biomarker diagnostic
(Wiklund et al. 2008, Anal. Chem. 80:115-122).

Capability extension beyond the reference (tjhladish/PLS is
regression-only); the composition rounds out the discriminant toolkit:
OPLS-DA = the OPLS orthogonal filter (models/opls.py) applied to X with
the centered class-indicator matrix as Y, followed by PLS-DA
(models/plsda.py) on the filtered X.  Separating class-orthogonal
variation into its own components is what makes OPLS-DA the standard
model in metabolomics: the single predictive component's loading/score
pair carries all between-class variation, which the S-plot turns into a
covariance-vs-correlation ranking of candidate biomarker variables.

Everything reuses the regression machinery (jitted scan fits, vmapped CV,
row sharding) — the filter and fit are the same streaming X patterns as
the kernel-PLS hot loop (/root/reference/src/pls.cpp:418-421 analogue).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pls_tpu.models.opls import OPLSFit, correct, fit_opls
from pls_tpu.models.plsda import one_hot
from pls_tpu.models.predict import coefficients
from pls_tpu.preprocess import ZScorer
from pls_tpu.types import KERNEL_TYPE1, METHOD


def fit_oplsda(
    X: jnp.ndarray,
    labels: jnp.ndarray,
    n_classes: int,
    n_ortho: int,
    A: int = 1,
    method: METHOD = KERNEL_TYPE1,
    **kw,
) -> OPLSFit:
    """Fit OPLS on the centered one-hot indicator matrix.

    X must be centered/z-scored by the caller (the reference CLI's
    convention, /root/reference/src/main.cpp:24-25).  For two classes the
    canonical choice is A=1 (all discriminative variation in one
    predictive component); multi-class typically uses A=n_classes-1.
    """
    Y = one_hot(labels, n_classes, jnp.asarray(X).dtype)
    Y = Y - jnp.mean(Y, axis=0, keepdims=True)
    return fit_opls(X, Y, n_ortho, A, method, **kw)


def decision_values(
    ofit: OPLSFit, Xn: jnp.ndarray, comp: int | None = None
) -> jnp.ndarray:
    """Predicted (centered) indicator scores after the orthogonal filter."""
    Xf, _ = correct(ofit, Xn)
    return Xf @ coefficients(ofit.pls, comp)


def predict_classes(
    ofit: OPLSFit, Xn: jnp.ndarray, priors: jnp.ndarray | None = None,
    comp: int | None = None,
) -> jnp.ndarray:
    d = decision_values(ofit, Xn, comp)
    if priors is not None:
        d = d + jnp.asarray(priors)[None, :]
    return jnp.argmax(d, axis=1)


def predict_proba(
    ofit: OPLSFit, Xn: jnp.ndarray, priors: jnp.ndarray | None = None,
    comp: int | None = None,
) -> jnp.ndarray:
    """Softmax calibration of decision values (a ranking convention, not a
    probability model — see models/plsda.predict_proba)."""
    d = decision_values(ofit, Xn, comp)
    if priors is not None:
        d = d + jnp.asarray(priors)[None, :]
    return jax.nn.softmax(d, axis=1)


@jax.jit
def s_plot(X: jnp.ndarray, t: jnp.ndarray):
    """S-plot coordinates (Wiklund 2008): for each X variable k,

        p(cov)[k]  = cov(t, x_k)        (model magnitude — loading scale)
        p(corr)[k] = corr(t, x_k)       (model reliability, in [-1, 1])

    against the predictive score vector t (for an OPLS-DA fit use the
    first predictive score: `correct(ofit, X)[0] @ ofit.pls.R[:, 0]`, or
    `OPLSDAClassifier.s_plot()` which wires this up).  Biomarker
    candidates sit in the S's corners: |cov| and |corr| both large.
    Returns (p_cov, p_corr), each (K,).

    X must be the (centered) training matrix the model was fit on; both
    statistics use N-1 denominators, which cancel in p(corr).
    """
    X = jnp.asarray(X)
    t = jnp.asarray(t)
    n = X.shape[0]
    tc = t - jnp.mean(t)
    Xc = X - jnp.mean(X, axis=0, keepdims=True)
    cov = (Xc.T @ tc) / (n - 1)
    sd_x = jnp.sqrt(jnp.sum(Xc * Xc, axis=0) / (n - 1))
    sd_t = jnp.sqrt(jnp.sum(tc * tc) / (n - 1))
    denom = jnp.where(sd_x > 0, sd_x * sd_t, 1.0)
    corr = jnp.where(sd_x > 0, cov / denom, 0.0)
    return cov, corr


class OPLSDAClassifier:
    """OPLS-DA with sklearn-protocol ergonomics (cf. plsda.PLSDAClassifier).

    Labels may be any hashable values, mapped to indicator columns in
    sorted order (`classes_`).  X is z-scored internally by default.
    `n_components` counts PREDICTIVE components (A); `n_ortho` counts
    orthogonal-filter components.
    """

    def __init__(
        self,
        n_components: int = 1,
        n_ortho: int = 1,
        method: METHOD = KERNEL_TYPE1,
        scale: bool = True,
        power_iters: int | None = None,
        precision: str | None = "highest",
    ):
        self.n_components = n_components
        self.n_ortho = n_ortho
        self.method = method
        self.scale = scale
        self.power_iters = power_iters
        self.precision = precision

    def get_params(self, deep: bool = True) -> dict:
        return {
            "n_components": self.n_components,
            "n_ortho": self.n_ortho,
            "method": self.method,
            "scale": self.scale,
            "power_iters": self.power_iters,
            "precision": self.precision,
        }

    def set_params(self, **params) -> "OPLSDAClassifier":
        valid = self.get_params()
        for k, v in params.items():
            # validate against the declared parameter set, not hasattr —
            # hasattr accepts method names, so set_params(fit=...) would
            # silently clobber a bound method
            if k not in valid:
                raise ValueError(f"unknown parameter {k}")
            setattr(self, k, v)
        return self

    def fit(self, X, y) -> "OPLSDAClassifier":
        X = jnp.asarray(X)
        y = np.asarray(y)
        self.classes_, idx = np.unique(y, return_inverse=True)
        n_classes = len(self.classes_)
        if n_classes < 2:
            raise ValueError("need at least 2 classes")
        if self.scale:
            self._x_scaler = ZScorer.fit(X)
            Xz = self._x_scaler.transform(X)
        else:
            self._x_scaler = None
            Xz = X
        self._priors = jnp.asarray(
            np.bincount(idx, minlength=n_classes) / len(idx), Xz.dtype
        )
        self._fit = fit_oplsda(
            Xz, jnp.asarray(idx), n_classes, self.n_ortho, self.n_components,
            self.method, power_iters=self.power_iters,
            precision=self.precision,
        )
        # S-plot statistics are two streaming matmuls over the filtered
        # training matrix — compute them NOW (2·(K,) vectors) instead of
        # pinning the full (N, K) training matrix for the classifier's
        # lifetime (at this framework's target scales that matrix can be
        # tens of GB)
        Xf, _ = correct(self._fit, Xz)
        t = Xf @ self._fit.pls.R[:, 0]
        self._s_plot = tuple(np.asarray(v) for v in s_plot(Xf, t))
        return self

    @property
    def r2x_ortho_(self) -> np.ndarray:
        """Fraction of X sum-of-squares removed per orthogonal component."""
        return np.asarray(self._fit.r2x_o)

    def _scaled(self, X) -> jnp.ndarray:
        X = jnp.asarray(X)
        if self._x_scaler is not None:
            X = self._x_scaler.transform(X)
        return X

    def _decision(self, X) -> jnp.ndarray:
        return (
            decision_values(self._fit, self._scaled(X))
            + self._priors[None, :]
        )

    def decision_function(self, X) -> np.ndarray:
        return np.asarray(self._decision(X))

    def predict(self, X) -> np.ndarray:
        return self.classes_[np.asarray(jnp.argmax(self._decision(X), axis=1))]

    def predict_proba(self, X) -> np.ndarray:
        return np.asarray(jax.nn.softmax(self._decision(X), axis=1))

    def score(self, X, y) -> float:
        """Mean accuracy."""
        return float(np.mean(self.predict(X) == np.asarray(y)))

    def transform(self, X) -> np.ndarray:
        """Predictive latent scores (N, n_components) of filtered X."""
        Xf, _ = correct(self._fit, self._scaled(X))
        return np.asarray(Xf @ self._fit.pls.R)

    def ortho_scores(self, X) -> np.ndarray:
        """Orthogonal scores (N, n_ortho) — DModX-style diagnostics."""
        _, T_o = correct(self._fit, self._scaled(X))
        return np.asarray(T_o)

    def s_plot(self) -> tuple[np.ndarray, np.ndarray]:
        """(p_cov, p_corr) of the first predictive component against the
        orthogonality-FILTERED training matrix (z-scored units when
        scale=True) — the matrix the predictive component actually
        models, so confounder variance on overlap variables does not
        dilute p(corr).  Precomputed at fit() time (two K-vectors) so
        the training matrix is not retained."""
        return self._s_plot

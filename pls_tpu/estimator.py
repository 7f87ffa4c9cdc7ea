"""Scikit-learn-style estimator facade.

Not part of the reference's surface; provided so the framework drops into
the fit/predict/score ecosystems users expect.  Duck-typed to sklearn's
estimator protocol (get_params/set_params/fit/predict/score) without
importing sklearn.  Standardization is handled internally (the reference
CLI's z-score-both convention) and inverted on predict, so the estimator
consumes and produces raw-unit data.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pls_tpu.models.kernel_pls import fit as _fit
from pls_tpu.models.predict import coefficients, vip
from pls_tpu.preprocess import ZScorer
from pls_tpu.types import KERNEL_TYPE1, METHOD


class PLSRegressor:
    """PLS regression with sklearn-protocol ergonomics.

    Parameters
    ----------
    n_components : number of latent components (default 2, sklearn-like).
    method : pls_tpu METHOD (kernel 1/2, NIPALS, SIMPLS).
    scale : z-score X and y internally (reference CLI convention).
    power_iters / precision : forwarded to the fitter.
    """

    def __init__(
        self,
        n_components: int = 2,
        method: METHOD = KERNEL_TYPE1,
        scale: bool = True,
        power_iters: int | None = None,
        precision: str | None = "highest",
    ):
        self.n_components = n_components
        self.method = method
        self.scale = scale
        self.power_iters = power_iters
        self.precision = precision

    # -- sklearn protocol ---------------------------------------------------
    def get_params(self, deep: bool = True) -> dict:
        return {
            "n_components": self.n_components,
            "method": self.method,
            "scale": self.scale,
            "power_iters": self.power_iters,
            "precision": self.precision,
        }

    def set_params(self, **params) -> "PLSRegressor":
        for k, v in params.items():
            if not hasattr(self, k):
                raise ValueError(f"unknown parameter {k}")
            setattr(self, k, v)
        return self

    def fit(self, X, y) -> "PLSRegressor":
        X = jnp.asarray(X)
        y = jnp.asarray(y)
        if y.ndim == 1:
            y = y[:, None]
        if self.scale:
            self._x_scaler = ZScorer.fit(X)
            self._y_scaler = ZScorer.fit(y)
            Xz = self._x_scaler.transform(X)
            yz = self._y_scaler.transform(y)
        else:
            self._x_scaler = self._y_scaler = None
            Xz, yz = X, y
        self._fit = _fit(
            Xz, yz, self.n_components, self.method,
            power_iters=self.power_iters, precision=self.precision,
        )
        self.coef_ = np.asarray(coefficients(self._fit))
        return self

    def predict(self, X) -> np.ndarray:
        X = jnp.asarray(X)
        if self._x_scaler is not None:
            X = self._x_scaler.transform(X)
        yz = X @ jnp.asarray(self.coef_)
        if self._y_scaler is not None:
            yz = self._y_scaler.inverse(yz)
        return np.asarray(yz)

    def score(self, X, y) -> float:
        """R² of prediction (uniform average over responses)."""
        y = np.asarray(y)
        if y.ndim == 1:
            y = y[:, None]
        pred = self.predict(X)
        ss_res = np.sum((y - pred) ** 2, axis=0)
        ss_tot = np.sum((y - y.mean(axis=0)) ** 2, axis=0)
        return float(np.mean(1.0 - ss_res / ss_tot))

    def transform(self, X) -> np.ndarray:
        """Project X into the latent score space (n, n_components)."""
        X = jnp.asarray(X)
        if self._x_scaler is not None:
            X = self._x_scaler.transform(X)
        return np.asarray(X @ self._fit.R)

    @property
    def vip_(self) -> np.ndarray:
        """Variable importance in projection (methods that store scores;
        for KERNEL_TYPE2 use pls_tpu.vip(fit, X) directly)."""
        return np.asarray(vip(self._fit))

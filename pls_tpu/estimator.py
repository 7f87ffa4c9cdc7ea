"""Scikit-learn-style estimator facades.

Not part of the reference's surface; provided so the framework drops into
the fit/predict/score ecosystems users expect.  Duck-typed to sklearn's
estimator protocol (get_params/set_params/fit/predict/score) without
importing sklearn.  Standardization is handled internally (the reference
CLI's z-score-both convention) and inverted on predict, so estimators
consume and produce raw-unit data.

Families: PLSRegressor (kernel 1/2, NIPALS, SIMPLS), SPLSRegressor
(sparse / variable-selecting), OPLSRegressor (orthogonal-filtered),
KPLSRegressor (nonlinear RKHS), plus PLSDAClassifier in models/plsda.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pls_tpu.models.kernel_pls import fit as _fit
from pls_tpu.models.predict import coefficients, vip
from pls_tpu.preprocess import ZScorer
from pls_tpu.types import KERNEL_TYPE1, METHOD


def _sklearn_tags(kind: str):
    """sklearn ≥1.6 tag object for `kind` ∈ {regressor, classifier,
    transformer} — delegates to sklearn's own mixins via a shim class so
    we track the tag protocol without inheriting BaseEstimator (no hard
    dependency).  Shared by every facade here and in spectral.py."""
    from sklearn.base import (
        BaseEstimator,
        ClassifierMixin,
        RegressorMixin,
        TransformerMixin,
    )

    mixin = {
        "regressor": RegressorMixin,
        "classifier": ClassifierMixin,
        "transformer": TransformerMixin,
    }[kind]

    class _Shim(mixin, BaseEstimator):
        pass

    return _Shim().__sklearn_tags__()


class _EstimatorBase:
    """Shared sklearn-protocol plumbing: parameter dict, internal
    z-scoring, and uniform-average R² scoring."""

    _params: tuple[str, ...] = ()

    def get_params(self, deep: bool = True) -> dict:
        return {k: getattr(self, k) for k in self._params}

    def set_params(self, **params):
        for k, v in params.items():
            if k not in self._params:
                raise ValueError(f"unknown parameter {k}")
            setattr(self, k, v)
        return self

    def __sklearn_tags__(self):
        return _sklearn_tags("regressor")

    def _scale_fit(self, X, y, sample_weight=None):
        X = jnp.asarray(X)
        y = jnp.asarray(y)
        if y.ndim == 1:
            y = y[:, None]
        if self.scale:
            # weighted moments keep "integer weights == repeating rows"
            # true through the internal z-scoring (the kernel fit assumes
            # centering consistent with the weights)
            self._x_scaler = ZScorer.fit(X, sample_weight)
            self._y_scaler = ZScorer.fit(y, sample_weight)
            return self._x_scaler.transform(X), self._y_scaler.transform(y)
        self._x_scaler = self._y_scaler = None
        return X, y

    def _scale_x(self, X):
        X = jnp.asarray(X)
        return self._x_scaler.transform(X) if self._x_scaler is not None else X

    def _unscale_y(self, yz):
        return self._y_scaler.inverse(yz) if self._y_scaler is not None else yz

    def _set_coef(self, coef_std) -> None:
        """Expose sklearn-compatible `coef_` and `intercept_`.

        `coef_std` is the (K, M) coefficient matrix in internal
        (scaled/centered) units.  Following sklearn's convention
        (`y = (X - x_mean) @ coef_.T + intercept_`), the public `coef_`
        is (n_targets, n_features) in raw units: each column rescaled by
        y_std and divided by x_std.  The internal-units matrix stays
        available as `_coef_std` for the scaled predict path.
        """
        self._coef_std = np.asarray(coef_std)
        K, M = self._coef_std.shape
        if self._x_scaler is not None:
            x_std = np.asarray(self._x_scaler.stdev).reshape(K)
            x_mean = np.asarray(self._x_scaler.mean).reshape(K)
        else:
            x_std, x_mean = np.ones(K), np.zeros(K)
        if self._y_scaler is not None:
            y_std = np.asarray(self._y_scaler.stdev).reshape(M)
            y_mean = np.asarray(self._y_scaler.mean).reshape(M)
        else:
            y_std, y_mean = np.ones(M), np.zeros(M)
        self.coef_ = (self._coef_std * y_std[None, :]).T / x_std[None, :]
        self.intercept_ = y_mean
        self._x_mean = x_mean

    def score(self, X, y) -> float:
        """R² of prediction (uniform average over responses)."""
        y = np.asarray(y)
        if y.ndim == 1:
            y = y[:, None]
        pred = np.asarray(self.predict(X)).reshape(y.shape)
        ss_res = np.sum((y - pred) ** 2, axis=0)
        ss_tot = np.sum((y - y.mean(axis=0)) ** 2, axis=0)
        return float(np.mean(1.0 - ss_res / ss_tot))


class PLSRegressor(_EstimatorBase):
    """PLS regression with sklearn-protocol ergonomics.

    Parameters
    ----------
    n_components : number of latent components (default 2, sklearn-like).
    method : pls_tpu METHOD (kernel 1/2, NIPALS, SIMPLS).
    scale : z-score X and y internally (reference CLI convention).
    power_iters / precision : forwarded to the fitter.
    x_storage : None (X's dtype) or "bf16" — stream X in bfloat16 with
        f32 accumulation, halving fit HBM traffic (~1e-3 component
        error; see models/kernel_pls.fit).

    After fit, `coef_` (n_targets, n_features) and `intercept_` follow
    sklearn's raw-unit convention: ``y = (X - X.mean(0)) @ coef_.T +
    intercept_`` (verified against sklearn.PLSRegression in
    tests/test_estimator.py).
    """

    _params = (
        "n_components", "method", "scale", "power_iters", "precision",
        "x_storage",
    )

    def __init__(
        self,
        n_components: int = 2,
        method: METHOD = KERNEL_TYPE1,
        scale: bool = True,
        power_iters: int | None = None,
        precision: str | None = "highest",
        x_storage: str | None = None,
    ):
        self.n_components = n_components
        self.method = method
        self.scale = scale
        self.power_iters = power_iters
        self.precision = precision
        self.x_storage = x_storage

    def fit(self, X, y, sample_weight=None) -> "PLSRegressor":
        """Fit; optional `sample_weight` (N,) weights rows in the
        cross-products (integer weights == repeating rows — see
        models/kernel_pls.fit)."""
        sw = None if sample_weight is None else jnp.asarray(sample_weight)
        Xz, yz = self._scale_fit(X, y, sw)
        self._fit = _fit(
            Xz, yz, self.n_components, self.method, sample_weight=sw,
            power_iters=self.power_iters, precision=self.precision,
            x_storage=self.x_storage,
        )
        self._set_coef(coefficients(self._fit))
        return self

    def predict(self, X) -> np.ndarray:
        yz = self._scale_x(X) @ jnp.asarray(self._coef_std)
        return np.asarray(self._unscale_y(yz))

    def transform(self, X) -> np.ndarray:
        """Project X into the latent score space (n, n_components)."""
        return np.asarray(self._scale_x(X) @ self._fit.R)

    @property
    def vip_(self) -> np.ndarray:
        """Variable importance in projection (methods that store scores;
        for KERNEL_TYPE2 use pls_tpu.vip(fit, X) directly)."""
        return np.asarray(vip(self._fit))

    def build_monitor(self, X, alpha: float = 0.05):
        """Build the T²/SPE admission gate (models/diagnostics.py) from
        training data X (raw units; scaled internally).  Returns the
        MonitorModel; afterwards `check(Xn)` flags new batches."""
        from pls_tpu.models.diagnostics import fit_monitor

        self._monitor = fit_monitor(self._fit, self._scale_x(X), alpha=alpha)
        return self._monitor

    def check(self, X) -> dict:
        """Per-sample T²/SPE statistics + in-control flags for raw-unit X
        (requires a prior `build_monitor` call)."""
        return self._monitor.check(self._scale_x(X))

    def export_c(self, path: str) -> None:
        """Export for native C++ consumers (native/pls_predict.hpp):
        raw-unit prediction operators + the T²/SPE gate if build_monitor
        was called.  See pls_tpu/export.py for the format."""
        from pls_tpu.export import export_model_c

        export_model_c(
            path,
            self._fit,
            x_scaler=self._x_scaler,
            y_scaler=self._y_scaler,
            monitor=getattr(self, "_monitor", None),
        )

    def predict_interval(
        self,
        X_train,
        y_train,
        X,
        *,
        alpha: float = 0.1,
        kind: str = "jackknife+",
        n_folds: int = 10,
    ):
        """Distribution-free prediction intervals (cv/conformal.py) in
        raw units.  kind: "jackknife+" (N masked fits), "cv+" (n_folds
        fits), or "split" (one fit).  Returns (lo, hi, pred), each
        (n, M) ndarrays."""
        from pls_tpu.cv import conformal as cf

        # reuse the scalers learned at fit() time (no state mutation)
        y_train = jnp.asarray(y_train)
        if y_train.ndim == 1:
            y_train = y_train[:, None]
        Xz = self._scale_x(X_train)
        yz = (
            self._y_scaler.transform(y_train)
            if self._y_scaler is not None
            else y_train
        )
        Xn = self._scale_x(X)
        kw = dict(alpha=alpha, method=self.method)
        if kind == "jackknife+":
            lo, hi, pred = cf.jackknife_plus_intervals(
                Xz, yz, Xn, self.n_components, **kw
            )
        elif kind == "cv+":
            lo, hi, pred = cf.cv_plus_intervals(
                Xz, yz, Xn, self.n_components, n_folds=n_folds, **kw
            )
        elif kind == "split":
            lo, hi, pred = cf.split_conformal_intervals(
                Xz, yz, Xn, self.n_components, **kw
            )
        else:
            raise ValueError(f"unknown kind {kind!r}")
        return tuple(
            np.asarray(self._unscale_y(v)) for v in (lo, hi, pred)
        )


class RobustPLSRegressor(_EstimatorBase):
    """Outlier-resistant PLS regression via IRPLS (models/robust.py).

    loss : "huber" (soft downweight) or "bisquare" (hard rejection);
    after fit, `sample_weight_` exposes the final IRLS weights (≈0 marks
    the samples the fit rejected) and coef_/intercept_ follow the same
    sklearn raw-unit convention as PLSRegressor.
    """

    _params = ("n_components", "method", "loss", "c", "n_irls", "scale")

    def __init__(
        self,
        n_components: int = 2,
        method: METHOD = KERNEL_TYPE1,
        loss: str = "huber",
        c: float | None = None,
        n_irls: int = 10,
        scale: bool = True,
    ):
        self.n_components = n_components
        self.method = method
        self.loss = loss
        self.c = c
        self.n_irls = n_irls
        self.scale = scale

    def fit(self, X, y) -> "RobustPLSRegressor":
        from pls_tpu.models.robust import fit_robust

        Xz, yz = self._scale_fit(X, y)
        self._fit, w = fit_robust(
            Xz, yz, self.n_components, self.method,
            loss=self.loss, c=self.c, n_irls=self.n_irls,
        )
        self.sample_weight_ = np.asarray(w)
        self._set_coef(coefficients(self._fit))
        return self

    def predict(self, X) -> np.ndarray:
        yz = self._scale_x(X) @ jnp.asarray(self._coef_std)
        return np.asarray(self._unscale_y(yz))

    def transform(self, X) -> np.ndarray:
        return np.asarray(self._scale_x(X) @ self._fit.R)


class SPLSRegressor(_EstimatorBase):
    """Sparse PLS regression (mixOmics keepX formulation, models/sparse.py).

    keep_x / keep_y : variables retained per component (int or per-component
    tuple); keep_x=None keeps all (dense NIPALS limit).
    After fit: `selected_` boolean support mask, `coef_`, `vip_`.
    """

    _params = ("n_components", "keep_x", "keep_y", "n_iter", "scale", "precision")

    def __init__(
        self,
        n_components: int = 2,
        keep_x: int | tuple[int, ...] | None = None,
        keep_y: int | tuple[int, ...] | None = None,
        n_iter: int = 20,
        scale: bool = True,
        precision: str | None = "highest",
    ):
        self.n_components = n_components
        self.keep_x = keep_x
        self.keep_y = keep_y
        self.n_iter = n_iter
        self.scale = scale
        self.precision = precision

    def fit(self, X, y) -> "SPLSRegressor":
        from pls_tpu.models.sparse import fit_spls, selected_variables

        Xz, yz = self._scale_fit(X, y)
        keep_x = Xz.shape[1] if self.keep_x is None else self.keep_x
        self._fit = fit_spls(
            Xz, yz, self.n_components, keep_x, self.keep_y,
            n_iter=self.n_iter, precision=self.precision,
        )
        self._set_coef(coefficients(self._fit))
        self.selected_ = np.asarray(selected_variables(self._fit))
        return self

    def predict(self, X) -> np.ndarray:
        yz = self._scale_x(X) @ jnp.asarray(self._coef_std)
        return np.asarray(self._unscale_y(yz))

    def transform(self, X) -> np.ndarray:
        return np.asarray(self._scale_x(X) @ self._fit.R)

    @property
    def vip_(self) -> np.ndarray:
        return np.asarray(vip(self._fit))


class OPLSRegressor(_EstimatorBase):
    """OPLS regression (models/opls.py): strips `n_ortho` Y-orthogonal
    components from X before an `n_components` predictive fit.

    After fit: `r2x_ortho_` (X-variance removed per orthogonal component);
    `transform_ortho(X)` returns the orthogonal scores of new data."""

    _params = ("n_ortho", "n_components", "method", "scale", "precision")

    def __init__(
        self,
        n_ortho: int = 1,
        n_components: int = 1,
        method: METHOD = KERNEL_TYPE1,
        scale: bool = True,
        precision: str | None = "highest",
    ):
        self.n_ortho = n_ortho
        self.n_components = n_components
        self.method = method
        self.scale = scale
        self.precision = precision

    def fit(self, X, y) -> "OPLSRegressor":
        from pls_tpu.models.opls import fit_opls

        Xz, yz = self._scale_fit(X, y)
        self._fit = fit_opls(
            Xz, yz, self.n_ortho, self.n_components, self.method,
            precision=self.precision,
        )
        self.r2x_ortho_ = np.asarray(self._fit.r2x_o)
        return self

    def predict(self, X) -> np.ndarray:
        from pls_tpu.models.opls import predict

        yz = predict(self._fit, self._scale_x(X))
        return np.asarray(self._unscale_y(yz))

    def transform_ortho(self, X) -> np.ndarray:
        """Orthogonal-component scores of new data (n, n_ortho)."""
        from pls_tpu.models.opls import correct

        _, T_o = correct(self._fit, self._scale_x(X))
        return np.asarray(T_o)


class KPLSRegressor(_EstimatorBase):
    """Nonlinear kernel PLS regression (models/kpls.py, Rosipal & Trejo).

    kernel : "rbf" | "poly" | "linear"; gamma defaults to 1/K.
    """

    _params = (
        "n_components", "kernel", "gamma", "degree", "coef0", "scale",
        "precision",
    )

    def __init__(
        self,
        n_components: int = 2,
        kernel: str = "rbf",
        gamma: float | None = None,
        degree: int = 3,
        coef0: float = 1.0,
        scale: bool = True,
        precision: str | None = "highest",
    ):
        self.n_components = n_components
        self.kernel = kernel
        self.gamma = gamma
        self.degree = degree
        self.coef0 = coef0
        self.scale = scale
        self.precision = precision

    def fit(self, X, y) -> "KPLSRegressor":
        from pls_tpu.models.kpls import fit_kpls

        Xz, yz = self._scale_fit(X, y)
        self._fit = fit_kpls(
            Xz, yz, self.n_components, self.kernel,
            gamma=self.gamma, degree=self.degree, coef0=self.coef0,
            precision=self.precision,
        )
        return self

    def predict(self, X) -> np.ndarray:
        from pls_tpu.models.kpls import predict_kpls

        yz = predict_kpls(self._fit, self._scale_x(X))
        return np.asarray(self._unscale_y(yz))


class _CrossDecompBase(_EstimatorBase):
    """Shared plumbing for the two-block cross-decomposition estimators.

    Always centers X and Y (the algebra requires it); `scale=True`
    additionally divides by the column stdevs, matching the convention of
    the regression estimators above.  `coef_`/`intercept_` follow
    sklearn's raw-unit (n_targets, n_features) convention (see
    `_EstimatorBase._set_coef`).
    """

    def _center_fit(self, X, y):
        X = jnp.asarray(X)
        y = jnp.asarray(y)
        if y.ndim == 1:
            y = y[:, None]
        if self.scale:
            self._x_scaler = ZScorer.fit(X)
            self._y_scaler = ZScorer.fit(y)
        else:
            self._x_scaler = ZScorer(
                mean=jnp.mean(X, axis=0), stdev=jnp.ones((X.shape[1],), X.dtype)
            )
            self._y_scaler = ZScorer(
                mean=jnp.mean(y, axis=0), stdev=jnp.ones((y.shape[1],), y.dtype)
            )
        return self._x_scaler.transform(X), self._y_scaler.transform(y)

    def _finalize(self):
        from pls_tpu.models.crossdecomp import cd_coefficients

        f = self._fit
        self.x_weights_ = np.asarray(f.W)
        self.y_weights_ = np.asarray(f.C)
        self.x_loadings_ = np.asarray(f.P)
        self.y_loadings_ = np.asarray(f.Q)
        self.x_scores_ = np.asarray(f.T)
        self.y_scores_ = np.asarray(f.U)
        self.x_rotations_ = np.asarray(f.R)
        self.y_rotations_ = np.asarray(f.Ry)
        self._set_coef(cd_coefficients(f))
        return self

    def transform(self, X, y=None):
        xs = np.asarray(self._scale_x(X) @ self._fit.R)
        if y is None:
            return xs
        y = jnp.asarray(y)
        if y.ndim == 1:
            y = y[:, None]
        ys = np.asarray(self._y_scaler.transform(y) @ self._fit.Ry)
        return xs, ys

    def predict(self, X) -> np.ndarray:
        yz = self._scale_x(X) @ jnp.asarray(self._coef_std)
        return np.asarray(self._unscale_y(yz))


class PLSCanonical(_CrossDecompBase):
    """Two-block mode-A PLS with canonical (symmetric) deflation
    (models/crossdecomp.py); the sklearn-PLSCanonical counterpart."""

    _params = ("n_components", "scale", "tol", "max_iter")

    def __init__(
        self,
        n_components: int = 2,
        scale: bool = True,
        tol: float = 1e-6,
        max_iter: int = 500,
    ):
        self.n_components = n_components
        self.scale = scale
        self.tol = tol
        self.max_iter = max_iter

    def fit(self, X, y) -> "PLSCanonical":
        from pls_tpu.models.crossdecomp import fit_plscanonical

        Xz, yz = self._center_fit(X, y)
        self._fit = fit_plscanonical(
            Xz, yz, self.n_components, tol=self.tol, max_iter=self.max_iter
        )
        return self._finalize()


class CCA(_CrossDecompBase):
    """Canonical correlation analysis via mode-B two-block power iteration
    (models/crossdecomp.py); the sklearn-CCA counterpart."""

    _params = ("n_components", "scale", "tol", "max_iter")

    def __init__(
        self,
        n_components: int = 2,
        scale: bool = True,
        tol: float = 1e-6,
        max_iter: int = 500,
    ):
        self.n_components = n_components
        self.scale = scale
        self.tol = tol
        self.max_iter = max_iter

    def fit(self, X, y) -> "CCA":
        from pls_tpu.models.crossdecomp import fit_cca

        Xz, yz = self._center_fit(X, y)
        self._fit = fit_cca(
            Xz, yz, self.n_components, tol=self.tol, max_iter=self.max_iter
        )
        return self._finalize()


class PLSSVD(_CrossDecompBase):
    """One-shot PLS-SVD (top singular triplets of XᵀY); transform-only —
    no regression path, so no predict()."""

    _params = ("n_components", "scale")

    def __init__(self, n_components: int = 2, scale: bool = True):
        self.n_components = n_components
        self.scale = scale

    def fit(self, X, y) -> "PLSSVD":
        from pls_tpu.models.crossdecomp import fit_plssvd

        Xz, yz = self._center_fit(X, y)
        self._fit = fit_plssvd(Xz, yz, self.n_components)
        return self._finalize()

    def predict(self, X):  # pragma: no cover - guard
        raise AttributeError("PLSSVD is transform-only (no regression path)")


class PLSGLMClassifier(_EstimatorBase):
    """Binary logistic PLS-GLM with sklearn classifier ergonomics
    (models/plsglm.py).  Labels may be any two values; X is z-scored
    internally.  `n_components=n_features` reproduces an unregularized
    logistic regression; fewer components give PLS shrinkage."""

    _params = ("n_components", "n_irls", "scale", "precision")

    def __init__(
        self,
        n_components: int = 2,
        n_irls: int = 25,
        scale: bool = True,
        precision: str | None = "highest",
    ):
        self.n_components = n_components
        self.n_irls = n_irls
        self.scale = scale
        self.precision = precision

    def fit(self, X, y) -> "PLSGLMClassifier":
        from pls_tpu.models.plsglm import fit_plsglm

        X = jnp.asarray(X)
        y = np.asarray(y).reshape(-1)
        self.classes_ = np.unique(y)
        if len(self.classes_) != 2:
            raise ValueError(
                f"binary classifier: got {len(self.classes_)} classes"
            )
        y01 = jnp.asarray((y == self.classes_[1]).astype(float))
        if self.scale:
            self._x_scaler = ZScorer.fit(X)
            Xz = self._x_scaler.transform(X)
        else:
            self._x_scaler = None
            Xz = X
        self._glm = fit_plsglm(
            Xz, y01, self.n_components, "binomial",
            n_irls=self.n_irls, precision=self.precision,
        )
        self.deviance_ = float(self._glm.deviance)
        # sklearn-convention raw-unit coefficients on the linear predictor
        if self._x_scaler is not None:
            sd = np.asarray(self._x_scaler.stdev)
            mu = np.asarray(self._x_scaler.mean)
            self.coef_ = (np.asarray(self._glm.coef) / sd)[None, :]
            self.intercept_ = np.asarray(
                float(self._glm.intercept) - (mu / sd) @ np.asarray(self._glm.coef)
            ).reshape(1)
        else:
            self.coef_ = np.asarray(self._glm.coef)[None, :]
            self.intercept_ = np.asarray(float(self._glm.intercept)).reshape(1)
        return self

    def predict_proba(self, X) -> np.ndarray:
        from pls_tpu.models.plsglm import predict_plsglm

        p1 = np.asarray(predict_plsglm(self._glm, self._scale_x(X)))
        return np.stack([1 - p1, p1], axis=1)

    def decision_function(self, X) -> np.ndarray:
        from pls_tpu.models.plsglm import predict_plsglm

        return np.asarray(
            predict_plsglm(self._glm, self._scale_x(X), linear=True)
        )

    def predict(self, X) -> np.ndarray:
        return self.classes_[
            (self.predict_proba(X)[:, 1] >= 0.5).astype(int)
        ]

    def score(self, X, y) -> float:
        """Classification accuracy (sklearn classifier convention)."""
        return float(np.mean(self.predict(X) == np.asarray(y).reshape(-1)))

    def __sklearn_tags__(self):
        return _sklearn_tags("classifier")

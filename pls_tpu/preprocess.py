"""Preprocessing: a stateful z-scorer for the train/apply split.

The reference CLI z-scores X and Y in place (main.cpp:24-25) and leaves
applying a fitted model to *raw* new data to the user.  `ZScorer`
packages the column means/stdevs (with the zero-stdev guard of
ops/stats.py) so new observations can be transformed into — and
predictions transformed back out of — the model's standardized space:

    zx, zy = ZScorer.fit(X_raw), ZScorer.fit(Y_raw)
    model  = PLSModel(zx.transform(X_raw), zy.transform(Y_raw), ...)
    y_hat  = zy.inverse(model.fitted_values(zx.transform(X_new)))
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pls_tpu.ops.stats import colwise_stdev


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ZScorer:
    mean: jax.Array
    stdev: jax.Array  # zero-guarded (constant columns carry stdev 1)

    @classmethod
    def fit(cls, mat, sample_weight=None) -> "ZScorer":
        """Column means/stdevs; with `sample_weight` (N,), frequency-
        weighted moments (denominator Σw − 1), so integer weights are
        exactly equivalent to z-scoring the row-repeated dataset."""
        mat = jnp.asarray(mat)
        if sample_weight is None:
            mean = jnp.mean(mat, axis=0)
            sd = colwise_stdev(mat, mean)
        else:
            w = jnp.asarray(sample_weight, mat.dtype).reshape(-1)
            sw = jnp.sum(w)
            mean = (w @ mat) / sw
            d = mat - mean[None, :]
            sd = jnp.sqrt((w @ (d * d)) / jnp.maximum(sw - 1.0, 1.0))
        return cls(mean=mean, stdev=jnp.where(sd == 0, jnp.ones_like(sd), sd))

    def transform(self, mat) -> jnp.ndarray:
        return (jnp.asarray(mat) - self.mean[None, :]) / self.stdev[None, :]

    def inverse(self, mat) -> jnp.ndarray:
        return jnp.asarray(mat) * self.stdev[None, :] + self.mean[None, :]

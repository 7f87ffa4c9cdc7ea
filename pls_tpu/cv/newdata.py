"""Hold-out / new-data validation.

Reference analogue: `Model::cv_NEW_DATA` (/root/reference/src/pls.cpp:493-510):
no refits — residuals of held-out (X, Y) under the already-fit model for
every component truncation 1..A.  One matmul + cumsum here
(models/predict.py: residuals_all_components).
"""

from __future__ import annotations

import jax.numpy as jnp

from pls_tpu.models.predict import residuals_all_components
from pls_tpu.types import PLSFit, Residual


def cv_new_data(fit: PLSFit, X_new: jnp.ndarray, Y_new: jnp.ndarray) -> Residual:
    X_new = jnp.asarray(X_new)
    Y_new = jnp.asarray(Y_new)
    if Y_new.ndim == 1:
        Y_new = Y_new[:, None]
    if X_new.shape[1] != fit.K or Y_new.shape[1] != fit.M:
        # mirrors the reference's column-compatibility assert (pls.cpp:497)
        raise ValueError(
            f"new data has {X_new.shape[1]} predictors / {Y_new.shape[1]} "
            f"responses; model expects {fit.K} / {fit.M}"
        )
    res = residuals_all_components(fit, X_new, Y_new)  # (n, A, M)
    return Residual(errors=jnp.transpose(res, (2, 0, 1)), method="NEW DATA")

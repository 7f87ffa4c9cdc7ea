"""Bootstrap coefficient-interval tests (cv/bootstrap.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import pls_tpu as pt
from pls_tpu.cv.bootstrap import (
    bootstrap_coefficient_intervals,
    bootstrap_coefficients,
)
from pls_tpu.models.kernel_pls import fit
from pls_tpu.models.predict import coefficients


def test_sqrt_count_weighting_equals_explicit_resample(toy):
    """A √count-weighted fit must equal fitting the explicitly resampled
    matrix (the algebra the bootstrap relies on)."""
    X, Y = toy
    X, Y = jnp.asarray(X), jnp.asarray(Y)
    N = X.shape[0]
    rng = np.random.default_rng(0)
    idx = rng.integers(0, N, size=N)
    counts = np.bincount(idx, minlength=N).astype(np.float64)
    w = jnp.asarray(np.sqrt(counts))
    f_w = fit(X * w[:, None], Y * w[:, None], 2)
    f_r = fit(X[jnp.asarray(np.sort(idx))], Y[jnp.asarray(np.sort(idx))], 2)
    np.testing.assert_allclose(
        np.asarray(coefficients(f_w)), np.asarray(coefficients(f_r)),
        atol=1e-10,
    )


def test_intervals_cover_point_estimate(nir):
    X, Y = nir
    X, Y = jnp.asarray(X), jnp.asarray(Y)
    lower, upper, Bs = bootstrap_coefficient_intervals(
        X, Y, 3, 32, jax.random.key(0)
    )
    assert Bs.shape == (32, 401, 1)
    B = np.asarray(coefficients(fit(X, Y, 3)))
    low, up = np.asarray(lower), np.asarray(upper)
    assert np.all(low <= up)
    # the full-sample estimate should lie inside the 95% band for the
    # overwhelming majority of coefficients
    frac_inside = np.mean((B >= low) & (B <= up))
    assert frac_inside > 0.9


def test_replicates_deterministic_per_key(toy):
    X, Y = toy
    a = bootstrap_coefficients(X, Y, 2, 8, jax.random.key(7))
    b = bootstrap_coefficients(X, Y, 2, 8, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Special functions.

`normalcdf` reproduces the reference's Abramowitz & Stegun 4-term rational
approximation bit-for-bit (/root/reference/src/pls.cpp:144-160) so that
Wilcoxon p-values — and therefore optimal-component selections — match the
reference exactly.  `normalcdf_exact` is the erf-based CDF for callers who
prefer accuracy over parity (the A&S approximation is only good to ~1e-5).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.stats as jstats


def normalcdf(z: jnp.ndarray) -> jnp.ndarray:
    """A&S 26.2.19 rational approximation of the standard normal CDF,
    identical formula to the reference (/root/reference/src/pls.cpp:152-160)."""
    z = jnp.asarray(z)
    c1, c2, c3, c4 = 0.196854, 0.115194, 0.000344, 0.019527
    zs = jnp.abs(z)
    p = 0.5 / (1 + c1 * zs + c2 * zs**2 + c3 * zs**3 + c4 * zs**4) ** 4
    return jnp.where(z < 0, p, 1.0 - p)


def normalcdf_exact(z: jnp.ndarray) -> jnp.ndarray:
    """Exact standard normal CDF (erf-based)."""
    return jstats.norm.cdf(jnp.asarray(z))

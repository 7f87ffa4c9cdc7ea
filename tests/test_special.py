"""normalcdf / wilcoxon parity tests (reference pls.cpp:144-211)."""

import jax.numpy as jnp
import numpy as np

from pls_tpu import normalcdf, wilcoxon
from pls_tpu.ops.special import normalcdf_exact


def test_normalcdf_matches_reference(golden):
    table = golden("normalcdf")  # z, p pairs
    z = table[:, 0]
    p = table[:, 1]
    np.testing.assert_allclose(
        np.asarray(normalcdf(jnp.asarray(z))), p, atol=1e-13
    )


def test_normalcdf_approx_vs_exact():
    z = jnp.linspace(-4, 4, 81)
    approx = np.asarray(normalcdf(z))
    exact = np.asarray(normalcdf_exact(z))
    # the A&S 4-term approximation is good to ~1e-4 absolute
    assert np.max(np.abs(approx - exact)) < 5e-4


def test_wilcoxon_parity(golden):
    """p-values between all pairs of LOO error columns must match the
    reference's wilcoxon() bit-for-bit-ish."""
    errs = golden("nir_loo_resid_y0")  # (60, 10)
    gold = golden("nir_wilcoxon")  # (10, 10)
    A = errs.shape[1]
    mine = np.array(
        [
            [
                float(wilcoxon(jnp.asarray(errs[:, i]), jnp.asarray(errs[:, j])))
                for j in range(A)
            ]
            for i in range(A)
        ]
    )
    np.testing.assert_allclose(mine, gold, atol=1e-12)


def test_wilcoxon_symmetric_null():
    # comparing a column against itself: d=0 => v=ev => z=0 => p = 1 - cdf(0)
    e = jnp.asarray(np.random.default_rng(3).normal(size=30))
    p = float(wilcoxon(e, e))
    assert abs(p - 0.5) < 1e-12

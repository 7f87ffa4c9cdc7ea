"""Jackknife coefficient uncertainty + Y-permutation validation tests.

Validation strategy: jackknife fold-coefficients must match brute-force
refits on the N−1 surviving rows (the masked-fit exactness argument);
significance calls must separate a strongly predictive design from pure
noise; the permutation null must sit far below the observed R² for real
signal and the p-value must behave like a p-value.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pls_tpu as pt
from pls_tpu.cv.inference import (
    coefficient_significance,
    jackknife_coefficients,
    permutation_test,
)


def _signal_data(n=40, k=12, m=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, k))
    B = np.zeros((k, m))
    B[0, :] = 2.0
    B[1, 0] = -1.5
    Y = X @ B + 0.1 * rng.normal(size=(n, m))
    Xz = np.asarray(pt.colwise_z_scores(X))
    Yz = np.asarray(pt.colwise_z_scores(Y))
    return jnp.asarray(Xz), jnp.asarray(Yz)


class TestJackknife:
    def test_folds_match_bruteforce(self, toy):
        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        N = X.shape[0]
        Bs = jackknife_coefficients(X, Y, 2)
        assert Bs.shape == (N, X.shape[1], Y.shape[1])
        for i in (0, N // 2, N - 1):
            keep = np.arange(N) != i
            f = pt.fit(X[keep], Y[keep], 2)
            np.testing.assert_allclose(
                np.asarray(Bs[i]), np.asarray(pt.coefficients(f)), atol=1e-9
            )

    def test_significance_separates_signal_from_noise(self):
        X, Y = _signal_data()
        B, se, t, p = coefficient_significance(X, Y, 3)
        p = np.asarray(p)
        # the two true predictors are significant for their responses...
        assert p[0, 0] < 0.01 and p[0, 1] < 0.01 and p[1, 0] < 0.01
        # ...and pure-noise predictors mostly are not
        assert np.median(p[2:]) > 0.05

    def test_shapes_and_finiteness(self, nir):
        X, Y = nir
        B, se, t, p = coefficient_significance(
            jnp.asarray(X), jnp.asarray(Y), 3
        )
        K, M = X.shape[1], Y.shape[1]
        assert B.shape == se.shape == t.shape == p.shape == (K, M)
        assert np.all(np.asarray(se) >= 0)
        assert np.all((np.asarray(p) >= 0) & (np.asarray(p) <= 1))


class TestPermutation:
    def test_real_signal_is_significant(self):
        X, Y = _signal_data()
        r2_obs, r2_null, p = permutation_test(
            X, Y, 3, 49, jax.random.key(0)
        )
        assert float(r2_obs) > 0.9
        assert float(np.max(np.asarray(r2_null))) < float(r2_obs)
        assert float(p) == 1.0 / 50.0  # no null ≥ observed

    def test_noise_is_not_significant(self):
        rng = np.random.default_rng(3)
        X = jnp.asarray(np.asarray(pt.colwise_z_scores(rng.normal(size=(30, 6)))))
        Y = jnp.asarray(np.asarray(pt.colwise_z_scores(rng.normal(size=(30, 1)))))
        _, r2_null, p = permutation_test(X, Y, 2, 49, jax.random.key(1))
        assert r2_null.shape == (49,)
        assert float(p) > 0.1  # chance-level R² is not distinguishable

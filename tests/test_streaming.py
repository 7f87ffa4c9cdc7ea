"""Streaming-stats fit tests (models/streaming.py)."""

import jax.numpy as jnp
import numpy as np

import pls_tpu as pt
from pls_tpu.models.streaming import (
    StatsAccumulator,
    collect_moments,
    fit_streaming,
)


def _chunks(X, Y, size):
    for i in range(0, X.shape[0], size):
        yield X[i : i + size], Y[i : i + size]


def test_streaming_equals_batch(nir):
    X, Y = nir
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    ref = pt.fit(Xj, Yj, 5, pt.KERNEL_TYPE2)
    acc = StatsAccumulator(401, 1, jnp.float64)
    for Xc, Yc in _chunks(Xj, Yj, 7):
        acc.update(Xc, Yc)
    f = acc.fit(5)
    np.testing.assert_allclose(
        np.asarray(pt.coefficients(f)), np.asarray(pt.coefficients(ref)),
        atol=1e-9,
    )
    assert int(acc.n) == 60


def test_merge_equals_single_pass(toy):
    X, Y = toy
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    a = StatsAccumulator(15, 2, jnp.float64).update(Xj[:4], Yj[:4])
    b = StatsAccumulator(15, 2, jnp.float64).update(Xj[4:], Yj[4:])
    a.merge(b)
    whole = StatsAccumulator(15, 2, jnp.float64).update(Xj, Yj)
    np.testing.assert_allclose(np.asarray(a.XX), np.asarray(whole.XX), atol=1e-10)
    np.testing.assert_allclose(np.asarray(a.XY), np.asarray(whole.XY), atol=1e-10)


def test_streaming_zscore_matches_reference_pipeline(golden):
    """Two-pass streaming z-score + fit == the CLI pipeline on raw CSVs."""
    Xraw = np.loadtxt("/root/reference/toyX.csv", delimiter=",")
    Yraw = np.loadtxt("/root/reference/toyY.csv", delimiter=",")
    K, M = 15, 2
    moments = collect_moments(_chunks(Xraw, Yraw, 3), K, M)
    f = fit_streaming(
        _chunks(Xraw, Yraw, 3), K, M, 2,
        zscore=True, moments=moments, dtype=jnp.float64,
    )
    np.testing.assert_allclose(
        np.asarray(pt.coefficients(f)), golden("toy_t2_B"), atol=1e-9
    )

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
    moments = collect_moments(_chunks(Xraw, Yraw, 3), K, M, dtype=jnp.float64)
    f = fit_streaming(
        _chunks(Xraw, Yraw, 3), K, M, 2,
        zscore=True, moments=moments, dtype=jnp.float64,
    )
    np.testing.assert_allclose(
        np.asarray(pt.coefficients(f)), golden("toy_t2_B"), atol=1e-9
    )


def test_moments_f32_large_mean_stability():
    """Chan-merged moments must survive f32 with mean >> std (the naive
    sumsq − n·mean² formula cancels to zero variance)."""
    rng = np.random.default_rng(0)
    X = (1e4 + rng.normal(size=(4000, 3))).astype(np.float32)
    Y = (5e3 + rng.normal(size=(4000, 1))).astype(np.float32)
    moments = collect_moments(_chunks(X, Y, 512), 3, 1, dtype=jnp.float32)
    mx, sdx, my, sdy, n = moments
    assert n == 4000
    np.testing.assert_allclose(np.asarray(mx), X.mean(0), rtol=1e-5)
    # the whole point: stdev ~1 recovered, not clamped to the zero-guard
    np.testing.assert_allclose(np.asarray(sdx), X.std(0, ddof=1), rtol=1e-2)
    assert np.all(np.asarray(sdx) > 0.5)

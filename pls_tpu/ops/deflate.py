"""Fused deflation-pass Pallas kernel for kernel-PLS type 1.

The reference's per-component hot loop (/root/reference/src/pls.cpp:418-421)
streams X twice:  t = X r  (pass 1),  p = Xᵀ t  (pass 2), plus tt = tᵀt.
For large X this is HBM-bandwidth-bound, and XLA will not fuse two
dependent matmuls — X is read from HBM twice per component.

This kernel computes t and p in ONE streaming pass: for each row tile
Xᵢ (TN × K) resident in VMEM,

    tᵢ = Σ_lanes Xᵢ ⊙ r      (VPU, exact f32)
    p += Σ_rows  Xᵢ ⊙ tᵢ     (VPU accumulator across the sequential grid)

halving HBM traffic (the roofline for the whole component update, since
r/p/t are O(N+K) ≪ O(N·K)).  TPU grids execute sequentially on a core, so
cross-step accumulators in scratch are the idiomatic reduction pattern.
tt = tᵀt is recovered OUTSIDE the kernel as r·p (= rᵀXᵀXr = tᵀt), one
K-length exact dot.

Precision/engine history (BENCH_r01/r02, tools/kernel_variants.py):
the contractions are 1-column matvecs, which use 1/128 of the MXU's
output lanes; f32-exact MXU emulation (Precision.HIGHEST, 6 passes) made
the kernel MXU-bound (718 → 248 GB/s).  VPU multiply+reduce is exact in
f32 and free in an HBM-bound kernel (1 flop/byte vs ~4.7 flops/byte VPU
roofline).  Layouts matter: r and the p accumulator are (1, K) —
lane-major, matching both the broadcast of r over rows and the natural
layout of a row-reduction — where the r02 (K, 1) layout forced a
lane↔sublane relayout every grid step.  Measured on v5e: 690 GB/s
one-pass at (65536, 2048) f32 with the chip's same-day XLA full-reduce
ceiling at 693 GB/s, rel err vs f64 ≈ 2e-7.

bf16 X streaming (r03 KV_BF16 sweep) uses the SAME VPU/(1, K)
formulation with an in-register upcast — 1263 GB/s f32-equivalent
one-pass (631 GB/s physical) at rel err 4.3e-4, beating the earlier
MXU-matvec/(K, 1) bf16 variant (1098 GB/s, 2.4e-3 — it had to round t
back to bf16 between the two contractions).

Constraints / fallback: the full K extent of a row tile must fit VMEM
(K ≤ ~128k at f32 for a 16-row minimum tile); `deflate_pass`
transparently falls back to the two-matmul XLA path when unsupported.
N is padded to the row-tile multiple with zero rows (exact: zero rows
contribute nothing to p).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # Pallas is TPU/GPU-only; keep CPU-only installs importable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# per-buffer VMEM budget for the streamed X tile; with Pallas's double
# buffering this is the dominant VMEM consumer (2 × budget)
_TILE_BUDGET = 8 * 1024 * 1024


def _row_tile(K: int, dtype_bytes: int = 4) -> int:
    """Largest multiple-of-8 row tile whose (TN, K) block fits the VMEM
    tile budget — the SINGLE tile-policy source shared by the kernel,
    `pad_rows_to_tile`, and `pallas_supported`.  Sub-f32 dtypes round to
    the 16-row sublane multiple.  tn=1024 at K=2048/f32 measured fastest
    on v5e (tools/kernel_variants.py sweep: 512→677, 1024→690,
    2048→676 GB/s)."""
    tn = _TILE_BUDGET // (K * dtype_bytes)
    tn = (tn // 8) * 8
    tn = max(8, min(1024, tn))
    if dtype_bytes < 4:
        # bf16 sublane multiple; tn=512 measured fastest for the bf16
        # stream (KV_BF16 sweep: 512→1263, 1024→1189, 2048→1240 GB/s
        # f32-equivalent)
        tn = max(16, (min(tn, 512) // 16) * 16)
    return tn


def _kernel_f32(x_ref, r_ref, t_ref, p_ref, p_acc):
    """Exact-f32 VPU formulation (see module docstring)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        p_acc[:, :] = jnp.zeros_like(p_acc)

    x = x_ref[:, :]
    r = r_ref[:, :]  # (1, K): broadcast over rows is lane-aligned
    t = jnp.sum(x * r, axis=1, keepdims=True)  # (TN, 1)
    t_ref[:, :] = t
    p_acc[:, :] += jnp.sum(x * t, axis=0, keepdims=True)  # (1, K)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        p_ref[:, :] = p_acc[:, :]


def _kernel_bf16(x_ref, r_ref, t_ref, p_ref, p_acc):
    """bf16-X formulation: upcast the tile to f32 in-register and run
    the same (1, K) lane-major VPU multiply+reduce as the f32 kernel —
    only the HBM read is narrow.  Beats the earlier MXU-matvec/(K, 1)
    variant on BOTH axes (KV_BF16 sweep, tools/kernel_variants.py,
    v5e @ 65536×2048): 1263 vs 1098 GB/s f32-equivalent one-pass, and
    rel err 4.3e-4 vs 2.4e-3 — the MXU path had to round t back to
    bf16 for the second contraction, the VPU keeps t/r f32 throughout
    so the only error is X's own bf16 rounding."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        p_acc[:, :] = jnp.zeros_like(p_acc)

    x = x_ref[:, :].astype(jnp.float32)
    r = r_ref[:, :]  # (1, K) f32
    t = jnp.sum(x * r, axis=1, keepdims=True)  # (TN, 1)
    t_ref[:, :] = t
    p_acc[:, :] += jnp.sum(x * t, axis=0, keepdims=True)  # (1, K)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        p_ref[:, :] = p_acc[:, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _deflate_pass_pallas(X: jnp.ndarray, r: jnp.ndarray, interpret: bool = False):
    """X may be float32 or bfloat16 (bf16 halves HBM traffic again; the
    contraction accumulates in f32 either way).  t/tt/p are always
    float32."""
    N, K = X.shape
    dtype = X.dtype
    if dtype not in (jnp.float32, jnp.bfloat16):
        raise ValueError(
            f"pallas deflation kernel supports float32/bfloat16 X, got "
            f"{dtype} — use deflate_pass (auto-falls back to XLA)"
        )
    acc = jnp.float32
    f32 = dtype == jnp.float32
    tn = _row_tile(K, dtype.itemsize)
    pad = (-N) % tn
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, K), dtype)])
    n_pad = N + pad
    grid = n_pad // tn

    # both kernels share the lane-major (1, K) layout for r and the p
    # accumulator, and r/t/p stay f32 regardless of X's dtype
    p_shape = (1, K)
    compiler_params = None
    if not interpret:
        # double-buffered X tiles exceed the default 16 MB scoped-VMEM
        # limit at tn=1024; grant headroom explicitly (v5e: 128 MB VMEM)
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=2 * _TILE_BUDGET + (8 << 20),
        )
    t, p = pl.pallas_call(
        _kernel_f32 if f32 else _kernel_bf16,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tn, K), lambda i: (i, 0)),
            pl.BlockSpec(p_shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i: (i, 0)),
            pl.BlockSpec(p_shape, lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), acc),
            jax.ShapeDtypeStruct(p_shape, acc),
        ],
        scratch_shapes=[
            pltpu.VMEM(p_shape, jnp.float32),
        ],
        interpret=interpret,
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * K,
            bytes_accessed=n_pad * K * dtype.itemsize,
            transcendentals=0,
        ),
    )(X, r[None, :].astype(acc))
    p = p[0]
    # tt = tᵀt = rᵀ(Xᵀ X r) = r·p, one K-length dot — computed exactly
    # (HIGHEST) instead of accumulating a scalar in SMEM per grid step
    tt = jax.lax.dot_general(
        r.astype(acc), p, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return t[:N, 0], tt, p


def pad_rows_to_tile(X: jnp.ndarray) -> jnp.ndarray:
    """Pad X with zero rows to the kernel's row-tile multiple.

    `_deflate_pass_pallas` pads internally when needed, but that
    concatenate materializes a full X copy PER CALL — callers looping
    over components (models/kernel_pls.py unroll path) should pad once
    up front instead.  Zero rows are exact: they contribute nothing to
    p or tt, and their t entries are 0 (slice them off the score
    matrix).  Returns X unchanged when already aligned."""
    N, K = X.shape
    tn = _row_tile(K, X.dtype.itemsize)
    pad = (-N) % tn
    if not pad:
        return X
    return jnp.concatenate([X, jnp.zeros((pad, K), X.dtype)])


def deflate_pass_xla(X: jnp.ndarray, r: jnp.ndarray):
    """Reference two-matmul formulation (two X passes) — the fallback and
    the baseline the kernel is benchmarked against.

    When X is stored in a sub-f32 dtype (bf16 speed mode), the matvecs
    keep X's narrow dtype on the HBM-read side and accumulate in f32
    (`preferred_element_type`), mirroring the Pallas bf16 kernel's
    contract — t/tt/p are always f32.

    Precision asymmetry vs. the Pallas bf16 kernel: `lax.dot_general`
    requires matching operand dtypes, so the f32-accumulated t must be
    rounded back to bf16 for the second contraction p = Xᵀt — exactly
    the rounding the KV_BF16 hardware sweep identified as the dominant
    error source in the rejected MXU kernel (2.4e-3 vs 4.3e-4 component
    rel err).  The Pallas kernel keeps t f32 in-register, so the XLA
    fallback (CPU, vmapped CV refits, sharded per-shard bf16) carries
    ~5× higher per-component error than the fused TPU path.  Both are
    within the documented ~1e-3 x_storage budget (tests/test_bf16.py);
    the cast is the bandwidth-correct choice, not an oversight."""
    if X.dtype.itemsize < 4:
        acc = jnp.float32
        t = jax.lax.dot_general(
            X, r.astype(X.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=acc,
        )
        p = jax.lax.dot_general(
            X, t.astype(X.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=acc,
        )
        return t, t @ t, p
    t = X @ r
    return t, t @ t, X.T @ t


def pallas_supported(K: int, itemsize: int = 4) -> bool:
    """True when the fused TPU kernel can run: Pallas importable, the
    default backend is actually TPU (the kernel is Mosaic/TPU-lowered —
    a GPU backend imports pallas fine but cannot compile it), the dtype
    is one the kernel implements (f32/bf16, by itemsize), and a (16, K)
    minimum row tile fits the VMEM tile budget."""
    if not _HAS_PALLAS or jax.default_backend() != "tpu":
        return False
    if itemsize not in (2, 4):
        return False
    return K * itemsize * 16 <= _TILE_BUDGET


def deflate_pass(
    X: jnp.ndarray, r: jnp.ndarray, *, use_pallas: bool | None = None,
    interpret: bool = False,
):
    """Single-pass (t = X r, tt = tᵀt, p = Xᵀ t).

    use_pallas=None: auto — Pallas on TPU backends when the row tile fits
    VMEM, XLA otherwise.
    """
    N, K = X.shape
    if use_pallas is None:
        use_pallas = pallas_supported(K, X.dtype.itemsize)
    if use_pallas and not interpret and X.dtype not in (
        jnp.float32, jnp.bfloat16
    ):
        # explicit use_pallas with a dtype the kernel doesn't implement
        # (e.g. f64 under jax_enable_x64): exact XLA path instead of a
        # silent precision downgrade through the bf16 branch
        use_pallas = False
    if not use_pallas:
        return deflate_pass_xla(X, r)
    return _deflate_pass_pallas(X, r, interpret=interpret)

"""Fused deflation-pass Pallas kernel for kernel-PLS type 1.

The reference's per-component hot loop (/root/reference/src/pls.cpp:418-421)
streams X twice:  t = X r  (pass 1),  p = Xᵀ t  (pass 2), plus tt = tᵀt.
For large X this is HBM-bandwidth-bound, and XLA will not fuse two
dependent matmuls — X is read from HBM twice per component.

This kernel computes all three in ONE streaming pass: for each row tile
Xᵢ (TN × K) resident in VMEM,

    tᵢ = Xᵢ r          (MXU)
    tt += tᵢᵀtᵢ        (SMEM scalar accumulator across the sequential grid)
    p  += Xᵢᵀ tᵢ       (VMEM (K,1) accumulator across the grid)

halving HBM traffic (the roofline for the whole component update, since
r/p/t are O(N+K) ≪ O(N·K)).  TPU grids execute sequentially on a core, so
cross-step accumulators in scratch are the idiomatic reduction pattern.

Constraints / fallback: the full K extent of a row tile must fit VMEM
(K ≤ ~16k at f32 with double buffering); `deflate_pass` transparently
falls back to the two-matmul XLA path when unsupported.  N is padded to
the row-tile multiple with zero rows (exact: zero rows contribute nothing
to tt or p).
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


def _row_tile(K: int, dtype_bytes: int = 4) -> int:
    """Largest multiple-of-8 row tile whose (TN, K) block fits the VMEM
    budget (~4 MB per buffer; Pallas double-buffers grid blocks)."""
    budget = 4 * 1024 * 1024
    tn = budget // (K * dtype_bytes)
    tn = (tn // 8) * 8
    return max(8, min(1024, tn))


def _kernel(x_ref, r_ref, t_ref, p_ref, tt_ref, p_acc, tt_acc):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        p_acc[:, :] = jnp.zeros_like(p_acc)
        tt_acc[0, 0] = jnp.zeros((), tt_acc.dtype)

    x = x_ref[:, :]
    r = r_ref[:, :]
    # f32 inputs: HIGHEST keeps the MXU passes f32-exact (measured rel err
    # 3e-7 vs f64, compared with ~3e-3 at DEFAULT's bf16 truncation) at NO
    # bandwidth cost — this kernel is HBM-bound, the MXU is mostly idle.
    # bf16 inputs: a single bf16xbf16->f32 pass is already exact, so
    # DEFAULT avoids a pointless upcast.
    prec = (
        jax.lax.Precision.HIGHEST
        if x_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    t = jax.lax.dot_general(
        x, r, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )  # (TN, 1)
    t_ref[:, :] = t.astype(t_ref.dtype)
    # p partial: Xᵢᵀ tᵢ — contract over the row (sublane) dimension
    p_part = jax.lax.dot_general(
        x, t.astype(x.dtype) if x.dtype != jnp.float32 else t,
        (((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )  # (K, 1)
    p_acc[:, :] += p_part
    tt_acc[0, 0] += jnp.sum(t * t)

    @pl.when(i == n_i - 1)
    def _flush():
        p_ref[:, :] = p_acc[:, :].astype(p_ref.dtype)
        tt_ref[0, 0] = tt_acc[0, 0].astype(tt_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _deflate_pass_pallas(X: jnp.ndarray, r: jnp.ndarray, interpret: bool = False):
    """X may be float32 or bfloat16 (bf16 halves HBM traffic again; the
    MXU accumulates in f32 either way).  t/tt/p are always float32."""
    N, K = X.shape
    dtype = X.dtype
    acc = jnp.float32
    tn = _row_tile(K, dtype.itemsize)
    if dtype.itemsize < 4:
        tn = max(16, (tn // 16) * 16)  # bf16 sublane tiling multiple
    pad = (-N) % tn
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, K), dtype)])
    n_pad = N + pad
    grid = n_pad // tn

    t, p, tt = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tn, K), lambda i: (i, 0)),
            pl.BlockSpec((K, 1), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i: (i, 0)),
            pl.BlockSpec((K, 1), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM if not interpret else pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), acc),
            jax.ShapeDtypeStruct((K, 1), acc),
            jax.ShapeDtypeStruct((1, 1), acc),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * K,
            bytes_accessed=n_pad * K * dtype.itemsize,
            transcendentals=0,
        ),
    )(X, r[:, None].astype(dtype))
    return t[:N, 0], tt[0, 0], p[:, 0]


def deflate_pass_xla(X: jnp.ndarray, r: jnp.ndarray):
    """Reference two-matmul formulation (two X passes) — the fallback and
    the baseline the kernel is benchmarked against."""
    t = X @ r
    return t, t @ t, X.T @ t


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
        on_tpu = jax.default_backend() not in ("cpu",)
        # a (16, K) minimum tile must fit the per-buffer VMEM budget
        use_pallas = (
            _HAS_PALLAS and on_tpu
            and K * X.dtype.itemsize * 16 <= 8 * 1024 * 1024
        )
    if not use_pallas:
        return deflate_pass_xla(X, r)
    return _deflate_pass_pallas(X, r, interpret=interpret)

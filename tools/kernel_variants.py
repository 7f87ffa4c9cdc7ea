#!/usr/bin/env python
"""Hardware micro-bench of fused-deflation kernel variants.

Explores the implementation space of the one-pass (t = X r, p = Xᵀ t)
kernel on the real chip so ops/deflate.py ships the fastest *exact-f32*
formulation.  Current variant set: the lane-major (1,K) VPU formulation
(tt computed OUTSIDE the kernel as r·p) across row-tile sizes
512/768/1024/1536/2048, the larger tiles with an explicit scoped-VMEM
grant (the 16 MB default allows only tile 512 double-buffered).

Builders for the other design points measured during round 3 are kept
below (make_mxu: single/multi-pass MXU matvecs; tt_inside: SMEM scalar
accumulation) — re-add them to `variants` to reproduce.  Round-3
measurements at (65536, 2048) f32, GB/s one-pass:
  shipped r02 (K,1)-layout VPU kernel  663
  vpu (1,K) tile 512                   677-686
  vpu (1,K) tile 1024 + vmem grant     690   <- shipped in ops/deflate.py
  MXU DEFAULT (bf16-inexact)           658
  XLA same-day single-pass full-reduce ceiling: 693
Timing: dependency-chained slope (see bench.py).

Usage: python tools/kernel_variants.py [--n 65536] [--k 2048]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    from pls_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() == "cpu":
        print("no accelerator", file=sys.stderr)
        return 0

    N, K = args.n, args.k
    kx, kr = jax.random.split(jax.random.key(0))
    X = jax.random.normal(kx, (N, K), jnp.float32)
    r0 = jax.random.normal(kr, (K,), jnp.float32)
    jax.block_until_ready((X, r0))
    gb = N * K * 4 / 1e9

    Xd = np.asarray(X, np.float64)
    rd = np.asarray(r0, np.float64)
    td = Xd @ rd
    pd = Xd.T @ td
    ttd = float(td @ td)

    # ---- variant builders: each returns fn(X, r) -> (t, tt, p) ----

    def make_vpu_1k(tn, tt_inside, vmem_mb=None):
        def kern(x_ref, r_ref, t_ref, p_ref, p_acc, *maybe_tt):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                p_acc[:, :] = jnp.zeros_like(p_acc)

            x = x_ref[:, :]
            r = r_ref[:, :]  # (1, K)
            t = jnp.sum(x * r, axis=1, keepdims=True)  # (TN, 1)
            t_ref[:, :] = t
            p_acc[:, :] += jnp.sum(x * t, axis=0, keepdims=True)  # (1, K)
            if tt_inside:
                tt_ref, tt_acc = maybe_tt

                @pl.when(i == 0)
                def _():
                    tt_acc[0, 0] = jnp.zeros((), jnp.float32)

                tt_acc[0, 0] += jnp.sum(t * t)

                @pl.when(i == pl.num_programs(0) - 1)
                def _():
                    tt_ref[0, 0] = tt_acc[0, 0]

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                p_ref[:, :] = p_acc[:, :]

        @jax.jit
        def run(X, r):
            pad = (-N) % tn
            Xp = jnp.concatenate([X, jnp.zeros((pad, K), X.dtype)]) if pad else X
            n_pad = N + pad
            outs = [
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, K), jnp.float32),
            ]
            out_specs = [
                pl.BlockSpec((tn, 1), lambda i: (i, 0)),
                pl.BlockSpec((1, K), lambda i: (0, 0)),
            ]
            scratch = [pltpu.VMEM((1, K), jnp.float32)]
            if tt_inside:
                outs.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
                out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
                scratch.append(pltpu.SMEM((1, 1), jnp.float32))
            cp = (
                pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20)
                if vmem_mb
                else None
            )
            res = pl.pallas_call(
                kern,
                compiler_params=cp,
                grid=(n_pad // tn,),
                in_specs=[
                    pl.BlockSpec((tn, K), lambda i: (i, 0)),
                    pl.BlockSpec((1, K), lambda i: (0, 0)),
                ],
                out_specs=out_specs,
                out_shape=outs,
                scratch_shapes=scratch,
                cost_estimate=pl.CostEstimate(
                    flops=4 * n_pad * K, bytes_accessed=n_pad * K * 4,
                    transcendentals=0,
                ),
            )(Xp, r[None, :])
            t, p = res[0], res[1]
            if tt_inside:
                tt = res[2][0, 0]
            else:
                tt = jax.lax.dot_general(
                    r, p[0], (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                )
            return t[:N, 0], tt, p[0]

        return run

    def make_mxu(tn, prec):
        def kern(x_ref, r_ref, t_ref, p_ref, p_acc):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                p_acc[:, :] = jnp.zeros_like(p_acc)

            x = x_ref[:, :]
            r = r_ref[:, :]
            t = jax.lax.dot_general(
                x, r, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32,
            )
            t_ref[:, :] = t
            p_acc[:, :] += jax.lax.dot_general(
                x, t, (((0,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32,
            )

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                p_ref[:, :] = p_acc[:, :]

        @jax.jit
        def run(X, r):
            pad = (-N) % tn
            Xp = jnp.concatenate([X, jnp.zeros((pad, K), X.dtype)]) if pad else X
            n_pad = N + pad
            t, p = pl.pallas_call(
                kern,
                grid=(n_pad // tn,),
                in_specs=[
                    pl.BlockSpec((tn, K), lambda i: (i, 0)),
                    pl.BlockSpec((K, 1), lambda i: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((tn, 1), lambda i: (i, 0)),
                    pl.BlockSpec((K, 1), lambda i: (0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                    jax.ShapeDtypeStruct((K, 1), jnp.float32),
                ],
                scratch_shapes=[pltpu.VMEM((K, 1), jnp.float32)],
                cost_estimate=pl.CostEstimate(
                    flops=4 * n_pad * K, bytes_accessed=n_pad * K * 4,
                    transcendentals=0,
                ),
            )(Xp, r[:, None])
            t1 = t[:N, 0]
            return t1, t1 @ t1, p[:, 0]

        return run

    def make_vpu_bf16(tn, vmem_mb=100):
        """bf16 X stream, VPU formulation: upcast the tile to f32
        in-register, (1, K) lane-major r/p like the shipped f32 kernel —
        probing whether the bf16 path's MXU matvec + (K,1) relayout is
        what holds it at 637 GB/s physical vs the f32 kernel's 738.
        X must arrive as a bf16 ARGUMENT (a closed-over operand bakes
        256 MB of constants into the HLO → remote-compile HTTP 413)."""

        def kern(x_ref, r_ref, t_ref, p_ref, p_acc):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                p_acc[:, :] = jnp.zeros_like(p_acc)

            x = x_ref[:, :].astype(jnp.float32)
            r = r_ref[:, :]  # (1, K) f32
            t = jnp.sum(x * r, axis=1, keepdims=True)
            t_ref[:, :] = t
            p_acc[:, :] += jnp.sum(x * t, axis=0, keepdims=True)

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                p_ref[:, :] = p_acc[:, :]

        @jax.jit
        def run(Xb, r):
            pad = (-N) % tn
            Xp = (
                jnp.concatenate([Xb, jnp.zeros((pad, K), Xb.dtype)])
                if pad
                else Xb
            )
            n_pad = N + pad
            t, p = pl.pallas_call(
                kern,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_mb * 2**20
                ),
                grid=(n_pad // tn,),
                in_specs=[
                    pl.BlockSpec((tn, K), lambda i: (i, 0)),
                    pl.BlockSpec((1, K), lambda i: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((tn, 1), lambda i: (i, 0)),
                    pl.BlockSpec((1, K), lambda i: (0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                    jax.ShapeDtypeStruct((1, K), jnp.float32),
                ],
                scratch_shapes=[pltpu.VMEM((1, K), jnp.float32)],
                cost_estimate=pl.CostEstimate(
                    flops=4 * n_pad * K, bytes_accessed=n_pad * K * 2,
                    transcendentals=0,
                ),
            )(Xp, r[None, :])
            tt = jax.lax.dot_general(
                r, p[0], (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            return t[:N, 0], tt, p[0]

        return run

    from pls_tpu.ops.deflate import _deflate_pass_pallas

    variants = {"vpu_1k_t512": make_vpu_1k(512, tt_inside=False)}
    for tn in (512, 768, 1024, 1536, 2048):
        variants[f"vpu_1k_t{tn}_v100"] = make_vpu_1k(tn, False, vmem_mb=100)
    if os.environ.get("KV_BF16"):
        # rebind the operand the chains pass: all bf16 variants take the
        # bf16 X as a traced ARGUMENT (never a closure constant)
        X = X.astype(jnp.bfloat16)
        jax.block_until_ready(X)
        variants = {
            "shipped_bf16_mxu": lambda X_, r_: _deflate_pass_pallas(X_, r_)
        }
        for tn in (512, 1024, 2048):
            variants[f"vpu_bf16_t{tn}"] = make_vpu_bf16(tn)

    @jax.jit
    def advance(p):
        return p * jax.lax.rsqrt(p @ p)

    def make_chain(step, iters):
        @jax.jit
        def chain(X, r):
            tt = None
            for _ in range(iters):
                t, tt, p = step(X, r)
                r = advance(p)
            return tt

        return chain

    short_n, long_n = 5, 5 + args.iters
    for name, fn in variants.items():
        try:
            t, tt, p = fn(X, r0)
            err_p = float(np.abs(np.asarray(p) - pd).max() / np.abs(pd).max())
            err_tt = abs(float(tt) - ttd) / ttd
            chains = {n: make_chain(fn, n) for n in (short_n, long_n)}
            t0 = time.perf_counter()
            for c in chains.values():
                float(c(X, r0))
            compile_s = time.perf_counter() - t0
            times = {}
            for n, c in chains.items():
                times[n] = min(
                    (lambda: (lambda t0: (float(c(X, r0)), time.perf_counter() - t0)[1])(
                        time.perf_counter()
                    ))()
                    for _ in range(5)
                )
            per = max((times[long_n] - times[short_n]) / args.iters, 1e-9)
            print(
                f"{name:18s} {per*1e3:7.3f} ms/comp  {gb/per:7.1f} GB/s  "
                f"err_p={err_p:.2e} err_tt={err_tt:.2e}  compile={compile_s:.1f}s",
                flush=True,
            )
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Prewarm the persistent XLA compilation cache (utils/cache.py).

Cold compiles through a relay-attached TPU are the dominant tail risk of
every measurement in this repo: the r03 driver bench recorded 116 s
compile+first on its surviving attempt, and the north-star streaming
bench once paid a 2498 s cold compile of its chunk-step program.  This
tool compiles the hot programs at their production shapes into the
persistent cache so every later process starts warm and a stalled
process can be killed and retried cheaply.

Cache-key discipline: the persistent cache is keyed on the HLO module
(whose name comes from the jitted function) — so this tool compiles the
SAME top-level jitted functions the production paths call
(`_deflate_pass_pallas`, `_update`/`_update_narrow`, `fit_from_stats`,
`_fit_kernel`, `jit(deflate_pass_xla)`), via AOT `.lower().compile()`
where the function is a direct jit (no allocation, no execution), and
via an eager call on zero operands for composite paths
(cv_loo_from_stats) whose programs are built inside the call.

Profiles (--profile, default "bench"):
  bench      the driver-bench programs (fused Pallas kernel f32+bf16,
             normalize step, XLA two-pass comparison)
  northstar  the 1M×10k ingest/CV programs (accumulator updates,
             fit_from_stats, the batched LOO fold program)
  fit        the default end-to-end fit (auto→unroll Pallas)
  all        everything above

Run via `make prewarm` or as bench.py's phase 0 (separately watchdogged
there).  Safe to re-run: warm entries are hits, not recompiles.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[prewarm {time.strftime('%T')}] {m}", file=sys.stderr, flush=True)


def _aot(label, jitted, *shapes, **kw):
    """AOT-compile a top-level jitted callable at ShapeDtypeStruct args."""
    t0 = time.perf_counter()
    try:
        jitted.lower(*shapes, **kw).compile()
        log(f"{label}: {time.perf_counter() - t0:.1f}s")
        return True
    except Exception as e:
        log(f"{label} FAILED ({time.perf_counter() - t0:.1f}s): {e}")
        return False


def _run(label, fn):
    """Execute a composite call (compiles its internal programs)."""
    import jax

    t0 = time.perf_counter()
    try:
        jax.block_until_ready(fn())
        log(f"{label}: {time.perf_counter() - t0:.1f}s")
        return True
    except Exception as e:
        log(f"{label} FAILED ({time.perf_counter() - t0:.1f}s): {e}")
        return False


def prewarm_bench(jnp, jax) -> None:
    from pls_tpu.ops.deflate import (
        _deflate_pass_pallas,
        deflate_pass_xla,
        pallas_supported,
    )

    N, K = 131072, 2048  # bench.py's TPU operand
    sd = jax.ShapeDtypeStruct
    if pallas_supported(K, 4):
        _aot(
            "pallas_fused f32", _deflate_pass_pallas,
            sd((N, K), jnp.float32), sd((K,), jnp.float32),
        )
        _aot(
            "pallas_fused bf16", _deflate_pass_pallas,
            sd((N, K), jnp.bfloat16), sd((K,), jnp.float32),
        )

    # bench.py's normalize step: reproduce its exact jitted function
    # (the HLO module name comes from the function name, so a def named
    # `advance` — not a lambda — is what matches)
    for odtype in (jnp.float32, jnp.bfloat16):

        @jax.jit
        def advance(p, odtype=odtype):
            return (p * jax.lax.rsqrt(p @ p)).astype(odtype)

        _aot(f"advance {odtype.__name__}", advance, sd((K,), jnp.float32))

    _aot(
        "xla_two_pass (jit(deflate_pass_xla))",
        jax.jit(deflate_pass_xla),
        sd((N, K), jnp.float32), sd((K,), jnp.float32),
    )


def prewarm_northstar(jnp, jax, *, chunk=16384, k=10_000, m=10, a=20,
                      fold_batch=125) -> None:
    from pls_tpu.cv.loo import cv_loo_from_stats
    from pls_tpu.models.kernel_pls import fit_from_stats
    from pls_tpu.models.streaming import _update, _update_narrow

    sd = jax.ShapeDtypeStruct
    f32, bf16 = jnp.float32, jnp.bfloat16
    n_sd = sd((), jnp.int32)
    _aot(
        "stats update f32", _update,
        sd((k, k), f32), sd((k, m), f32), n_sd,
        sd((chunk, k), f32), sd((chunk, m), f32),
    )
    _aot(
        "stats update bf16-narrow", _update_narrow,
        sd((k, k), f32), sd((k, m), f32), n_sd,
        sd((chunk, k), bf16), sd((chunk, m), bf16),
    )
    _aot(
        "fit_from_stats", fit_from_stats,
        sd((k, k), f32), sd((k, m), f32),
        A=a, power_iters=16, precision=None,
    )
    # the batched-LOO fold program is assembled inside cv_loo_from_stats
    # (padded_map/lax.map), so compile it by executing on zero operands —
    # one fold batch is enough (every batch shares the program)
    XXz = jnp.zeros((k, k), f32)
    XYz = jnp.zeros((k, m), f32)
    fXz = jnp.zeros((fold_batch, k), f32)
    fYz = jnp.zeros((fold_batch, m), f32)
    _run(
        f"LOO fold program (batch={fold_batch})",
        lambda: cv_loo_from_stats(
            XXz, XYz, fXz, fYz, a, batch_size=fold_batch,
            power_iters=16, precision=None,
        ).errors,
    )


def prewarm_fit(jnp, jax) -> None:
    from pls_tpu.models.kernel_pls import _fit_kernel, auto_pallas_mode

    sd = jax.ShapeDtypeStruct
    N, K, M, A = 65536, 2048, 1, 8
    mode = auto_pallas_mode(N, K, A, 4)
    unroll = mode == "unroll"
    _aot(
        f"fit kernel ({N}x{K}, A={A}, mode={mode})",
        _fit_kernel,
        sd((N, K), jnp.float32), sd((N, M), jnp.float32),
        A=A, type1=True, power_iters=None, precision="highest",
        use_pallas=bool(mode), unroll=unroll,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--profile", default="bench",
        choices=["bench", "northstar", "fit", "all"],
    )
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--k", type=int, default=10_000)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--a", type=int, default=20)
    ap.add_argument("--fold-batch", type=int, default=125)
    args = ap.parse_args()

    from pls_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()} profile={args.profile} "
        f"cache={os.environ.get('PLS_TPU_CACHE_DIR', '~/.cache/pls_tpu_xla')}")
    t0 = time.perf_counter()
    if args.profile in ("bench", "all"):
        prewarm_bench(jnp, jax)
    if args.profile in ("northstar", "all"):
        prewarm_northstar(
            jnp, jax, chunk=args.chunk, k=args.k, m=args.m, a=args.a,
            fold_batch=args.fold_batch,
        )
    if args.profile in ("fit", "all"):
        prewarm_fit(jnp, jax)
    log(f"done in {time.perf_counter() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())

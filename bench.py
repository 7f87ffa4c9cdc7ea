#!/usr/bin/env python
"""Headline benchmark for the driver: fused-deflation kernel bandwidth.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
Diagnostics go to stderr.

Metric: one-pass bandwidth of the per-component deflation update
(t = X r, tt = tᵀt, p = Xᵀ t) on the largest X that comfortably fits one
chip — the hot loop of kernel-PLS type 1 (BASELINE.json: "NIPALS deflation
GB/s per chip").  Bytes counted as one logical pass of X (N·K·itemsize)
per component, identically for every implementation.

Baseline: the reference's own hot loop (Eigen, single thread, double,
/root/reference/src/pls.cpp:418-421) measured on this host at 3.64 GB/s
one-pass-equivalent (N=20000, K=2000; tools/refbench — see BASELINE.md
hardware).  vs_baseline = ours / 3.64.
"""

import json
import sys
import time

REFERENCE_ONEPASS_GBPS = 3.64  # Eigen f64 single-thread, measured this host


def _bench(fn, args, iters=30, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    from pls_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pls_tpu.ops.deflate import (
        _HAS_PALLAS,
        _deflate_pass_pallas,
        deflate_pass_xla,
    )

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    # ~512 MB f32 operand on TPU; smaller on CPU fallback
    N, K = (65536, 2048) if on_tpu else (8192, 1024)
    dtype = jnp.float32

    key = jax.random.key(0)
    kx, kr = jax.random.split(key)
    # generate on device: avoids pushing the full X through host transfer
    X = jax.random.normal(kx, (N, K), dtype)
    r = jax.random.normal(kr, (K,), dtype)
    jax.block_until_ready((X, r))

    xla_dt = _bench(jax.jit(deflate_pass_xla), (X, r))
    print(f"[bench] backend={backend} N={N} K={K}", file=sys.stderr)
    gb = N * K * dtype.dtype.itemsize / 1e9 if hasattr(dtype, "dtype") else N * K * 4 / 1e9
    print(
        f"[bench] xla two-pass: {xla_dt*1e3:.3f} ms -> {gb/xla_dt:.1f} GB/s (one-pass count)",
        file=sys.stderr,
    )

    best_dt = xla_dt
    impl = "xla_two_pass"
    if on_tpu and _HAS_PALLAS:
        try:
            pallas_dt = _bench(_deflate_pass_pallas, (X, r))
            print(
                f"[bench] pallas fused: {pallas_dt*1e3:.3f} ms -> "
                f"{gb/pallas_dt:.1f} GB/s (one-pass count)",
                file=sys.stderr,
            )
            if pallas_dt < best_dt:
                best_dt = pallas_dt
                impl = "pallas_fused"
        except Exception as e:  # report, fall back to XLA number
            print(f"[bench] pallas failed: {e}", file=sys.stderr)

    gbps = gb / best_dt
    print(f"[bench] best={impl}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "deflation_onepass_bandwidth",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(gbps / REFERENCE_ONEPASS_GBPS, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

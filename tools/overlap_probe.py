#!/usr/bin/env python
"""Ingest-overlap isolation probe (VERDICT r04 #4).

The r04 artifact showed the disk→device stats pass at 73% of the
cold-disk bound and attributed the gap to the relay runtime — without a
measurement isolating whether disk reads and tunnel transfers can even
proceed CONCURRENTLY here.  This probe measures, in one process:

  1. disk-only: cold threaded-pread rate over a byte budget;
  2. transfer-only: sustained host→device rate over rotating buffers
     (rotation defeats any same-buffer caching in the relay);
  3. concurrent: a reader thread streaming the file (cold) WHILE the
     main thread pushes transfers — the simultaneous-IO ceiling.  If
     either rate collapses below its solo value, the attachment
     serializes the two and no pipeline restructure can beat
     serial(read)+serial(transfer);
  4. pipeline: the actual device_stream + StatsAccumulator loop over
     the same budget, with host-RSS sampled per chunk (the relay's
     per-device_put host retention shows up as an RSS slope of ~1
     chunk per transfer).

Overlap efficiency = pipeline_rate / min(concurrent_disk,
concurrent_h2d).  ≥0.9 means the pipeline sits at the measured
simultaneous-IO bound — the physical optimum for this attachment.

Prints one JSON object to stdout; progress to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(f"[probe {time.strftime('%T')}] {m}", file=sys.stderr, flush=True)


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return 0.0


def drop_caches() -> bool:
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except OSError:
        return False


def disk_pass(path, chunk_rows, budget_gb, offset_chunks=0):
    """Stream `budget_gb` from the file (skipping `offset_chunks` so
    repeat passes hit distinct, still-cold regions)."""
    from pls_tpu.utils.binio import stream_npy

    nbytes = 0
    t0 = time.perf_counter()
    for i, c in enumerate(stream_npy(path, chunk_rows, reuse_buffers=True)):
        if i < offset_chunks:
            t0 = time.perf_counter()  # don't time the skip
            continue
        nbytes += c.nbytes
        if nbytes >= budget_gb * 1e9:
            break
    return nbytes / (time.perf_counter() - t0) / 1e9


def h2d_loop(stop, chunk_rows, K, itemsize, counter):
    """Push rotating-buffer transfers until stop is set; count bytes."""
    import jax

    if itemsize == 2:
        import ml_dtypes

        dt = np.dtype(ml_dtypes.bfloat16)
    else:
        dt = np.dtype(np.float32)
    bufs = [np.ones((chunk_rows, K), dt) for _ in range(3)]
    i = 0
    while not stop.is_set():
        jax.block_until_ready(jax.device_put(bufs[i % 3]))
        counter[0] += bufs[0].nbytes
        i += 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", required=True)
    ap.add_argument("--y", default="")
    ap.add_argument("--chunk", type=int, default=0, help="0 = auto")
    ap.add_argument("--gb", type=float, default=8.0,
                    help="byte budget per sub-measurement")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pls_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from pls_tpu.utils.binio import auto_chunk_rows, npy_shape, stream_npy

    (N, K), dtype = npy_shape(args.file)
    chunk_rows = args.chunk or auto_chunk_rows(dtype)
    chunk_gb = chunk_rows * K * dtype.itemsize / 1e9
    out = {"backend": jax.default_backend(), "chunk_rows": chunk_rows,
           "x_dtype": str(dtype), "budget_gb": args.gb}
    jax.block_until_ready(jax.device_put(np.zeros(8, np.float32)))

    # 1. disk-only, cold
    cold = drop_caches()
    r_disk = disk_pass(args.file, chunk_rows, args.gb)
    out["disk_solo_gbps"] = round(r_disk, 3)
    out["cold_cache"] = cold
    log(f"disk solo: {r_disk:.3f} GB/s ({'cold' if cold else 'WARM'})")

    # 2. transfer-only, sustained
    stop = threading.Event()
    counter = [0]
    t0 = time.perf_counter()
    th = threading.Thread(
        target=h2d_loop, args=(stop, chunk_rows, K, dtype.itemsize, counter)
    )
    th.start()
    while counter[0] < args.gb * 1e9 and time.perf_counter() - t0 < 120:
        time.sleep(0.5)
    stop.set()
    th.join()
    r_h2d = counter[0] / (time.perf_counter() - t0) / 1e9
    out["h2d_solo_gbps"] = round(r_h2d, 3)
    log(f"h2d solo: {r_h2d:.3f} GB/s")

    # 3. concurrent disk + transfer (disjoint cold file region)
    drop_caches()
    total_chunks = (N + chunk_rows - 1) // chunk_rows
    skip = min(int(args.gb * 1e9 / (chunk_gb * 1e9)) + 1, total_chunks // 2)
    stop = threading.Event()
    counter = [0]
    th = threading.Thread(
        target=h2d_loop, args=(stop, chunk_rows, K, dtype.itemsize, counter)
    )
    t0 = time.perf_counter()
    th.start()
    r_disk_c = disk_pass(args.file, chunk_rows, args.gb, offset_chunks=skip)
    dt_total = time.perf_counter() - t0
    stop.set()
    th.join()
    r_h2d_c = counter[0] / dt_total / 1e9
    out["disk_concurrent_gbps"] = round(r_disk_c, 3)
    out["h2d_concurrent_gbps"] = round(r_h2d_c, 3)
    log(f"concurrent: disk {r_disk_c:.3f} GB/s + h2d {r_h2d_c:.3f} GB/s "
        f"(solo: {r_disk:.3f} / {r_h2d:.3f})")

    # 4. the actual pipeline over the same budget, RSS sampled
    from pls_tpu.models.streaming import StatsAccumulator
    from pls_tpu.utils.binio import device_stream

    import jax.numpy as jnp
    import ml_dtypes

    drop_caches()
    x_storage = "bf16" if dtype == np.dtype(ml_dtypes.bfloat16) else None
    M = 1
    acc = StatsAccumulator(K, M, jnp.float32, x_storage=x_storage)
    rss0 = rss_gb()
    rss_samples = []
    nbytes = 0
    t0 = time.perf_counter()
    yzero = np.zeros((chunk_rows, M), np.float32)
    for i, Xc in enumerate(device_stream(
        stream_npy(args.file, chunk_rows, reuse_buffers=True)
    )):
        acc.update(Xc, jnp.asarray(yzero[: Xc.shape[0]]))
        jax.block_until_ready(acc.XX)
        nbytes += Xc.size * dtype.itemsize
        rss_samples.append(round(rss_gb() - rss0, 2))
        if nbytes >= args.gb * 1e9:
            break
    r_pipe = nbytes / (time.perf_counter() - t0) / 1e9
    out["pipeline_gbps"] = round(r_pipe, 3)
    out["pipeline_rss_delta_gb"] = rss_samples
    bound = min(r_disk_c, r_h2d_c)
    out["simultaneous_bound_gbps"] = round(bound, 3)
    out["overlap_efficiency_vs_simultaneous"] = (
        round(r_pipe / bound, 3) if bound > 0 else None
    )
    out["serialization_factor_h2d"] = round(r_h2d_c / r_h2d, 3) if r_h2d else None
    out["serialization_factor_disk"] = round(r_disk_c / r_disk, 3) if r_disk else None
    log(f"pipeline: {r_pipe:.3f} GB/s -> {out['overlap_efficiency_vs_simultaneous']:.0%} "
        f"of the measured simultaneous bound {bound:.3f} GB/s; "
        f"RSS delta {rss_samples[-1] if rss_samples else 0} GB")

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Profiling and roofline reporting.

The reference has no tracing/profiling of any kind (SURVEY.md §5).  Here:
- `trace(path)`: context manager around `jax.profiler` for full XLA traces
  viewable in Perfetto/TensorBoard.
- `measure(fn, *args)`: robust wall-time measurement of a jitted callable.
- `roofline_report(...)`: achieved vs. peak HBM bandwidth / FLOPs for a
  measured op on the current chip generation (north-star target: ≥70% of
  HBM roofline on the deflation kernel).

Peak numbers are per-chip datasheet values for the generations this
framework targets; unknown backends report achieved numbers without a
fraction-of-peak.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

# (HBM GB/s, f32 TFLOP/s dense) per chip generation
_PEAKS = {
    "v5e": (819.0, 98.0),  # v5 lite
    "v5p": (2765.0, 229.0),
    "v4": (1228.0, 137.0),
    "v6e": (1640.0, 230.0),
}


@contextlib.contextmanager
def trace(path: str = "/tmp/pls_tpu_trace"):
    """Capture a jax.profiler trace around a block."""
    import jax

    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def measure(fn, *args, iters: int = 30, warmup: int = 3) -> float:
    """Median-of-means wall time per call (seconds) for a jitted callable."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def detect_generation() -> str | None:
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for gen in _PEAKS:
        if gen in kind:
            return gen
    if "v5 lite" in kind or "v5lite" in kind:
        return "v5e"
    return None


@dataclass(frozen=True)
class Roofline:
    seconds: float
    bytes_accessed: int
    flops: int
    achieved_gbps: float
    achieved_tflops: float
    generation: str | None
    frac_hbm_peak: float | None
    frac_flops_peak: float | None

    def __str__(self) -> str:
        s = (
            f"{self.seconds*1e3:.3f} ms | {self.achieved_gbps:.1f} GB/s"
            f" | {self.achieved_tflops:.2f} TFLOP/s"
        )
        if self.frac_hbm_peak is not None:
            s += (
                f" | {self.frac_hbm_peak*100:.0f}% of {self.generation}"
                f" HBM peak, {self.frac_flops_peak*100:.1f}% of FLOP peak"
            )
        return s


def roofline_report(
    seconds: float, bytes_accessed: int, flops: int
) -> Roofline:
    gen = detect_generation()
    gbps = bytes_accessed / seconds / 1e9
    tflops = flops / seconds / 1e12
    if gen is not None:
        peak_bw, peak_fl = _PEAKS[gen]
        return Roofline(
            seconds, bytes_accessed, flops, gbps, tflops, gen,
            gbps / peak_bw, tflops / peak_fl,
        )
    return Roofline(seconds, bytes_accessed, flops, gbps, tflops, None, None, None)

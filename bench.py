#!/usr/bin/env python
"""Headline benchmark for the driver: fused-deflation throughput.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
Diagnostics go to stderr.

Metric: one-pass bandwidth of the per-component deflation update
(t = X r, tt = tᵀt, p = Xᵀ t) — the hot loop of kernel-PLS type 1
(BASELINE.json: "NIPALS deflation GB/s per chip").  Bytes are counted as
ONE logical pass of X (N·K·itemsize) per component for every
implementation, so a fused single-pass kernel can exceed the naive
two-pass formulation by up to 2× at the same physical bandwidth.

Measurement methodology (important on relay/tunnel-attached TPUs, where
dispatch is pipelined, `block_until_ready` on small outputs can return
before execution, and device-side loops with scalar readbacks can stall):
the component update is dispatched as a Python-level chain of jitted
calls whose inputs depend on the previous call's outputs
(r_{i+1} = normalize(p_i) — the same dependency structure as the real PLS
scan), so the device must serialize them; a single scalar readback at the
end forces completion.  Timed at two chain lengths; per-component time is
the SLOPE, which cancels dispatch/RTT constants.

Baseline: the reference's own hot loop (Eigen, single thread, double,
/root/reference/src/pls.cpp:418-421) measured on this host at 3.64 GB/s
one-pass-equivalent (N=20000, K=2000; see BASELINE.md).
"""

import json
import os
import sys
import time

REFERENCE_ONEPASS_GBPS = 3.64  # Eigen f64 single-thread, measured this host


def log(msg: str) -> None:
    print(f"[bench {time.strftime('%T')}] {msg}", file=sys.stderr, flush=True)


def supervise() -> int:
    """Run the measurement in a child process with a watchdog.

    Remote-relay TPU attachment can transiently stall for minutes inside
    device init or the first compile (observed: >6 min hang that succeeds
    in ~5 s on retry).  A hang in-process would leave the driver with no
    JSON line at all, so the measurement runs in a child with a timeout;
    on stall we kill the whole process group and retry, finally falling
    back to the CPU backend so SOME valid line is always produced.
    """
    import signal
    import subprocess

    budget = float(os.environ.get("PLS_BENCH_BUDGET_SEC", "900"))
    start = time.monotonic()
    # The dominant failure mode is a first-execution stall in a fresh
    # process — NOT compile time (it hits cache-warm programs too):
    # observed 2-40+ min on this relay, independent of the program, and
    # whether a given process stalls is a PER-PROCESS roll (r03: a run
    # succeeded in 90 s immediately after two back-to-back stalled
    # windows totalling 11 min).  So prefer THREE medium TPU windows
    # (more rolls) over two long ones — a warm-cache measurement
    # completes in ~90-150 s, well inside each window — then fall back
    # to CPU.  The CPU attempt gets its OWN cache dir: the shared cache
    # can hold CPU executables AOT-compiled by the relay host for a
    # different microarchitecture, which load with feature-mismatch
    # warnings and run an order of magnitude slow (observed 50
    # ms/component vs 2.5).
    # Phase 0: prewarm the persistent compilation cache in its own
    # watchdogged child (tools/prewarm.py AOT-compiles the bench programs
    # with no operand allocation).  Warm cache -> every measurement
    # attempt skips straight to execution, so a stalled attempt is cheap
    # to kill and retry.  A stalled/failed prewarm is tolerated: the
    # measurement attempts then just compile inline as before.
    prewarm_cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tools", "prewarm.py"),
        "--profile", "bench",
    ]
    tmo = min(budget * 0.20, budget - 60)
    if tmo > 5:
        t0 = time.monotonic()
        proc = subprocess.Popen(prewarm_cmd, start_new_session=True)
        try:
            proc.wait(timeout=tmo)
            log(f"prewarm: rc={proc.returncode} in {time.monotonic()-t0:.0f}s")
        except subprocess.TimeoutExpired:
            log(f"prewarm: stalled >{tmo:.0f}s, killing group and moving on")
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()

    attempts = [
        ({}, budget * 0.30),
        ({}, budget * 0.25),
        ({}, budget * 0.25),
        (
            {
                "JAX_PLATFORMS": "cpu",
                "PLS_TPU_CACHE_DIR": "/tmp/pls_tpu_xla_cpu_fallback",
            },
            budget * 0.20,
        ),
    ]
    for extra_env, tmo in attempts:
        # honor the TOTAL budget: cap each attempt to the unspent remainder
        # (kill/retry overhead must not stretch wall time past the contract)
        remaining = budget - (time.monotonic() - start)
        if remaining <= 5:
            log("watchdog: budget exhausted before attempt")
            break
        tmo = min(tmo, remaining)
        env = dict(os.environ, PLS_BENCH_INNER="1", **extra_env)
        env["PLS_BENCH_BUDGET_SEC"] = str(max(tmo - 30, 30))
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE,
            env=env,
            start_new_session=True,
        )
        try:
            out, _ = proc.communicate(timeout=tmo)
        except subprocess.TimeoutExpired:
            log(f"watchdog: measurement stalled >{tmo:.0f}s, killing group")
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            continue
        line = next(
            (
                ln
                for ln in out.decode(errors="replace").splitlines()
                if ln.startswith("{")
            ),
            None,
        )
        if proc.returncode == 0 and line:
            print(line)
            return 0
        log(f"watchdog: child exited rc={proc.returncode}, retrying")
    log("watchdog: all attempts failed")
    return 1


def main() -> int:
    from pls_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    # sitecustomize in this image force-registers the accelerator plugin,
    # defeating env-level JAX_PLATFORMS=cpu; honor it programmatically so
    # the supervisor's CPU-fallback attempt actually lands on CPU.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pls_tpu.ops.deflate import (
        _HAS_PALLAS,
        _deflate_pass_pallas,
        deflate_pass_xla,
    )

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    # 1 GB operand: large enough that the per-component normalize step and
    # chain bookkeeping (~50 µs) are <4% of the ~1.5 ms kernel time
    N, K = (131072, 2048) if on_tpu else (8192, 1024)
    dtype = jnp.float32
    gb = N * K * 4 / 1e9

    # absorb the per-process first-dispatch stall roll (observed 200 s -
    # 40 min through the relay, independent of program size) on a tiny
    # program, so it can't pollute the per-program compile+first logs
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.zeros((8,)) + 1)
    log(f"first dispatch: {time.perf_counter() - t0:.1f}s")

    key = jax.random.key(0)
    kx, kr = jax.random.split(key)
    # generate on device: avoids pushing X through a host transfer
    X = jax.random.normal(kx, (N, K), dtype)
    r0 = jax.random.normal(kr, (K,), dtype)
    jax.block_until_ready((X, r0))
    log(f"backend={backend} N={N} K={K} ({gb*1e3:.0f} MB operand)")

    def slope_time(pass_fn, label, short=10, long=50, reps=5, operand=None):
        """Dependency-chained component updates (r_{i+1} = normalize(p_i),
        the same dependency structure as the real PLS scan), dispatched as
        a PYTHON-level loop of ONE jitted step program: the device must
        serialize the steps through the data dependency, and dispatch is
        async on the tunnel runtime, so the device stays busy as long as
        per-dispatch overhead < kernel time (~1.5 ms here; validated:
        Python-level chaining and a single 50-step jitted chain program
        measure within 2% of each other).  One scalar readback at the end
        of each run forces completion; the slope between two chain lengths
        cancels the constant dispatch/readback/sync overhead.

        Why not ONE jitted N-step chain program (the r01/r02 method): a
        program embedding 50 pallas custom-calls cold-compiles in >180 s
        through this tunnel's remote compile helper — longer than the
        supervisor's watchdog — whereas the single-step program compiles
        in ~1 s and is shared by every chain length and retry."""
        operand = X if operand is None else operand
        r_init = r0.astype(operand.dtype)
        odtype = operand.dtype

        @jax.jit
        def advance(p):
            return (p * jax.lax.rsqrt(p @ p)).astype(odtype)

        def run_chain(iters):
            r = r_init
            tt = None
            for _ in range(iters):
                t, tt, p = pass_fn(operand, r)
                r = advance(p)
            return float(tt)  # single sync point

        t0 = time.perf_counter()
        run_chain(1)  # compile step + advance, first run
        log(f"{label} compile+first: {time.perf_counter()-t0:.1f}s")
        times = {}
        for iters in (short, long):
            runs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                run_chain(iters)
                runs.append(time.perf_counter() - t0)
            times[iters] = min(runs)
            log(f"{label} iters={iters}: best {times[iters]*1e3:.1f} ms")
        per = max((times[long] - times[short]) / (long - short), 1e-9)
        log(f"{label}: {per*1e3:.3f} ms/component -> {gb/per:.1f} GB/s one-pass")
        return per

    # The fused Pallas kernel is the headline and compiles in ~1 s; the XLA
    # two-pass comparison program can take minutes to cold-compile on
    # remote-compile setups, so it only runs inside the remaining budget.
    budget = float(os.environ.get("PLS_BENCH_BUDGET_SEC", "420"))
    start = time.perf_counter()
    results = {}
    if on_tpu and _HAS_PALLAS:
        try:
            results["pallas_fused"] = slope_time(
                lambda X, r: _deflate_pass_pallas(X, r), "pallas_fused"
            )
        except Exception as e:
            log(f"pallas failed: {e}")
    if on_tpu and _HAS_PALLAS and "pallas_fused" in results:
        # diagnostic only: bf16-X streaming halves HBM traffic again
        # (counted at bf16 bytes, so the one-pass GB/s figure is comparable
        # as *effective f32-equivalent* ~2x this number)
        try:
            Xb = X.astype(jnp.bfloat16)
            per = slope_time(
                lambda Xb, r: _deflate_pass_pallas(Xb, r),
                "pallas_fused_bf16", operand=Xb,
            )
            log(
                f"pallas bf16: {N*K*2/per/1e9:.1f} GB/s bf16-bytes "
                f"({N*K*4/per/1e9:.1f} GB/s f32-equivalent one-pass)"
            )
        except Exception as e:
            log(f"bf16 variant failed: {e}")
    if not results or (time.perf_counter() - start) < budget * 0.5:
        try:
            # jitted so the program matches tools/prewarm.py's cache entry
            results["xla_two_pass"] = slope_time(
                jax.jit(deflate_pass_xla), "xla_two_pass"
            )
        except Exception as e:
            log(f"xla comparison failed: {e}")
            if not results:
                raise

    impl = min(results, key=results.get)
    gbps = gb / results[impl]
    log(f"best={impl}")
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
    if os.environ.get("PLS_BENCH_INNER"):
        sys.exit(main())
    sys.exit(supervise())

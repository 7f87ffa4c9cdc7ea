"""Worker for tests/test_multiprocess.py: one process of a
jax.distributed CPU cluster running the row-sharded GSPMD fit and the
explicit shard_map+psum fit on a mesh spanning BOTH processes.

Usage: python multiprocess_worker.py <coordinator> <num_procs> <proc_id>

Prints "WORKER_OK <proc_id>" on success; any mismatch asserts.
"""

from __future__ import annotations

import os
import sys

# the script lives in tests/; make the in-tree package importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    # the image's sitecustomize force-registers an accelerator plugin;
    # pin CPU programmatically (env JAX_PLATFORMS is not sufficient) and
    # give each process ONE local CPU device
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == num_procs  # global view
    assert len(jax.local_devices()) == 1

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pls_tpu.models.kernel_pls import fit
    from pls_tpu.parallel.mesh import make_pls_mesh
    from pls_tpu.parallel.sharded import fit_rowsharded_shardmap, fit_sharded

    N, K, M, A = 32, 12, 3, 4
    rng = np.random.default_rng(0)  # same data in every process
    Xh = rng.normal(size=(N, K)).astype(np.float32)
    Yh = rng.normal(size=(N, M)).astype(np.float32)

    mesh = make_pls_mesh(rows=num_procs, folds=1, devices=jax.devices())
    row_sh = NamedSharding(mesh, P("rows", None))

    def to_global(host_arr):
        # build a process-spanning global array from the host copy: each
        # process contributes only its addressable shard
        return jax.make_array_from_callback(
            host_arr.shape, row_sh, lambda idx: host_arr[idx]
        )

    Xg = to_global(Xh)
    Yg = to_global(Yh)

    # single-process ground truth, computed independently in each process
    ref = fit(jnp.asarray(Xh), jnp.asarray(Yh), A, precision="highest")
    refW = np.asarray(ref.W)

    # GSPMD path: psums inserted by the SPMD partitioner across PROCESSES
    fg = fit_sharded(Xg, Yg, A, mesh=mesh)
    W1 = np.asarray(fg.W.addressable_data(0))
    np.testing.assert_allclose(np.abs(W1), np.abs(refW), rtol=1e-5, atol=1e-6)

    # explicit collectives path: hand-written psum over 'rows'
    fsm = fit_rowsharded_shardmap(Xg, Yg, A, mesh=mesh, axis="rows")
    W2 = np.asarray(fsm.W.addressable_data(0))
    np.testing.assert_allclose(np.abs(W2), np.abs(refW), rtol=1e-4, atol=1e-5)

    # ---- cross-process STREAMING statistics (the multi-host north-star
    # dataflow, VERDICT r04 #5): each process streams a DISJOINT row
    # range through its own StatsAccumulator, partials are gathered
    # across the cluster and combined with StatsAccumulator.merge — the
    # result must equal the single-process pass bit-for-tolerance.
    from jax.experimental import multihost_utils

    from pls_tpu.models.streaming import (
        FoldStatsAccumulator,
        StatsAccumulator,
    )

    bounds = np.linspace(0, N, num_procs + 1).astype(int)
    lo, hi = int(bounds[proc_id]), int(bounds[proc_id + 1])
    acc = StatsAccumulator(K, M)
    for s in range(lo, hi, 7):
        e = min(s + 7, hi)
        acc.update(Xh[s:e], Yh[s:e])
    parts_xx = np.asarray(multihost_utils.process_allgather(np.asarray(acc.XX)))
    parts_xy = np.asarray(multihost_utils.process_allgather(np.asarray(acc.XY)))
    parts_n = np.asarray(
        multihost_utils.process_allgather(np.asarray(acc.n)[None])
    ).reshape(-1)
    merged = StatsAccumulator(K, M)
    for p in range(num_procs):
        other = StatsAccumulator(K, M)
        other.XX = jnp.asarray(parts_xx[p])
        other.XY = jnp.asarray(parts_xy[p])
        other.n = jnp.asarray(parts_n[p])
        merged.merge(other)
    assert int(merged.n) == N
    np.testing.assert_allclose(
        np.asarray(merged.XX), Xh.T @ Xh, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(merged.XY), Xh.T @ Yh, rtol=1e-5, atol=1e-5
    )

    # ---- same dataflow for the one-pass k-fold statistics: per-process
    # FoldStatsAccumulator partials merged cluster-wide, closed-form
    # PRESS must match the single-process result
    from pls_tpu.cv.kfold import cv_kfold_onepass

    kf = 3
    assign = (np.arange(N) * kf // N).astype(np.int32)
    fl = FoldStatsAccumulator(K, M, kf)
    for s in range(lo, hi, 5):
        e = min(s + 5, hi)
        fl.update(Xh[s:e], Yh[s:e], assign[s:e])
    g_xxf = np.asarray(multihost_utils.process_allgather(np.asarray(fl.XXf)))
    g_xyf = np.asarray(multihost_utils.process_allgather(np.asarray(fl.XYf)))
    g_yyf = np.asarray(multihost_utils.process_allgather(np.asarray(fl.YYf)))
    g_nf = np.asarray(multihost_utils.process_allgather(np.asarray(fl.nf)))
    gacc = FoldStatsAccumulator(K, M, kf)
    for p in range(num_procs):
        other = FoldStatsAccumulator(K, M, kf)
        other.XXf = jnp.asarray(g_xxf[p])
        other.XYf = jnp.asarray(g_xyf[p])
        other.YYf = jnp.asarray(g_yyf[p])
        other.nf = jnp.asarray(g_nf[p])
        gacc.merge(other)
    sacc = FoldStatsAccumulator(K, M, kf)
    sacc.update(Xh, Yh, assign)
    got = cv_kfold_onepass(gacc, A=3)
    ref_press = cv_kfold_onepass(sacc, A=3).press
    np.testing.assert_allclose(got.press, ref_press, rtol=1e-5, atol=1e-6)

    print(f"WORKER_OK {proc_id}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

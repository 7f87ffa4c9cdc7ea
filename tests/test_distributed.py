"""Multi-device semantics on an 8-virtual-device CPU mesh.

The standard way to test pjit/psum behavior without a pod (SURVEY.md §4):
conftest.py forces 8 XLA host devices.  Every sharded execution path must
agree with the single-device reference fit to near machine precision, and
the full composed training step must compile and run over both mesh axes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt
from pls_tpu.parallel import (
    cv_lso_sharded,
    fit_rowsharded_shardmap,
    fit_sharded,
    make_pls_mesh,
    train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    N, K, M = 64, 24, 3
    X = jnp.asarray(rng.normal(size=(N, K)))
    B = rng.normal(size=(K, M))
    Y = jnp.asarray(rng.normal(size=(N, M)) * 0.1 + rng.normal(size=(N, K)) @ B * 0)
    Y = jnp.asarray(np.asarray(X) @ B + rng.normal(size=(N, M)) * 0.1)
    return X, Y


class TestShardedFit:
    def test_gspmd_rowsharded_equals_single(self, data):
        X, Y = data
        mesh = make_pls_mesh(rows=8, folds=1)
        ref = pt.fit(X, Y, 4)
        sh = fit_sharded(X, Y, 4, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(sh)), np.asarray(pt.coefficients(ref)),
            atol=1e-10,
        )

    def test_gspmd_rowsharded_bf16_storage(self, data):
        """x_storage="bf16" composes with row sharding: each shard streams
        bf16, partials psum in f32; agrees with the f32 fit to the bf16
        data-representation floor (tests/test_bf16.py contract)."""
        X, Y = data
        X32 = jnp.asarray(np.asarray(X), jnp.float32)
        Y32 = jnp.asarray(np.asarray(Y), jnp.float32)
        mesh = make_pls_mesh(rows=8, folds=1)
        ref = pt.fit(X32, Y32, 4)
        sh = fit_sharded(X32, Y32, 4, mesh=mesh, x_storage="bf16")
        assert sh.W.dtype == jnp.float32
        B_ref = np.asarray(pt.coefficients(ref))
        B_sh = np.asarray(pt.coefficients(sh))
        assert np.abs(B_sh - B_ref).max() / np.abs(B_ref).max() < 2e-2

    @pytest.mark.parametrize("type1", [True, False])
    def test_shardmap_psum_equals_single(self, data, type1):
        X, Y = data
        mesh = make_pls_mesh(rows=8, folds=1)
        method = pt.KERNEL_TYPE1 if type1 else pt.KERNEL_TYPE2
        ref = pt.fit(X, Y, 4, method)
        sh = fit_rowsharded_shardmap(X, Y, 4, type1=type1, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(sh)), np.asarray(pt.coefficients(ref)),
            atol=1e-10,
        )
        if type1:
            # row-sharded T gathers back to the full scores
            np.testing.assert_allclose(
                np.asarray(sh.T), np.asarray(ref.T), atol=1e-10
            )

    def test_shardmap_pallas_fused_equals_plain(self, data):
        """The multi-chip composition of the fused deflation kernel: each
        device streams its LOCAL rows through the Pallas kernel (interpret
        mode on this CPU mesh) and the partial [p ; tt] joins the same
        fused psum.  Must agree with the plain shard_map fit and the
        single-device reference."""
        X, Y = data
        X = X.astype(jnp.float32)
        Y = Y.astype(jnp.float32)
        mesh = make_pls_mesh(rows=8, folds=1)
        plain = fit_rowsharded_shardmap(X, Y, 3, mesh=mesh)
        fused = fit_rowsharded_shardmap(
            X, Y, 3, mesh=mesh, use_pallas=True, pallas_interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(fused.W), np.asarray(plain.W), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(fused.T), np.asarray(plain.T), rtol=1e-4, atol=1e-5
        )
        ref = pt.fit(X, Y, 3, pt.KERNEL_TYPE1, precision=None,
                     use_pallas=False)
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(fused)),
            np.asarray(pt.coefficients(ref)), rtol=1e-4, atol=1e-5,
        )

    def test_mixed_mesh_shapes(self, data):
        X, Y = data
        mesh = make_pls_mesh(rows=4, folds=2)
        ref = pt.fit(X, Y, 3)
        sh = fit_sharded(X, Y, 3, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(sh)), np.asarray(pt.coefficients(ref)),
            atol=1e-10,
        )


class TestShardedCV:
    def test_lso_sharded_equals_local(self, data):
        X, Y = data
        N = X.shape[0]
        mesh = make_pls_mesh(rows=1, folds=8)
        rng = np.random.default_rng(3)
        trials = 16
        parts = jnp.asarray(np.stack([rng.permutation(N) for _ in range(trials)]))
        train_size = 48
        sh = cv_lso_sharded(X, Y, 4, parts, train_size, mesh=mesh)
        local = pt.cv_lso(
            X, Y, 4, (N - train_size) / N, trials, partitions=parts
        )
        np.testing.assert_allclose(
            np.asarray(sh.errors), np.asarray(local.errors), atol=1e-10
        )

    def test_lso_rowsharded_equals_local(self, data):
        """Row-sharded LSO (X never replicated) == local cv_lso."""
        from pls_tpu.parallel import cv_lso_rowsharded

        X, Y = data
        N = X.shape[0]
        mesh = make_pls_mesh(rows=8, folds=1)
        rng = np.random.default_rng(11)
        trials = 6
        parts = jnp.asarray(np.stack([rng.permutation(N) for _ in range(trials)]))
        train_size = 48
        sh = cv_lso_rowsharded(
            X, Y, 4, parts, train_size, mesh=mesh, trial_batch=2
        )
        local = pt.cv_lso(
            X, Y, 4, (N - train_size) / N, trials, partitions=parts
        )
        np.testing.assert_allclose(
            np.asarray(sh.errors), np.asarray(local.errors), atol=1e-10
        )


class TestTrainStep:
    def test_composed_step(self, data):
        X, Y = data
        mesh = make_pls_mesh(rows=4, folds=2)
        rng = np.random.default_rng(5)
        parts = jnp.asarray(np.stack([rng.permutation(64) for _ in range(8)]))
        f, press = train_step(X, Y, 4, parts, 48, mesh=mesh)
        assert press.shape == (3, 4)
        assert np.all(np.isfinite(np.asarray(press)))
        # fit part must equal the unsharded fit
        ref = pt.fit(X, Y, 4)
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(f)), np.asarray(pt.coefficients(ref)),
            atol=1e-10,
        )


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (256, 8)

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestShardedLOO:
    def test_loo_sharded_equals_local(self, data):
        from pls_tpu.parallel import cv_loo_sharded

        X, Y = data
        mesh = make_pls_mesh(rows=1, folds=8)
        sh = cv_loo_sharded(X, Y, 4, mesh=mesh)
        local = pt.cv_loo(X, Y, 4)
        np.testing.assert_allclose(
            np.asarray(sh.errors), np.asarray(local.errors), atol=1e-10
        )


class TestExtendedFamiliesSharded:
    """The extension families run unchanged on row-sharded inputs: their
    fits are jitted pure functions, so GSPMD partitions the X-streaming
    matvecs and inserts the psums — no family-specific sharding code."""

    def _row_shard(self, X, Y, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("rows", None))
        return jax.device_put(X, sh), jax.device_put(Y, sh)

    def test_opls_row_sharded(self, data):
        from pls_tpu.models import opls

        X, Y = data
        mesh = make_pls_mesh(rows=8, folds=1)
        Xs, Ys = self._row_shard(X, Y, mesh)
        ref = opls.fit_opls(X, Y, 2, 1)
        sh = opls.fit_opls(Xs, Ys, 2, 1)
        np.testing.assert_allclose(
            np.asarray(opls.predict(sh, X)), np.asarray(opls.predict(ref, X)),
            atol=1e-10,
        )

    def test_spls_row_sharded(self, data):
        from pls_tpu.models.sparse import fit_spls

        X, Y = data
        mesh = make_pls_mesh(rows=8, folds=1)
        Xs, Ys = self._row_shard(X, Y, mesh)
        ref = fit_spls(X, Y, 2, keep_x=10)
        sh = fit_spls(Xs, Ys, 2, keep_x=10)
        np.testing.assert_allclose(
            np.asarray(sh.W), np.asarray(ref.W), atol=1e-10
        )

    def test_kpls_row_sharded(self, data):
        from pls_tpu.models.kpls import fit_kpls, predict_kpls

        X, Y = data
        mesh = make_pls_mesh(rows=8, folds=1)
        Xs, Ys = self._row_shard(X, Y, mesh)
        ref = fit_kpls(X, Y, 3, "rbf")
        sh = fit_kpls(Xs, Ys, 3, "rbf")
        np.testing.assert_allclose(
            np.asarray(predict_kpls(sh, X)),
            np.asarray(predict_kpls(ref, X)),
            atol=1e-9,
        )

    def test_missing_nipals_row_sharded(self, data):
        from pls_tpu.models.missing import fit_nipals_missing

        X, Y = data
        Xm = np.asarray(X).copy()
        rng = np.random.default_rng(0)
        holes = rng.random(Xm.shape) < 0.05
        holes[0, :] = False
        holes[:, 0] = False
        Xm[holes] = np.nan
        Xm = jnp.asarray(Xm)
        mesh = make_pls_mesh(rows=8, folds=1)
        Xs, Ys = self._row_shard(Xm, Y, mesh)
        ref = fit_nipals_missing(Xm, Y, 3)
        sh = fit_nipals_missing(Xs, Ys, 3)
        np.testing.assert_allclose(
            np.asarray(sh.W), np.asarray(ref.W), atol=1e-9
        )

    def test_mbpls_row_sharded(self, data):
        X, Y = data
        mesh = make_pls_mesh(rows=8, folds=1)
        Xs, Ys = self._row_shard(X, Y, mesh)
        blocks = [X[:, :10], X[:, 10:]]
        blocks_sh = [Xs[:, :10], Xs[:, 10:]]
        ref = pt.fit_mbpls(blocks, Y, 3)
        sh = pt.fit_mbpls(blocks_sh, Ys, 3)
        np.testing.assert_allclose(
            np.asarray(pt.predict_mbpls(sh, blocks)),
            np.asarray(pt.predict_mbpls(ref, blocks)),
            atol=1e-10,
        )

    def test_split_conformal_row_sharded(self, data):
        X, Y = data
        mesh = make_pls_mesh(rows=8, folds=1)
        Xs, Ys = self._row_shard(X, Y, mesh)
        lo_r, hi_r, p_r = pt.split_conformal_intervals(X, Y, X[:5], A=3)
        lo_s, hi_s, p_s = pt.split_conformal_intervals(Xs, Ys, X[:5], A=3)
        np.testing.assert_allclose(np.asarray(lo_s), np.asarray(lo_r), atol=1e-9)
        np.testing.assert_allclose(np.asarray(hi_s), np.asarray(hi_r), atol=1e-9)
        np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_r), atol=1e-9)


class TestRound2FamiliesSharded:
    """Row-sharded agreement for the session's new families: O2PLS,
    calibration transfer, PLS-PM, and the iPLS candidate scorer."""

    def _row_shard(self, *arrays, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("rows", None))
        return tuple(jax.device_put(a, sh) for a in arrays)

    def test_o2pls_row_sharded(self, data):
        from pls_tpu.models.o2pls import fit_o2pls, predict_y

        X, Y = data
        mesh = make_pls_mesh(rows=8, folds=1)
        Xs, Ys = self._row_shard(X, Y, mesh=mesh)
        ref = fit_o2pls(X, Y, n=2, nx=1, ny=1)
        sh = fit_o2pls(Xs, Ys, n=2, nx=1, ny=1)
        np.testing.assert_allclose(
            np.asarray(predict_y(sh, X)), np.asarray(predict_y(ref, X)),
            atol=1e-9,
        )

    def test_pds_row_sharded(self, data):
        from pls_tpu.transfer import apply_transfer, piecewise_ds

        X, _ = data
        slave = X + 0.05 * jnp.sin(jnp.arange(X.shape[1]))[None, :]
        mesh = make_pls_mesh(rows=8, folds=1)
        Xs, Ss = self._row_shard(X, slave, mesh=mesh)
        ref = piecewise_ds(X, slave, window=2, A=3)
        sh = piecewise_ds(Xs, Ss, window=2, A=3)
        np.testing.assert_allclose(
            np.asarray(apply_transfer(sh, slave)),
            np.asarray(apply_transfer(ref, slave)),
            atol=1e-9,
        )

    def test_plspm_row_sharded(self, data):
        from pls_tpu.models.plspm import fit_plspm

        X, _ = data
        Xz = (X - X.mean(0)) / X.std(0)
        blocks = [list(range(8)), list(range(8, 16)), list(range(16, 24))]
        path = np.zeros((3, 3))
        path[1, 0] = path[2, 0] = path[2, 1] = 1
        mesh = make_pls_mesh(rows=8, folds=1)
        (Xs,) = self._row_shard(Xz, mesh=mesh)
        ref = fit_plspm(Xz, blocks, path)
        sh = fit_plspm(Xs, blocks, path)
        np.testing.assert_allclose(
            np.asarray(sh.paths), np.asarray(ref.paths), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(sh.scores), np.asarray(ref.scores), atol=1e-8
        )

    def test_ipls_row_sharded(self, data):
        from pls_tpu.select import ipls

        X, Y = data
        mesh = make_pls_mesh(rows=8, folds=1)
        Xs, Ys = self._row_shard(X, Y, mesh=mesh)
        ref = ipls(X, Y, n_intervals=4, A=3, k=4, key=0)
        sh = ipls(Xs, Ys, n_intervals=4, A=3, k=4, key=0)
        np.testing.assert_allclose(sh.rmsecv, ref.rmsecv, atol=1e-9)
        assert sh.best_interval == ref.best_interval

    def test_colsharded_fit_equals_single(self, data):
        """Column (K) sharding — the huge-K axis: same coefficients as the
        single-device fit; all-reduces are N-sized instead of K-sized."""
        from pls_tpu.parallel import fit_colsharded

        X, Y = data
        mesh = make_pls_mesh(rows=8, folds=1)
        ref = pt.fit(X, Y, 4)
        sh = fit_colsharded(X, Y, 4, mesh=mesh, axis="rows")
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(sh)), np.asarray(pt.coefficients(ref)),
            atol=1e-10,
        )
        # type 2 as well (XX is (K, K)-sharded over both uses)
        ref2 = pt.fit(X, Y, 4, pt.KERNEL_TYPE2)
        sh2 = fit_colsharded(X, Y, 4, pt.KERNEL_TYPE2, mesh=mesh, axis="rows")
        np.testing.assert_allclose(
            np.asarray(pt.coefficients(sh2)), np.asarray(pt.coefficients(ref2)),
            atol=1e-10,
        )


class TestInitializeDistributedRetry:
    """initialize_distributed must retry coordinator races and re-raise
    after exhausting retries (VERDICT r02 weak #7: the old wrapper
    swallowed every RuntimeError, silently degrading to single-process)."""

    def test_already_initialized_is_noop_via_flag(self, monkeypatch):
        """The authoritative path: jax.distributed.is_initialized() True
        means initialize() is never even called."""
        import jax

        from pls_tpu.parallel.mesh import initialize_distributed

        def boom(**kw):  # pragma: no cover - must not be reached
            raise AssertionError("initialize() should not be called")

        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
        monkeypatch.setattr(jax.distributed, "initialize", boom)
        initialize_distributed("127.0.0.1:1", 1, 0)  # no raise

    def test_reinit_race_message_is_noop(self, monkeypatch):
        """Fallback path: the EXACT RuntimeError jax 0.9 raises on a
        second initialize (jax/_src/distributed.py) is treated as a
        no-op — guards the concurrent-init race where is_initialized
        flips between our check and the call."""
        import jax

        from pls_tpu.parallel.mesh import initialize_distributed

        def boom(**kw):
            raise RuntimeError(
                "distributed.initialize should only be called once."
            )

        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
        monkeypatch.setattr(jax.distributed, "initialize", boom)
        initialize_distributed("127.0.0.1:1", 1, 0)  # no raise

    def test_retries_then_raises(self, monkeypatch):
        import jax

        from pls_tpu.parallel.mesh import initialize_distributed

        calls = []

        def boom(**kw):
            calls.append(1)
            raise RuntimeError("connection refused")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="after 3 attempts"):
            initialize_distributed(
                "127.0.0.1:1", 2, 0, retries=2, retry_delay_sec=0.0
            )
        assert len(calls) == 3

    def test_succeeds_after_transient_failure(self, monkeypatch):
        import jax

        from pls_tpu.parallel.mesh import initialize_distributed

        calls = []

        def flaky(**kw):
            calls.append(1)
            if len(calls) < 2:
                raise RuntimeError("coordinator not up yet")

        monkeypatch.setattr(jax.distributed, "initialize", flaky)
        initialize_distributed(
            "127.0.0.1:1", 2, 0, retries=3, retry_delay_sec=0.0
        )
        assert len(calls) == 2

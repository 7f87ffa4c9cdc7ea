"""Generic fit checkpointing round-trips for every fit family."""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt
from pls_tpu.models.kpls import fit_kpls, predict_kpls
from pls_tpu.models.opls import fit_opls, predict as opls_predict
from pls_tpu.utils.checkpoint import load_fit, save_fit


def _roundtrip(fit, tmp_path):
    p = str(tmp_path / "ckpt.npz")
    save_fit(fit, p)
    return load_fit(p)


class TestCheckpoint:
    def test_plsfit(self, toy, tmp_path):
        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        f = pt.fit(X, Y, 2, pt.SIMPLS)
        f2 = _roundtrip(f, tmp_path)
        assert f2.method == pt.SIMPLS
        np.testing.assert_array_equal(np.asarray(f.W), np.asarray(f2.W))
        np.testing.assert_array_equal(
            np.asarray(pt.coefficients(f)), np.asarray(pt.coefficients(f2))
        )

    def test_oplsfit_nested_method(self, nir, tmp_path):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        f = fit_opls(X, Y, 2, 1, pt.KERNEL_TYPE2)
        f2 = _roundtrip(f, tmp_path)
        assert f2.pls.method == pt.KERNEL_TYPE2  # nested static field kept
        np.testing.assert_array_equal(
            np.asarray(opls_predict(f, X)), np.asarray(opls_predict(f2, X))
        )

    def test_kplsfit(self, nir, tmp_path):
        X, Y = nir
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        f = fit_kpls(X, Y, 3, "rbf", gamma=0.01)
        f2 = _roundtrip(f, tmp_path)
        assert f2.kernel == "rbf" and f2.gamma == 0.01
        np.testing.assert_array_equal(
            np.asarray(predict_kpls(f, X)), np.asarray(predict_kpls(f2, X))
        )

    def test_residual(self, toy, tmp_path):
        X, Y = toy
        r = pt.cv_loo(jnp.asarray(X), jnp.asarray(Y), 2)
        r2 = _roundtrip(r, tmp_path)
        assert r2.method == "LOO"
        np.testing.assert_array_equal(
            np.asarray(r.errors), np.asarray(r2.errors)
        )

    def test_unregistered_type_rejected(self, tmp_path):
        with pytest.raises(TypeError):
            save_fit(object(), str(tmp_path / "x.npz"))


class TestOrbaxCheckpoint:
    """Orbax directory-format backend: sharding-aware, multi-host-ready."""

    def test_plsfit_roundtrip(self, toy, tmp_path):
        from pls_tpu.utils.checkpoint import load_fit_orbax, save_fit_orbax

        X, Y = toy
        f = pt.fit(jnp.asarray(X), jnp.asarray(Y), 2, pt.KERNEL_TYPE1)
        p = str(tmp_path / "orbax_ckpt")
        save_fit_orbax(f, p)
        f2 = load_fit_orbax(p)
        assert f2.method == pt.KERNEL_TYPE1
        np.testing.assert_array_equal(np.asarray(f.W), np.asarray(f2.W))
        np.testing.assert_array_equal(
            np.asarray(pt.coefficients(f)), np.asarray(pt.coefficients(f2))
        )

    def test_nested_opls_roundtrip(self, toy, tmp_path):
        from pls_tpu.utils.checkpoint import load_fit_orbax, save_fit_orbax

        X, Y = toy
        X, Y = jnp.asarray(X), jnp.asarray(Y)
        f = fit_opls(X, Y, 1, 2, pt.KERNEL_TYPE2)
        p = str(tmp_path / "orbax_opls")
        save_fit_orbax(f, p)
        f2 = load_fit_orbax(p)
        assert f2.pls.method == pt.KERNEL_TYPE2
        np.testing.assert_array_equal(
            np.asarray(opls_predict(f, X)), np.asarray(opls_predict(f2, X))
        )

    def test_sharded_fit_roundtrip(self, toy, tmp_path):
        """A row-sharded fit's output checkpoints and restores intact."""
        import jax

        from pls_tpu.parallel.mesh import make_pls_mesh
        from pls_tpu.parallel.sharded import fit_sharded
        from pls_tpu.utils.checkpoint import load_fit_orbax, save_fit_orbax

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 virtual devices")
        X, Y = toy
        X = jnp.concatenate([jnp.asarray(X)] * 4)  # 40 rows over 4 shards
        Y = jnp.concatenate([jnp.asarray(Y)] * 4)
        mesh = make_pls_mesh(rows=4, folds=1, devices=jax.devices()[:4])
        f = fit_sharded(X, Y, 2, mesh=mesh)
        p = str(tmp_path / "orbax_sharded")
        save_fit_orbax(f, p)
        f2 = load_fit_orbax(p)
        np.testing.assert_allclose(
            np.asarray(f.W), np.asarray(f2.W), rtol=0, atol=0
        )

    def test_orbax_overwrite(self, toy, tmp_path):
        """Re-saving to the same path overwrites (np.savez semantics)."""
        from pls_tpu.utils.checkpoint import load_fit_orbax, save_fit_orbax

        X, Y = toy
        f1 = pt.fit(jnp.asarray(X), jnp.asarray(Y), 1)
        f2 = pt.fit(jnp.asarray(X), jnp.asarray(Y), 2)
        p = str(tmp_path / "orbax_rw")
        save_fit_orbax(f1, p)
        save_fit_orbax(f2, p)  # must not raise
        got = load_fit_orbax(p)
        assert got.W.shape == f2.W.shape

"""Resumable CV sweep tests (cv/resumable.py) and debug utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt
from pls_tpu.cv.resumable import ResumableCV
from pls_tpu.utils.debug import assert_finite, debug_nans, fit_health
from pls_tpu.utils.gcc_rng import GccRng


class TestResumable:
    def test_lso_ranges_equal_single_run(self, toy, tmp_path):
        X, Y = toy
        parts = GccRng().lso_partitions(10, 20)
        runner = ResumableCV(str(tmp_path / "sweep"))
        res = runner.run_lso(
            jnp.asarray(X), jnp.asarray(Y), 2, 0.3, 20,
            partitions=parts, range_size=8,
        )
        direct = pt.cv_lso(
            jnp.asarray(X), jnp.asarray(Y), 2, 0.3, 20, partitions=parts
        )
        np.testing.assert_allclose(
            np.asarray(res.errors), np.asarray(direct.errors), atol=1e-12
        )
        assert runner.completed_ranges("lso") == [(0, 8), (8, 16), (16, 20)]

    def test_lso_resume_skips_done_ranges(self, toy, tmp_path):
        X, Y = toy
        parts = GccRng().lso_partitions(10, 16)
        runner = ResumableCV(str(tmp_path / "sweep"))
        runner.run_lso(
            jnp.asarray(X), jnp.asarray(Y), 2, 0.3, 16,
            partitions=parts, range_size=8,
        )
        # corrupt a range file's content to a sentinel; resume must NOT
        # recompute it (proves completed ranges are trusted)
        path = runner._range_path("lso", 0, 8)
        sentinel = np.full((2, 8 * 3, 2), 7.0)
        np.savez(path, errors=sentinel)
        res2 = runner.run_lso(
            jnp.asarray(X), jnp.asarray(Y), 2, 0.3, 16,
            partitions=parts, range_size=8,
        )
        np.testing.assert_array_equal(np.asarray(res2.errors)[:, :24], sentinel)

    @pytest.mark.parametrize("downdate", [False, True])
    def test_loo_ranges_equal_single_run(self, toy, tmp_path, downdate):
        X, Y = toy
        method = pt.KERNEL_TYPE2 if downdate else pt.KERNEL_TYPE1
        runner = ResumableCV(str(tmp_path / f"loo{downdate}"))
        res = runner.run_loo(
            jnp.asarray(X), jnp.asarray(Y), 2,
            range_size=4, method=method, downdate=downdate,
        )
        direct = pt.cv_loo(jnp.asarray(X), jnp.asarray(Y), 2, method)
        np.testing.assert_allclose(
            np.asarray(res.errors), np.asarray(direct.errors), atol=1e-9
        )


class TestDebug:
    def test_assert_finite_raises(self):
        with pytest.raises(FloatingPointError):
            assert_finite({"a": jnp.asarray([1.0, jnp.nan])}, "x")
        assert_finite({"a": jnp.asarray([1.0, 2.0])}, "x")  # no raise

    def test_debug_nans_context(self):
        import jax

        prior = jax.config.jax_debug_nans  # may be True under `make nan-check`
        with debug_nans():
            assert jax.config.jax_debug_nans
        assert jax.config.jax_debug_nans == prior  # restores, not clears

    def test_fit_health(self, toy):
        X, Y = toy
        f = pt.fit(jnp.asarray(X), jnp.asarray(Y), 2)
        h = fit_health(f)
        assert h["finite"]
        assert h["score_orthogonality_defect"] < 1e-10
        assert h["ptw_diag_deviation"] < 1e-10
        assert len(h["score_norms"]) == 2


class TestCrashRecovery:
    def test_orphan_tmp_files_ignored_and_cleanable(self, toy, tmp_path):
        """A crash between savez and the atomic rename leaves a *.tmp.npz;
        completed_ranges must skip it and clean_orphans remove it."""
        X, Y = toy
        from pls_tpu.utils.gcc_rng import GccRng

        parts = GccRng().lso_partitions(10, 8)
        runner = ResumableCV(str(tmp_path / "s"))
        runner.run_lso(
            jnp.asarray(X), jnp.asarray(Y), 2, 0.3, 8,
            partitions=parts, range_size=8,
        )
        orphan = runner.dir / "lso_00000008_00000016.tmp.npz"
        np.savez(orphan, errors=np.zeros((2, 1, 2)))
        assert runner.completed_ranges("lso") == [(0, 8)]
        assert runner.clean_orphans() == 1
        assert not orphan.exists()

    def test_resume_after_sigkill_mid_sweep(self, tmp_path):
        """Kill a sweep subprocess MID-RANGE (between savez and the atomic
        rename, the worst spot) and assert the resumed sweep completes
        with errors identical to an uninterrupted run (VERDICT r02 #9)."""
        import os
        import subprocess
        import sys

        sweep_dir = tmp_path / "sweep"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        worker = f"""
import os, signal, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)   # match tests/conftest.py
import numpy as np
from pls_tpu.cv import resumable
from pls_tpu.cv.resumable import ResumableCV

rng = np.random.default_rng(3)
X = rng.normal(size=(24, 6)).astype(np.float64)
Y = rng.normal(size=(24, 2)).astype(np.float64)

saves = []
orig_replace = os.replace
def crashing_replace(src, dst):
    if len(saves) == 2:          # two ranges published, then die
        os.kill(os.getpid(), signal.SIGKILL)   # leaves the .tmp orphan
    orig_replace(src, dst)
    saves.append(dst)
resumable.os.replace = crashing_replace

runner = ResumableCV({str(sweep_dir)!r})
runner.run_loo(X, Y, 3, range_size=8)        # 24 folds -> 3 ranges
print("UNREACHABLE")
"""
        r = subprocess.run(
            [sys.executable, "-c", worker], capture_output=True, text=True,
            timeout=600,
        )
        assert r.returncode == -9, (r.returncode, r.stderr[-2000:])
        assert "UNREACHABLE" not in r.stdout
        # crash state: 2 completed ranges + 1 orphaned tmp
        runner = ResumableCV(str(sweep_dir))
        assert runner.completed_ranges("loo") == [(0, 8), (8, 16)]
        assert runner.clean_orphans() == 1

        rng = np.random.default_rng(3)
        X = rng.normal(size=(24, 6)).astype(np.float64)
        Y = rng.normal(size=(24, 2)).astype(np.float64)
        resumed = runner.run_loo(X, Y, 3, range_size=8)

        fresh = ResumableCV(str(tmp_path / "fresh")).run_loo(
            X, Y, 3, range_size=8
        )
        np.testing.assert_array_equal(
            np.asarray(resumed.errors), np.asarray(fresh.errors)
        )

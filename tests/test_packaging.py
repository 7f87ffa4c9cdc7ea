"""Packaging smoke tests — the intent-level equivalent of the reference's
ctest packaging harness (SURVEY.md §2 #23-26): the library must be fully
importable and drivable from a clean interpreter with only its public
surface, and the console entry point must resolve."""

import subprocess
import sys


def test_public_api_surface():
    import pls_tpu as pt

    for name in pt.__all__:
        assert getattr(pt, name, None) is not None, name


def test_console_script_target():
    # pyproject declares pls = pls_tpu.cli:main
    from pls_tpu.cli import main

    assert callable(main)


def test_clean_interpreter_roundtrip(tmp_path):
    """Consumer-project smoke test: import the package in a fresh process,
    fit, predict, save, reload (mirrors the intent of the reference's
    tests/integration consumer, which no longer even compiles —
    SURVEY.md §4)."""
    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import pls_tpu as pt
rng = np.random.default_rng(0)
X = pt.colwise_z_scores(rng.normal(size=(30, 8)))
Y = pt.colwise_z_scores(rng.normal(size=(30, 2)))
m = pt.PLSModel(X, Y, pt.KERNEL_TYPE1, 3)
assert m.coefficients().shape == (8, 2)
m.save(r"{tmp_path}/m.npz")
m2 = pt.PLSModel.load(r"{tmp_path}/m.npz")
assert np.allclose(np.asarray(m2.coefficients()), np.asarray(m.coefficients()))
print("CONSUMER_OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CONSUMER_OK" in r.stdout


def test_native_extension_optional():
    """The package must work with or without the native extension."""
    from pls_tpu.utils.io import _read_matrix_python

    m = _read_matrix_python("/root/reference/toyX.csv")
    assert m.shape == (10, 15)


def test_bundled_datasets():
    from pls_tpu import datasets

    X, Y = datasets.load_toy()
    assert X.shape == (10, 15) and Y.shape == (10, 2)
    Xn, Yn = datasets.load_nir()
    assert Xn.shape == (60, 401) and Yn.shape == (60, 1)
    Xs, Ys = datasets.make_synthetic(100, 20, 3, seed=1)
    assert Xs.shape == (100, 20) and Ys.shape == (100, 3)


def test_profiler_trace_smoke(tmp_path):
    """utils/profiling: trace context + measure + roofline report."""
    import jax.numpy as jnp

    from pls_tpu.utils import profiling

    def f(x):
        return jnp.sum(x * x)

    import jax

    jf = jax.jit(f)
    x = jnp.ones((256, 256))
    sec = profiling.measure(jf, x, iters=3, warmup=1)
    assert sec > 0
    r = profiling.roofline_report(sec, bytes_accessed=256 * 256 * 4, flops=2 * 256 * 256)
    assert r.achieved_gbps > 0
    assert "GB/s" in str(r)
    with profiling.trace(str(tmp_path / "trace")):
        jf(x).block_until_ready()
    assert any((tmp_path / "trace").rglob("*")), "trace produced no files"

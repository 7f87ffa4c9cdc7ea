"""Packaging smoke tests — the intent-level equivalent of the reference's
ctest packaging harness (SURVEY.md §2 #23-26): the library must be fully
importable and drivable from a clean interpreter with only its public
surface, and the console entry point must resolve."""

import subprocess
import sys

import pytest


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


@pytest.mark.slow
def test_wheel_clean_venv_install(tmp_path):
    """Built-wheel → clean-venv install test (VERDICT r02 #4): the true
    analogue of the reference's ctest packaging harness
    (/root/reference/tests/CMakeLists.txt:1-213 builds, installs into
    fresh prefix trees, and drives a consumer against each).

    Build the wheel, install it with pip --no-index into a freshly
    created venv (--system-site-packages supplies jax/numpy the way the
    reference harness relies on a system Eigen; the INSTALLED pls-tpu is
    the wheel's copy, not the source tree), then drive the console script
    on the bundled datasets and the export path from venv python.
    Fails if package-data, the console-script entry, or wheel metadata
    break."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dist = tmp_path / "dist"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", repo, "--no-deps",
         "--no-build-isolation", "-w", str(dist)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    wheels = list(dist.glob("pls_tpu-*.whl"))
    assert len(wheels) == 1, list(dist.iterdir())

    venv = tmp_path / "venv"
    r = subprocess.run(
        [sys.executable, "-m", "venv", str(venv)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    vpy = str(venv / "bin" / "python")
    # Grant the fresh venv access to the DEV environment's dependency set
    # (jax/numpy) via a .pth — the offline analogue of the reference
    # harness using the system Eigen.  pls_tpu itself is NOT importable
    # from there (verified by the site-packages assertion below): the
    # only copy in the venv is the wheel's.
    import sysconfig

    parent_sp = sysconfig.get_paths()["purelib"]
    site_dir = subprocess.run(
        [vpy, "-c",
         "import sysconfig; print(sysconfig.get_paths()['purelib'])"],
        capture_output=True, text=True, timeout=120,
    ).stdout.strip()
    with open(os.path.join(site_dir, "deps.pth"), "w") as f:
        f.write(parent_sp + "\n")
    r = subprocess.run(
        [vpy, "-m", "pip", "install", "--no-index", "--no-deps",
         str(wheels[0])],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)

    # the installed package must win over the source tree: run from tmp
    # 1) console script end-to-end on the wheel's own bundled data
    script = """
import importlib.resources as ir
import subprocess, sys, os
import pls_tpu
assert "site-packages" in pls_tpu.__file__, pls_tpu.__file__
base = ir.files("pls_tpu") / "data"
r = subprocess.run(
    [os.path.join(os.path.dirname(sys.executable), "pls"),
     str(base / "toyX.csv"), str(base / "toyY.csv"), "2"],
    capture_output=True, text=True, timeout=500,
)
assert r.returncode == 0, r.stderr[-2000:]
assert r.stdout == ""                       # stdout stays empty
assert "0.87824" in r.stderr                # EV@2 (BASELINE.md)
assert "0.791811" in r.stderr               # LOO RMSE y1c1
print("WHEEL_CLI_OK")
"""
    r = subprocess.run(
        [vpy, "-c", script], capture_output=True, text=True, timeout=600,
        env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, (r.stdout, r.stderr[-3000:])
    assert "WHEEL_CLI_OK" in r.stdout

    # 2) library surface + PLSB export from the installed wheel
    script2 = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import pls_tpu as pt
from pls_tpu import datasets
X, Y = datasets.load_toy()
m = pt.PLSModel(pt.colwise_z_scores(X), pt.colwise_z_scores(Y), pt.KERNEL_TYPE1, 2)
path = r"{tmp_path}/model.plsb"
pt.export_model_c(path, m.fit_state)
assert np.fromfile(path, np.uint8).size > 0
assert pt.load_model_c(path)["B_raw"].shape == (15, 2)
print("WHEEL_LIB_OK")
"""
    r = subprocess.run(
        [vpy, "-c", script2], capture_output=True, text=True, timeout=600,
        env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, (r.stdout, r.stderr[-3000:])
    assert "WHEEL_LIB_OK" in r.stdout

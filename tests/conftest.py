"""Test configuration.

Tests run on CPU with 8 virtual XLA host devices (the standard way to test
pjit/psum semantics without a pod — SURVEY.md §4) and x64 enabled for
double-precision parity against the reference's Eigen doubles.  The env
vars must be set before jax is imported anywhere in the process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Some environments pre-register an accelerator plugin from sitecustomize and
# force jax_platforms programmatically; override at the config level (backends
# initialize lazily, so this wins as long as it runs before first device use).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pls_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Loader for golden fixtures generated from the reference library
    (tools/golden_gen.cpp)."""

    def load(name: str) -> np.ndarray:
        return np.loadtxt(GOLDEN / f"{name}.csv", delimiter=",", ndmin=2)

    return load


@pytest.fixture(scope="session")
def toy(golden):
    """Z-scored toy dataset exactly as the reference CLI produces it."""
    return golden("toy_Xz"), golden("toy_Yz")


@pytest.fixture(scope="session")
def nir(golden):
    """Z-scored nir/octane dataset (60x401 X, 60x1 Y)."""
    return golden("nir_Xz"), golden("nir_Yz")

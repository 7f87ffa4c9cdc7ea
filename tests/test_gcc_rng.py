"""Bit-exactness of the GCC RNG compatibility layer.

Fixtures (tests/golden/mt19937_raw.csv, shuffle*.csv, *_lso_parts.csv)
were produced by running real libstdc++ code (tools/golden_gen.cpp), so
these tests pin the emulator to the exact std::mt19937 +
libstdc++-std::shuffle bit stream the reference CLI consumes.
"""

import numpy as np
import pytest

from pls_tpu.utils.gcc_rng import MT19937, GccRng


def test_mt19937_raw_stream(golden):
    gold = golden("mt19937_raw").ravel().astype(np.uint64)
    g = MT19937()
    mine = np.array([g() for _ in range(len(gold))], dtype=np.uint64)
    np.testing.assert_array_equal(mine, gold)


@pytest.mark.parametrize("n", [7, 10, 60, 128])
def test_shuffle_matches_libstdcxx(golden, n):
    gold = golden(f"shuffle{n}").astype(int)
    r = GccRng()
    v = list(range(n))
    for rep in range(gold.shape[0]):
        r.shuffle(v)
        np.testing.assert_array_equal(np.array(v), gold[rep])


@pytest.mark.parametrize(
    "name,n,trials", [("toy", 10, 100), ("nir", 60, 600)]
)
def test_lso_partitions(golden, name, n, trials):
    gold = golden(f"{name}_lso_parts").astype(int)
    parts = GccRng().lso_partitions(n, trials)
    np.testing.assert_array_equal(parts, gold)


def test_statefulness_across_calls():
    """The generator state persists across calls on one GccRng (like the
    reference's `std::mt19937&` threading into cv_LSO), while the index
    vector resets per call (cv_LSO builds a fresh iota each invocation —
    pls.cpp:524-525)."""
    a = GccRng()
    p1 = a.lso_partitions(10, 30)
    p2 = a.lso_partitions(10, 30)
    # state advanced: second call differs from a fresh-seed first call
    assert not np.array_equal(p1, p2)
    # fresh instance reproduces the first call exactly
    np.testing.assert_array_equal(GccRng().lso_partitions(10, 30), p1)
    # and the raw stream position after two calls matches a manual replay
    b = GccRng()
    for _ in range(2):
        v = list(range(10))
        for _ in range(30):
            b.shuffle(v)
    assert a.raw() == b.raw()


def test_native_extension_agrees_if_built():
    """If the native C++ extension is built (real libstdc++ std::shuffle),
    it must agree with the Python emulator."""
    _native = pytest.importorskip("pls_tpu._native")
    parts = _native.gcc_shuffle_trace(5489, 60, 100)
    mine = GccRng(5489).lso_partitions(60, 100)
    np.testing.assert_array_equal(np.asarray(parts), mine)

"""Error-free transforms & compensated accumulation (ops/twofloat.py) —
the MPFR-analogue precision escape hatch (DEVIATIONS.md #7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.models.streaming import StatsAccumulator
from pls_tpu.ops.twofloat import (
    cross_products,
    dd_sum,
    two_prod,
    two_sum,
)

F32 = jnp.float32


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=1024) * 1e6, F32)
    b = jnp.asarray(rng.normal(size=1024), F32)
    s, e = two_sum(a, b)
    # s + e must equal a + b EXACTLY (verifiable in f64: all quantities
    # are f32, so the f64 sums below are themselves exact)
    lhs = s.astype(jnp.float64) + e.astype(jnp.float64)
    rhs = a.astype(jnp.float64) + b.astype(jnp.float64)
    assert bool(jnp.all(lhs == rhs))
    # and s is the correctly-rounded f32 sum
    assert bool(jnp.all(s == (a + b)))


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=1024) * 37.0, F32)
    b = jnp.asarray(rng.normal(size=1024) * 0.013, F32)
    p, e = two_prod(a, b)
    lhs = p.astype(jnp.float64) + e.astype(jnp.float64)
    rhs = a.astype(jnp.float64) * b.astype(jnp.float64)  # exact in f64
    assert bool(jnp.all(lhs == rhs))


def test_dd_sum_beats_naive():
    # ill-conditioned: large mean, small variance -> naive f32 sum loses
    rng = np.random.default_rng(2)
    x64 = 1000.0 + rng.normal(size=200_000)
    x = jnp.asarray(x64, F32)
    exact = np.sum(x64.astype(np.float32).astype(np.float64))
    hi, lo = dd_sum(x)
    dd_err = abs(float(hi) + float(lo) - exact)
    naive_err = abs(float(jnp.sum(x)) - exact)
    # compensated sum is exact to ~n*eps^2 * sum|x| ≈ 0.14 here; the f32
    # ulp at this magnitude is 16, so anything under one ulp is "exact"
    assert dd_err < 1.0
    assert dd_err <= naive_err + 1.0


@pytest.mark.parametrize("chunk", [64, 1024])
def test_cross_products_compensated(chunk):
    rng = np.random.default_rng(3)
    N, K, M = 8192, 12, 3
    X64 = 50.0 + rng.normal(size=(N, K))
    Y64 = -20.0 + rng.normal(size=(N, M))
    X = jnp.asarray(X64.astype(np.float32), F32)
    Y = jnp.asarray(Y64.astype(np.float32), F32)
    # exact f64 ground truth of the f32-rounded data
    XXe = X64.astype(np.float32).astype(np.float64).T @ X64.astype(np.float32).astype(np.float64)
    XYe = X64.astype(np.float32).astype(np.float64).T @ Y64.astype(np.float32).astype(np.float64)

    xx_hi, xx_lo, xy_hi, xy_lo = cross_products(X, Y, chunk=chunk)
    xx = np.asarray(xx_hi, np.float64) + np.asarray(xx_lo, np.float64)
    xy = np.asarray(xy_hi, np.float64) + np.asarray(xy_lo, np.float64)

    # sequential plain-f32 chunk accumulation (what a streaming pass
    # without compensation does)
    naive_xx = np.zeros((K, K), np.float32)
    naive_xy = np.zeros((K, M), np.float32)
    Xn = np.asarray(X)
    Yn = np.asarray(Y)
    for i in range(0, N, chunk):
        naive_xx += Xn[i : i + chunk].T @ Xn[i : i + chunk]
        naive_xy += Xn[i : i + chunk].T @ Yn[i : i + chunk]

    comp_err = np.max(np.abs(xx - XXe) / np.abs(XXe))
    naive_err = np.max(np.abs(naive_xx.astype(np.float64) - XXe) / np.abs(XXe))
    # the compensated error floor is the per-chunk matmul rounding —
    # N-independent (~f32 eps); the naive error grows with chunk count
    assert comp_err < 3e-7
    if chunk == 64:  # 128 chunks: accumulation error dominates the naive path
        assert comp_err < naive_err / 4
        comp_err_xy = np.max(np.abs(xy - XYe) / np.maximum(np.abs(XYe), 1.0))
        naive_err_xy = np.max(
            np.abs(naive_xy.astype(np.float64) - XYe) / np.maximum(np.abs(XYe), 1.0)
        )
        assert comp_err_xy < naive_err_xy / 4


def test_stats_accumulator_compensated_matches_and_merges():
    rng = np.random.default_rng(4)
    N, K, M, chunk = 4096, 8, 2, 64
    X = (100.0 + rng.normal(size=(N, K))).astype(np.float32)
    Y = rng.normal(size=(N, M)).astype(np.float32)
    exact = X.astype(np.float64).T @ X.astype(np.float64)

    acc = StatsAccumulator(K, M, jnp.float32, compensated=True)
    plain = StatsAccumulator(K, M, jnp.float32)
    for i in range(0, N, chunk):
        acc.update(X[i : i + chunk], Y[i : i + chunk])
        plain.update(X[i : i + chunk], Y[i : i + chunk])
    comp = np.asarray(acc.XX, np.float64) + np.asarray(acc.XXe, np.float64)
    comp_err = np.max(np.abs(comp - exact))
    plain_err = np.max(np.abs(np.asarray(plain.XX, np.float64) - exact))
    assert comp_err < plain_err / 4
    assert int(acc.n) == N

    # shard merge (psum analogue): two half-accumulators == one full
    a1 = StatsAccumulator(K, M, jnp.float32, compensated=True)
    a2 = StatsAccumulator(K, M, jnp.float32, compensated=True)
    for i in range(0, N // 2, chunk):
        a1.update(X[i : i + chunk], Y[i : i + chunk])
    for i in range(N // 2, N, chunk):
        a2.update(X[i : i + chunk], Y[i : i + chunk])
    a1.merge(a2)
    merged = np.asarray(a1.XX, np.float64) + np.asarray(a1.XXe, np.float64)
    assert np.max(np.abs(merged - exact)) < plain_err / 4

    with pytest.raises(ValueError):
        a1.merge(plain)


def test_compensated_fit_matches_f64():
    """End to end: f32 compensated stats -> fit agrees with the f64 fit
    far better than plain-f32 stats do."""
    from pls_tpu.models.kernel_pls import fit_from_stats

    rng = np.random.default_rng(5)
    N, K, M, A = 16384, 10, 2, 4
    X = (10.0 + rng.normal(size=(N, K))).astype(np.float32)
    B_true = rng.normal(size=(K, M))
    Y = (X @ B_true + 0.01 * rng.normal(size=(N, M))).astype(np.float32)

    X64, Y64 = X.astype(np.float64), Y.astype(np.float64)
    ref = fit_from_stats(jnp.asarray(X64.T @ X64), jnp.asarray(X64.T @ Y64), A)

    xx_hi, xx_lo, xy_hi, xy_lo = cross_products(
        jnp.asarray(X), jnp.asarray(Y), chunk=128
    )
    f_comp = fit_from_stats(xx_hi, xy_hi, A)

    naive_xx = np.zeros((K, K), np.float32)
    naive_xy = np.zeros((K, M), np.float32)
    for i in range(0, N, 128):
        naive_xx += X[i : i + 128].T @ X[i : i + 128]
        naive_xy += X[i : i + 128].T @ Y[i : i + 128]
    f_naive = fit_from_stats(jnp.asarray(naive_xx), jnp.asarray(naive_xy), A)

    def werr(f):
        # weights are sign-ambiguous per column; compare |W|
        return np.max(np.abs(np.abs(np.asarray(f.W)) - np.abs(np.asarray(ref.W))))

    assert werr(f_comp) < werr(f_naive)


@pytest.mark.slow
def test_compensated_error_is_n_independent_at_scale():
    """MPFR-analogue at scale (VERDICT r02 #6): stream 2M rows and check
    the compensated XᵀX error sits far below plain f32 accumulation and
    does not grow with N.  The full 10⁷-row curves are recorded in
    benchmarks/results/precision_at_scale_10M_*.json
    (tools/precision_at_scale.py); reference escape hatch analogue:
    /root/reference/include/PLS/pls.h:11-28."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "precision_at_scale", os.path.join(repo, "tools", "precision_at_scale.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    report = mod.run(n_total=2_000_000, chunk=16384, K=32, M=2, seed=0)
    curves = report["curves"]
    first, last = curves[0], curves[-1]
    # compensated: flat (or shrinking) relative error, well under plain
    assert last["xx_err_comp"] <= 2 * first["xx_err_comp"]
    assert last["xx_err_comp"] < 0.25 * last["xx_err_plain"]
    assert last["xx_err_comp"] < 1e-7
    # plain f32: error accumulates with chunk count
    assert last["xx_err_plain"] > 1.5 * first["xx_err_plain"]


class TestDDVectorOps:
    """The dd vector/matrix helpers behind the full double-float fit
    (precision="dd") — each checked against float64 ground truth."""

    def _pair(self, rng, shape):
        v = rng.normal(size=shape)
        hi = v.astype(np.float32)
        lo = (v - hi.astype(np.float64)).astype(np.float32)
        return jnp.asarray(hi), jnp.asarray(lo), v

    def test_div_sqrt(self):
        from pls_tpu.ops.twofloat import dd_div, dd_sqrt

        rng = np.random.default_rng(1)
        xh, xl, x = self._pair(rng, (64,))
        yh, yl, y = self._pair(rng, (64,))
        y = np.abs(y) + 0.5
        yh = jnp.abs(yh) + 0.5
        qh, ql = dd_div(xh, xl, yh, yl * 0)
        ref = x / np.asarray(yh, np.float64)
        np.testing.assert_allclose(
            np.asarray(qh, np.float64) + np.asarray(ql, np.float64),
            ref, rtol=1e-13)
        sh, sl = dd_sqrt(jnp.abs(xh), xl * 0)
        np.testing.assert_allclose(
            np.asarray(sh, np.float64) + np.asarray(sl, np.float64),
            np.sqrt(np.abs(np.asarray(xh, np.float64))), rtol=1e-13)

    def test_reduce_matches_f64(self):
        from pls_tpu.ops.twofloat import dd_reduce_sum

        rng = np.random.default_rng(2)
        xh, xl, x = self._pair(rng, (1000,))
        h, l = dd_reduce_sum(xh, xl, axis=0)
        ref = x.sum()
        got = float(h) + float(l)
        assert abs(got - ref) <= 1e-11 * abs(ref) + 1e-12

    def test_matvec_exact_products(self):
        from pls_tpu.ops.twofloat import dd_matvec, dd_matvec_t

        rng = np.random.default_rng(3)
        A = rng.normal(size=(37, 53)).astype(np.float32)
        xh, xl, x = self._pair(rng, (53,))
        vh, vl = dd_matvec(jnp.asarray(A), None, xh, xl)
        ref = A.astype(np.float64) @ (
            np.asarray(xh, np.float64) + np.asarray(xl, np.float64))
        np.testing.assert_allclose(
            np.asarray(vh, np.float64) + np.asarray(vl, np.float64),
            ref, rtol=1e-12)
        yh, ylo, y = self._pair(rng, (37,))
        uh, ul = dd_matvec_t(jnp.asarray(A), None, yh, ylo)
        ref_t = A.astype(np.float64).T @ (
            np.asarray(yh, np.float64) + np.asarray(ylo, np.float64))
        np.testing.assert_allclose(
            np.asarray(uh, np.float64) + np.asarray(ul, np.float64),
            ref_t, rtol=1e-12)

    def test_cross_is_near_exact(self):
        from pls_tpu.ops.twofloat import dd_cross

        rng = np.random.default_rng(4)
        X = rng.normal(size=(200, 17)).astype(np.float32)
        Y = rng.normal(size=(200, 3)).astype(np.float32)
        h, l = dd_cross(jnp.asarray(X), jnp.asarray(Y))
        ref = X.astype(np.float64).T @ Y.astype(np.float64)
        np.testing.assert_allclose(
            np.asarray(h, np.float64) + np.asarray(l, np.float64),
            ref, rtol=1e-12)


def test_dd_gram_blocked_matches_f64():
    """dd_gram (row-blocked exact XᵀX) must match the f64 Gram to pair
    precision — including when N is not a block multiple (zero-padded
    tail) and with a tiny block size forcing many scan steps."""
    from pls_tpu.ops.twofloat import dd_gram

    rng = np.random.default_rng(11)
    X = (rng.normal(size=(103, 17)) * 10 ** rng.uniform(-2, 2, size=(1, 17))
         ).astype(np.float32)
    ref = X.astype(np.float64).T @ X.astype(np.float64)
    for block in (None, 7, 103, 1000):
        h, l = dd_gram(jnp.asarray(X), block_rows=block)
        got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 1e-12, (block, rel)


def test_fit_dd_type2_uses_blocked_gram():
    """fit_dd(type1=False) must agree with the f64 type-2 fit (the old
    unblocked formulation OOM'd at modest N·K²; correctness of the
    blocked path is what this pins)."""
    from pls_tpu.models.kernel_dd import fit_dd
    from pls_tpu.models.kernel_pls import fit
    from pls_tpu.models.predict import coefficients
    from pls_tpu.types import METHOD

    rng = np.random.default_rng(3)
    X = rng.normal(size=(96, 12)).astype(np.float32)
    Y = (X @ rng.normal(size=(12, 2)) + 0.05 * rng.normal(size=(96, 2))
         ).astype(np.float32)
    f_dd = fit_dd(jnp.asarray(X), jnp.asarray(Y), 4, type1=False)
    B_dd = np.asarray(coefficients(f_dd), np.float64)
    # f32 HIGHEST fit as the comparison anchor (f64 needs x64 mode)
    f_ref = fit(jnp.asarray(X), jnp.asarray(Y), 4,
                METHOD.KERNEL_TYPE2, precision="highest")
    B_ref = np.asarray(coefficients(f_ref), np.float64)
    rel = np.abs(B_dd - B_ref).max() / np.abs(B_ref).max()
    assert rel < 1e-4, rel

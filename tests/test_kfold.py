"""K-fold / leave-group-out CV (cv/kfold.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.cv.kfold import (
    cv_group,
    cv_kfold,
    cv_kfold_downdate,
    kfold_assignments,
)
from pls_tpu.cv.loo import cv_loo
from pls_tpu.cv.validation import optimal_num_components, validation
from pls_tpu.models.kernel_pls import fit
from pls_tpu.models.predict import residuals_all_components
from pls_tpu.types import MSE


def test_assignments_balanced_and_seeded():
    a = kfold_assignments(23, 5, key=0)
    counts = np.bincount(np.asarray(a), minlength=5)
    assert counts.max() - counts.min() <= 1
    b = kfold_assignments(23, 5, key=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = kfold_assignments(23, 5, key=1)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_kfold_equals_loo_when_k_is_n(toy):
    X, Y = toy
    r_loo = cv_loo(X, Y, 2)
    r_k = cv_kfold(X, Y, 2, k=X.shape[0], key=None)
    np.testing.assert_allclose(
        np.asarray(r_k.errors), np.asarray(r_loo.errors), atol=1e-10
    )
    assert r_k.method == "10-FOLD"


def test_kfold_matches_manual_refits(toy):
    """Each row's recorded error must equal a from-scratch fit on the
    complement of its fold."""
    X, Y = toy
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    N = X.shape[0]
    k, A = 3, 2
    assign = np.asarray(kfold_assignments(N, k, key=42))
    r = cv_kfold(X, Y, A, k=k, assignments=jnp.asarray(assign))
    for fid in range(k):
        keep = assign != fid
        f = fit(X[keep], Y[keep], A)
        res = residuals_all_components(f, X[~keep], Y[~keep])  # (h, A, M)
        got = np.asarray(r.errors)[:, ~keep, :]  # (M, h, A)
        np.testing.assert_allclose(
            got, np.transpose(np.asarray(res), (2, 0, 1)), atol=1e-9
        )


def test_kfold_feeds_validation_stack(nir):
    X, Y = nir
    r = cv_kfold(X, Y, 6, k=5, key=7)
    press = validation(r, MSE)
    assert press.shape == (1, 6)
    opt = optimal_num_components(r)
    assert 1 <= int(opt[0]) <= 6


def test_kfold_validates_k(toy):
    X, Y = toy
    with pytest.raises(ValueError):
        cv_kfold(X, Y, 2, k=1)
    with pytest.raises(ValueError):
        cv_kfold(X, Y, 2, k=X.shape[0] + 1)


class TestOnePassKFold:
    """The closed-form one-pass k-fold scheme (VERDICT r04 #1): per-fold
    statistics from one data pass, PRESS in statistics space, per-row
    errors from one combined residual sweep."""

    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(11)
        X = rng.normal(size=(120, 16)).astype(np.float32)
        Y = (X @ rng.normal(size=(16, 3)) + 0.3 * rng.normal(size=(120, 3))
             ).astype(np.float32)
        # z-score as the pipeline does
        X = (X - X.mean(0)) / X.std(0, ddof=1)
        Y = (Y - Y.mean(0)) / Y.std(0, ddof=1)
        k = 5
        assign = np.asarray(kfold_assignments(120, k, key=3))
        return X.astype(np.float32), Y.astype(np.float32), k, assign

    def _fold_stats(self, X, Y, k, assign, chunk=37, **kw):
        from pls_tpu.models.streaming import FoldStatsAccumulator

        acc = FoldStatsAccumulator(X.shape[1], Y.shape[1], k, **kw)
        for s in range(0, X.shape[0], chunk):
            acc.update(X[s:s + chunk], Y[s:s + chunk], assign[s:s + chunk])
        return acc

    def test_fold_stats_match_brute_force(self, data):
        X, Y, k, assign = data
        acc = self._fold_stats(X, Y, k, assign)
        for f in range(k):
            Xf, Yf = X[assign == f], Y[assign == f]
            np.testing.assert_allclose(
                np.asarray(acc.XXf[f]), Xf.T @ Xf, rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(acc.XYf[f]), Xf.T @ Yf, rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(acc.YYf[f]), Yf.T @ Yf, rtol=1e-5, atol=1e-4)
            assert int(acc.nf[f]) == Xf.shape[0]
        # global = fold sums
        np.testing.assert_allclose(
            np.asarray(acc.XX), X.T @ X, rtol=1e-5, atol=1e-4)
        assert int(acc.n) == X.shape[0]

    def test_single_fold_fast_path_matches_masked(self, data):
        """Chunks whose rows all share a fold take the 1x-flops update;
        results must equal the masked-scan path exactly."""
        X, Y, k, _ = data
        # contiguous partition -> most chunks uniform, boundaries mixed
        assign = (np.arange(X.shape[0]) * k // X.shape[0]).astype(np.int32)
        fast = self._fold_stats(X, Y, k, assign, chunk=24)  # uniform chunks
        ref = self._fold_stats(X, Y, k, assign, chunk=X.shape[0])  # one mixed
        np.testing.assert_allclose(
            np.asarray(fast.XXf), np.asarray(ref.XXf), rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(fast.nf), np.asarray(ref.nf))

    def test_fold_stats_merge(self, data):
        X, Y, k, assign = data
        whole = self._fold_stats(X, Y, k, assign)
        h = X.shape[0] // 2
        a = self._fold_stats(X[:h], Y[:h], k, assign[:h])
        b = self._fold_stats(X[h:], Y[h:], k, assign[h:])
        a.merge(b)
        np.testing.assert_allclose(
            np.asarray(a.XXf), np.asarray(whole.XXf), rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(a.nf), np.asarray(whole.nf))

    def test_closed_form_press_matches_residual_based(self, data):
        """The VERDICT done-criterion: agreement with the residual-based
        path pinned to <= 1e-5 relative."""
        from pls_tpu.cv.kfold import cv_kfold_downdate, cv_kfold_onepass

        X, Y, k, assign = data
        acc = self._fold_stats(X, Y, k, assign)
        got = cv_kfold_onepass(acc, A=6)
        ref = cv_kfold_downdate(
            jnp.asarray(X), jnp.asarray(Y), 6, k=k, assignments=assign)
        press_ref = np.asarray(validation(ref))  # (M, A) RESS sums
        np.testing.assert_allclose(got.press, press_ref, rtol=1e-5)
        np.testing.assert_allclose(
            got.rmse, np.sqrt(press_ref / X.shape[0]), rtol=1e-5)

    def test_residual_chunk_matches_cv_kfold(self, data):
        from pls_tpu.cv.kfold import (
            cv_kfold, cv_kfold_onepass, fold_residual_chunk)

        X, Y, k, assign = data
        acc = self._fold_stats(X, Y, k, assign)
        summary = cv_kfold_onepass(acc, A=6)
        errs = np.concatenate([
            np.asarray(fold_residual_chunk(
                summary.B, jnp.asarray(X[s:s + 50]), jnp.asarray(Y[s:s + 50]),
                jnp.asarray(assign[s:s + 50])))
            for s in range(0, X.shape[0], 50)
        ])  # (N, A, M)
        ref = cv_kfold(jnp.asarray(X), jnp.asarray(Y), 6, k=k,
                       assignments=assign)
        np.testing.assert_allclose(
            np.transpose(errs, (2, 0, 1)), np.asarray(ref.errors),
            rtol=1e-4, atol=1e-4)
        # and the residual-sweep PRESS closes the loop with the
        # closed-form one
        press_sweep = np.sum(errs.astype(np.float64) ** 2, axis=0).T
        np.testing.assert_allclose(summary.press, press_sweep, rtol=1e-5)

    def test_bf16_storage_smoke(self, data):
        from pls_tpu.cv.kfold import cv_kfold_onepass

        X, Y, k, assign = data
        acc = self._fold_stats(X, Y, k, assign, x_storage="bf16")
        got = cv_kfold_onepass(acc, A=4)
        ref = cv_kfold_onepass(self._fold_stats(X, Y, k, assign), A=4)
        np.testing.assert_allclose(got.press, ref.press, rtol=3e-2)


def test_group_cv_matches_manual(toy):
    X, Y = toy
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    N = X.shape[0]
    groups = np.array([10, 10, 10, 7, 7, 7, 3, 3, 3, 3])[:N]
    r = cv_group(X, Y, groups, 2)
    assert r.method == "GROUP"
    for g in np.unique(groups):
        keep = groups != g
        f = fit(X[keep], Y[keep], 2)
        res = residuals_all_components(f, X[~keep], Y[~keep])
        got = np.asarray(r.errors)[:, ~keep, :]
        np.testing.assert_allclose(
            got, np.transpose(np.asarray(res), (2, 0, 1)), atol=1e-9
        )
    with pytest.raises(ValueError):
        cv_group(X, Y, np.zeros(N), 2)


class TestAssignmentValidation:
    """Out-of-range fold labels must raise, not silently give rows
    in-sample errors (masked engine) or drop them from every fold
    (one-pass engine) — r05 review finding."""

    def test_cv_kfold_rejects_out_of_range(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(40, 6)).astype(np.float32)
        Y = rng.normal(size=(40, 1)).astype(np.float32)
        bad = np.arange(40) % 20  # labels for k=20, passed with k=10
        with pytest.raises(ValueError, match=r"\[0, 10\)"):
            cv_kfold(X, Y, 3, k=10, assignments=bad)
        with pytest.raises(ValueError, match=r"\[0, 10\)"):
            cv_kfold_downdate(X, Y, 3, k=10, assignments=bad)
        with pytest.raises(ValueError, match=r"\[0, 10\)"):
            cv_kfold(X, Y, 3, k=10, assignments=bad - 25)  # negative

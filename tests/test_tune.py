"""Grid-search tuning tests: fold bookkeeping, planted-truth recovery."""

import jax
import numpy as np
import pytest

from pls_tpu.estimator import PLSRegressor
from pls_tpu.tune import grid_search_cv, kfold_split, tune_spls_keepx


class TestKFoldSplit:
    def test_partition_properties(self):
        splits = kfold_split(23, 4, jax.random.key(0))
        assert len(splits) == 4
        all_test = np.concatenate([t for _, t in splits])
        assert len(np.unique(all_test)) == len(all_test)  # disjoint tests
        for train, test in splits:
            assert len(test) == 23 // 4
            assert len(np.intersect1d(train, test)) == 0
            assert len(train) + len(test) == 23

    def test_validation(self):
        with pytest.raises(ValueError):
            kfold_split(10, 1)
        with pytest.raises(ValueError):
            kfold_split(10, 11)


class TestGridSearch:
    def test_mechanics_and_underfit_detection(self):
        rng = np.random.default_rng(0)
        n, k = 60, 10
        X = rng.normal(size=(n, k))
        # rank-2 signal: 1 component underfits badly, >=2 suffice
        y = 2 * X[:, 0] - X[:, 1] + 0.05 * rng.normal(size=n)
        best, results = grid_search_cv(
            PLSRegressor,
            {"n_components": [1, 2, 4, 8]},
            X, y, n_folds=5, key=jax.random.key(1),
        )
        assert len(results) == 4
        assert all(r.fold_rmse.shape == (5,) for r in results)
        assert best.rmse == min(r.rmse for r in results)
        by_ncomp = {r.params["n_components"]: r.rmse for r in results}
        assert by_ncomp[2] < by_ncomp[1] / 2  # 1 component underfits
        assert best.params["n_components"] >= 2

    def test_tune_spls_recovers_planted_sparsity(self):
        rng = np.random.default_rng(2)
        n, k = 60, 30
        X = rng.normal(size=(n, k))
        beta = np.zeros(k)
        beta[[4, 11, 19]] = [2.0, -2.0, 1.5]
        y = X @ beta + 0.1 * rng.normal(size=n)
        best, _ = tune_spls_keepx(
            X, y, A=1, keep_grid=[1, 3, 30],
            n_folds=4, key=jax.random.key(3),
        )
        # keep 1 underfits; keep 30 adds noise variables; 3 is the truth
        assert best.params["keep_x"] == 3


class TestNestedCV:
    """Nested (double) CV: selection on inner folds, honest error on
    outer-test rows the selection never saw."""

    def _data(self, seed=5, n=72, k=12):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(n, k))
        # rank-2 signal with mild noise: inner loop should choose >= 2
        Y = np.c_[2 * X[:, 0] - X[:, 1], X[:, 1] + X[:, 2]]
        Y = Y + 0.1 * rng.normal(size=Y.shape)
        return X, Y

    def test_components_wilcoxon(self):
        from pls_tpu.tune import nested_cv_components

        X, Y = self._data()
        res = nested_cv_components(
            X, Y, A_max=6, k_outer=4, k_inner=5, key=7
        )
        assert res.chosen.shape == (4,)
        assert np.all((res.chosen >= 2) & (res.chosen <= 6))
        assert res.fold_rmsep.shape == (4, 2)
        assert res.rmsep.shape == (2,)
        # signal-to-noise ~20: honest RMSEP must still be far below the
        # response scale (~2) and above the noise floor (0.1)
        assert np.all(res.rmsep < 0.5)
        assert np.all(res.rmsep > 0.05)

    def test_components_min_matches_shapes_and_selects_sane(self):
        from pls_tpu.tune import nested_cv_components

        X, Y = self._data(seed=6)
        res = nested_cv_components(
            X, Y, A_max=6, k_outer=3, k_inner=4, select="min", key=8
        )
        assert np.all((res.chosen >= 2) & (res.chosen <= 6))
        with pytest.raises(ValueError, match="select"):
            nested_cv_components(X, Y, A_max=3, select="best")

    def test_generic_nested_grid(self):
        from pls_tpu.tune import nested_grid_search_cv

        X, Y = self._data(seed=9)
        y = Y[:, 0]
        res = nested_grid_search_cv(
            PLSRegressor, {"n_components": [1, 2, 4]},
            X, y, k_outer=3, k_inner=3, key=10,
        )
        assert res.chosen.shape == (3,)
        assert all(c["n_components"] >= 2 for c in res.chosen)
        assert res.rmsep.shape == (1,)
        assert res.rmsep[0] < 0.5

    def test_pooled_rmsep_is_pooled_not_mean_of_folds(self):
        """rmsep pools squared errors over all outer-test rows; with
        equal fold sizes it equals the RMS of fold RMSEPs (not the mean),
        pinning the aggregation rule."""
        from pls_tpu.tune import nested_cv_components

        X, Y = self._data(seed=11, n=60)
        res = nested_cv_components(X, Y, A_max=4, k_outer=3, k_inner=4, key=12)
        rms_of_folds = np.sqrt(np.mean(res.fold_rmsep**2, axis=0))
        np.testing.assert_allclose(res.rmsep, rms_of_folds, rtol=1e-10)


class TestBatchedGridFastPath:
    """grid_search_cv's vmapped fast path for plain PLSRegressor
    factories must agree with the generic estimator loop (r03 verdict
    #7)."""

    def _data(self, seed=0, n=60, k=12, m=2):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(n, k))
        B = rng.normal(size=(k, m))
        Y = X @ B + 0.3 * rng.normal(size=(n, m))
        return X, Y

    def test_matches_slow_path_components_grid(self):
        from pls_tpu.estimator import PLSRegressor
        from pls_tpu.tune import grid_search_cv

        X, Y = self._data()
        key = jax.random.key(4)
        grid = {"n_components": [1, 2, 3, 4, 5, 6]}
        best_f, res_f = grid_search_cv(
            lambda: PLSRegressor(), grid, X, Y, n_folds=5, key=key
        )
        best_s, res_s = grid_search_cv(
            lambda: PLSRegressor(), grid, X, Y, n_folds=5, key=key,
            batched=False,
        )
        assert [r.params for r in res_f] == [r.params for r in res_s]
        for rf, rs in zip(res_f, res_s):
            np.testing.assert_allclose(rf.fold_rmse, rs.fold_rmse, atol=1e-8)
        assert best_f.params == best_s.params

    def test_matches_slow_path_mixed_grid(self):
        import pls_tpu as pt
        from pls_tpu.estimator import PLSRegressor
        from pls_tpu.tune import grid_search_cv

        X, Y = self._data(seed=3)
        key = jax.random.key(9)
        grid = {
            "n_components": [2, 4],
            "method": [pt.KERNEL_TYPE1, pt.KERNEL_TYPE2],
            "scale": [True, False],
        }
        _, res_f = grid_search_cv(
            lambda: PLSRegressor(), grid, X, Y, n_folds=4, key=key
        )
        _, res_s = grid_search_cv(
            lambda: PLSRegressor(), grid, X, Y, n_folds=4, key=key,
            batched=False,
        )
        assert [r.params for r in res_f] == [r.params for r in res_s]
        for rf, rs in zip(res_f, res_s):
            np.testing.assert_allclose(rf.fold_rmse, rs.fold_rmse, atol=1e-8)

    def test_subclass_falls_back_to_generic(self):
        from pls_tpu.estimator import PLSRegressor
        from pls_tpu.tune import grid_search_cv

        calls = []

        class Custom(PLSRegressor):
            def fit(self, X, y, sample_weight=None):
                calls.append(1)
                return super().fit(X, y, sample_weight)

        X, Y = self._data(seed=5)
        grid_search_cv(
            lambda: Custom(), {"n_components": [2, 3]}, X, Y, n_folds=3,
            key=jax.random.key(0),
        )
        # the overridden fit must actually run: 2 settings x 3 folds
        assert len(calls) == 6

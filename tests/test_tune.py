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

"""Kennard–Stone / SPXY / duplex sampling tests.

Exactness is anchored by naive O(N²) numpy reference implementations of
the published algorithms (Kennard & Stone 1969; Galvão 2005; Snee 1977)
— the jax scan/matvec formulation must reproduce their pick sequences
index-for-index (random float data, so argmax ties are measure-zero;
both sides break ties by first index)."""

import numpy as np
import pytest

from pls_tpu.sampling import duplex, kennard_stone, ks_train_test_split, spxy


def _naive_ks(X, n_select):
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    i, j = np.unravel_index(np.argmax(D), D.shape)
    sel = [int(i), int(j)]
    while len(sel) < n_select:
        mind = D[:, sel].min(axis=1)
        mind[sel] = -np.inf
        sel.append(int(np.argmax(mind)))
    return np.asarray(sel)


def _naive_spxy(X, Y, n_select):
    def dmat(Z):
        D = np.sqrt(((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1))
        return D / D.max()

    D = dmat(X) + dmat(Y)
    i, j = np.unravel_index(np.argmax(D), D.shape)
    sel = [int(i), int(j)]
    while len(sel) < n_select:
        mind = D[:, sel].min(axis=1)
        mind[sel] = -np.inf
        sel.append(int(np.argmax(mind)))
    return np.asarray(sel)


class TestKennardStone:
    def test_matches_naive_reference(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(120, 7))
        for n in (2, 5, 30):
            np.testing.assert_array_equal(
                kennard_stone(X, n), _naive_ks(X, n)
            )

    def test_covers_better_than_random(self):
        """Max-min objective: the min distance from any unselected point
        to the KS set beats the same statistic for a random subset."""
        rng = np.random.default_rng(1)
        X = rng.normal(size=(200, 4))
        n = 20
        ks = kennard_stone(X, n)
        rand = rng.choice(200, n, replace=False)

        def fill_dist(sel):
            D = np.sqrt(((X[:, None, :] - X[sel][None, :, :]) ** 2).sum(-1))
            rest = np.setdiff1d(np.arange(200), sel)
            return D[rest].min(axis=1).max()  # worst-covered point

        assert fill_dist(ks) < fill_dist(rand)

    def test_validation(self):
        X = np.zeros((10, 2))
        with pytest.raises(ValueError, match="n_select"):
            kennard_stone(X, 1)
        with pytest.raises(ValueError, match="n_select"):
            kennard_stone(X, 11)

    def test_large_n_blocked_path(self):
        """N not divisible by the 256 row block exercises the wrap
        padding in the farthest-pair streamer."""
        rng = np.random.default_rng(2)
        X = rng.normal(size=(301, 3))
        sel = kennard_stone(X, 4)
        np.testing.assert_array_equal(sel, _naive_ks(X, 4))


class TestSPXY:
    def test_matches_naive_reference(self):
        rng = np.random.default_rng(3)
        X = rng.normal(size=(90, 6))
        Y = rng.normal(size=(90, 2))
        for n in (2, 4, 25):
            np.testing.assert_array_equal(spxy(X, Y, n), _naive_spxy(X, Y, n))

    def test_1d_y_and_validation(self):
        rng = np.random.default_rng(4)
        X = rng.normal(size=(40, 3))
        y = rng.normal(size=40)
        sel = spxy(X, y, 10)
        assert len(np.unique(sel)) == 10
        with pytest.raises(ValueError, match="rows"):
            spxy(X, y[:-1], 5)

    def test_constant_y_degrades_to_kennard_stone(self):
        """A degenerate Y block (max pairwise distance 0) is zeroed out
        rather than divided by ~0: SPXY must equal plain KS on X."""
        rng = np.random.default_rng(8)
        X = rng.normal(size=(60, 5))
        y = np.full(60, 5.0)
        np.testing.assert_array_equal(spxy(X, y, 12), kennard_stone(X, 12))

    def test_far_from_origin_is_stable(self):
        """Centering guards the ‖z‖²-expansion against catastrophic
        cancellation when coordinates sit far from the origin."""
        rng = np.random.default_rng(9)
        X = rng.normal(size=(80, 4))
        np.testing.assert_array_equal(
            kennard_stone(X + 1e6, 10), kennard_stone(X, 10)
        )

    def test_y_changes_selection(self):
        """A response-aligned Y must pull the selection toward extreme-y
        samples relative to plain KS."""
        rng = np.random.default_rng(5)
        X = rng.normal(size=(150, 5))
        y = X[:, 0] * 10  # y range dominated by one direction
        ks = set(kennard_stone(X, 20).tolist())
        sp = set(spxy(X, y, 20).tolist())
        assert ks != sp


class TestDuplex:
    def test_partition_properties(self):
        rng = np.random.default_rng(6)
        X = rng.normal(size=(57, 4))
        cal, val = duplex(X, 30)
        assert len(cal) == 30 and len(val) == 27
        assert len(np.intersect1d(cal, val)) == 0
        assert len(np.union1d(cal, val)) == 57
        # calibration is seeded by the global farthest pair
        D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
        i, j = np.unravel_index(np.argmax(D), D.shape)
        assert {int(i), int(j)} == set(cal[:2].tolist())

    def test_validation(self):
        X = np.zeros((10, 2))
        with pytest.raises(ValueError, match="n_cal"):
            duplex(X, 9)


class TestSplitHelper:
    def test_methods(self):
        rng = np.random.default_rng(7)
        X = rng.normal(size=(50, 3))
        y = rng.normal(size=50)
        tr, te = ks_train_test_split(X, train_size=30)
        assert len(tr) == 30 and len(te) == 20
        assert len(np.intersect1d(tr, te)) == 0
        tr2, te2 = ks_train_test_split(X, y, train_size=30, method="spxy")
        assert len(tr2) == 30
        tr3, te3 = ks_train_test_split(X, train_size=30, method="duplex")
        assert len(tr3) == 30 and len(te3) == 20
        with pytest.raises(ValueError, match="needs Y"):
            ks_train_test_split(X, train_size=10, method="spxy")
        with pytest.raises(ValueError, match="unknown method"):
            ks_train_test_split(X, train_size=10, method="random")

    def test_top_level_exports(self):
        import pls_tpu as pt

        assert pt.kennard_stone is kennard_stone
        assert pt.spxy is spxy
        assert pt.duplex is duplex
        assert pt.ks_train_test_split is ks_train_test_split

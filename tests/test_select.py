"""iPLS interval selection (pls_tpu/select.py).

Key invariant under test: a column-masked fit is arithmetically identical
to fitting on the channel subset, so the batched interval scores must
match brute-force per-subset CV."""

import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu import select
from pls_tpu.cv.kfold import cv_kfold, kfold_assignments
from pls_tpu.cv.validation import MSE, validation
from pls_tpu.models.kernel_pls import fit
from pls_tpu.models.predict import coefficients


def _synthetic(n=48, K=40, informative=(10, 20), seed=0):
    """Y depends only on channels informative[0]:informative[1]."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, K))
    beta = np.zeros(K)
    beta[informative[0] : informative[1]] = rng.normal(size=informative[1] - informative[0])
    y = X @ beta + 0.05 * rng.normal(size=n)
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = (y - y.mean()) / y.std(ddof=1)
    return jnp.asarray(X), jnp.asarray(y[:, None])


def test_interval_edges_balanced():
    e = select.interval_edges(401, 10)
    widths = np.diff(e)
    assert e[0] == 0 and e[-1] == 401
    assert widths.min() >= 40 and widths.max() <= 41
    m = select.interval_masks(401, 10)
    assert m.shape == (10, 401)
    assert np.all(m.sum(axis=0) == 1)  # partition: every channel exactly once


def test_column_mask_equals_subset_fit():
    """Masked-column fit == fit on the sliced X (the invariant iPLS
    batching rests on)."""
    X, y = _synthetic()
    lo, hi = 8, 24
    mask = np.zeros(X.shape[1])
    mask[lo:hi] = 1
    f_masked = fit(X * mask[None, :], y, A=4)
    f_sub = fit(X[:, lo:hi], y, A=4)
    B_masked = np.asarray(coefficients(f_masked))
    B_sub = np.asarray(coefficients(f_sub))
    assert np.allclose(B_masked[lo:hi], B_sub, atol=1e-9)
    assert np.allclose(np.delete(B_masked, slice(lo, hi), axis=0), 0, atol=1e-9)


def test_ipls_finds_informative_interval():
    X, y = _synthetic(informative=(10, 20))
    res = select.ipls(X, y, n_intervals=4, A=4, k=6, key=0)
    # channels 10:20 live in interval 1 of a 4-way split of 40
    assert res.best_interval == 1
    assert res.rmsecv.shape == (4, 4)
    assert res.global_rmsecv.shape == (4,)
    assert "iPLS" in res.summary()


def test_ipls_matches_bruteforce_kfold():
    """Per-interval RMSECV equals running cv_kfold on the sliced X."""
    X, y = _synthetic()
    n_int, A, k = 4, 3, 6
    res = select.ipls(X, y, n_intervals=n_int, A=A, k=k, key=7)
    assign = kfold_assignments(X.shape[0], k, 7)
    edges = res.edges
    for i in range(n_int):
        Xi = X[:, edges[i] : edges[i + 1]]
        r = cv_kfold(X=Xi, Y=y, A=A, k=k, assignments=assign)
        mse = np.asarray(validation(r, MSE))  # (M, A)
        want = np.sqrt(mse.mean(axis=0))
        assert np.allclose(res.rmsecv[i], want, atol=1e-8), i


def test_ipls_forward_selects_signal_then_stops():
    X, y = _synthetic(informative=(10, 20))
    sel = select.ipls_forward(X, y, n_intervals=4, A=4, k=6, key=0)
    assert sel.selected[0] == 1  # first pick is the informative interval
    assert sel.mask.shape == (40,)
    assert sel.n_selected_channels == 10 * len(sel.selected)
    assert sel.ncomp >= 1
    # RMSECV path is non-increasing by construction of the stop rule
    assert all(np.diff(sel.rmsecv_path) <= 1e-12)


def test_ipls_backward_keeps_signal():
    X, y = _synthetic(informative=(10, 20))
    sel = select.ipls_backward(X, y, n_intervals=4, A=4, k=6, key=0)
    assert 1 in sel.selected  # the informative interval survives
    assert sel.mask[10:20].sum() == 10


def test_ipls_validation_errors():
    X, y = _synthetic()
    with pytest.raises(ValueError):
        select.ipls(X, y, n_intervals=20, A=5)  # A > width 2
    with pytest.raises(ValueError):
        select.interval_edges(10, 11)


def test_uve_pls_screens_noise():
    X, y = _synthetic(n=60, K=24, informative=(0, 8), seed=3)
    res = select.uve_pls(X, y, A=6, k=10)
    assert res.reliability.shape == (24,)
    assert res.cutoff > 0
    # most informative variables survive; selection is not everything
    assert res.selected[:8].sum() >= 6
    assert res.selected.sum() < 24
    # LOO variant (k=None) also runs
    res_loo = select.uve_pls(X, y, A=6)
    assert res_loo.selected[:8].sum() >= 6


def test_uve_pls_multi_response():
    """A variable informative for ANY response survives the screen."""
    rng = np.random.default_rng(5)
    n, K = 80, 16
    X = rng.normal(size=(n, K))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y1 = X[:, 0] * 2 + 0.05 * rng.normal(size=n)   # only var 0
    y2 = X[:, 5] * 2 + 0.05 * rng.normal(size=n)   # only var 5
    Y = np.stack([y1, y2], axis=1)
    Y = (Y - Y.mean(0)) / Y.std(0, ddof=1)
    res = select.uve_pls(jnp.asarray(X), jnp.asarray(Y), A=4, k=10)
    assert res.selected[0] and res.selected[5]

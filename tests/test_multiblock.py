"""Multiblock PLS (pls_tpu/models/multiblock.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt


def _blocks(n=50, seed=0):
    """Two informative blocks + one pure-noise block, one y."""
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(n, 2))
    X1 = L @ rng.normal(size=(2, 7)) + 0.1 * rng.normal(size=(n, 7))
    X2 = L @ rng.normal(size=(2, 12)) + 0.1 * rng.normal(size=(n, 12))
    X3 = rng.normal(size=(n, 9))  # noise block
    y = L @ np.array([[1.3], [-0.7]]) + 0.05 * rng.normal(size=(n, 1))
    c = lambda M: (M - M.mean(0)) / M.std(0, ddof=1)
    return [c(X1), c(X2), c(X3)], c(y)


def test_unscaled_equals_concatenated_pls():
    Xs, y = _blocks()
    A = 3
    mb = pt.fit_mbpls(Xs, y, A, block_scale=False)
    plain = pt.fit(jnp.asarray(np.hstack(Xs)), jnp.asarray(y), A)
    for name in ("W", "P", "Q", "R"):
        np.testing.assert_allclose(
            np.asarray(getattr(mb.pls, name)),
            np.asarray(getattr(plain, name)),
            atol=1e-9,
            err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(pt.predict_mbpls(mb, Xs)),
        np.asarray(pt.fitted_values(plain, jnp.asarray(np.hstack(Xs)))),
        atol=1e-9,
    )


def test_block_importance_finds_noise_block():
    Xs, y = _blocks()
    mb = pt.fit_mbpls(Xs, y, 2)
    bip = np.asarray(pt.block_importance(mb))
    assert bip.shape == (3, 2)
    # columns sum to 1 (unit super weights)
    np.testing.assert_allclose(bip.sum(axis=0), 1.0, rtol=1e-6)
    # the noise block carries the least weight on the predictive components
    assert bip[2].max() < bip[0].max() and bip[2].max() < bip[1].max()
    # and on the dominant component it is near-irrelevant
    assert bip[2, 0] < 0.05


def test_block_scores_and_super_scores():
    Xs, y = _blocks(seed=1)
    A = 2
    mb = pt.fit_mbpls(Xs, y, A)
    tb = np.asarray(pt.block_scores(mb, Xs))
    assert tb.shape == (50, 3, A)
    ss = np.asarray(pt.super_scores(mb, Xs))
    np.testing.assert_allclose(ss, np.asarray(mb.pls.T), atol=1e-8)
    # super score lies in the span of the block scores per component:
    # regressing it on [t_1 t_2 t_3] reproduces it to high accuracy for
    # the informative components
    for a in range(A):
        Tb = tb[:, :, a]
        coef, *_ = np.linalg.lstsq(Tb, ss[:, a], rcond=None)
        resid = ss[:, a] - Tb @ coef
        assert np.linalg.norm(resid) < 0.35 * np.linalg.norm(ss[:, a])


def test_block_weights_unit_norm():
    Xs, y = _blocks(seed=2)
    mb = pt.fit_mbpls(Xs, y, 2)
    for Wb in pt.block_weights(mb):
        np.testing.assert_allclose(
            np.sum(np.asarray(Wb) ** 2, axis=0), 1.0, rtol=1e-6
        )


def test_prediction_quality_and_checkpoint(tmp_path):
    Xs, y = _blocks(seed=3)
    mb = pt.fit_mbpls(Xs, y, 2)
    pred = np.asarray(pt.predict_mbpls(mb, Xs))
    r2 = 1 - np.sum((np.asarray(y) - pred) ** 2) / np.sum(np.asarray(y) ** 2)
    assert r2 > 0.95
    p = tmp_path / "mb.npz"
    pt.save_fit(mb, str(p))
    back = pt.load_fit(str(p))
    assert tuple(back.block_sizes) == mb.block_sizes
    np.testing.assert_allclose(
        np.asarray(pt.predict_mbpls(back, Xs)), pred, atol=1e-9
    )

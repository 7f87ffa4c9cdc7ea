"""Calibration transfer (pls_tpu/transfer.py): DS and PDS."""

import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.estimator import PLSRegressor
from pls_tpu.transfer import (
    apply_transfer,
    direct_standardization,
    piecewise_ds,
)


def _instruments(N=120, K=40, seed=0):
    """Master spectra + a slave instrument with gain, baseline and a
    one-channel wavelength shift; y depends on master spectra."""
    rng = np.random.default_rng(seed)
    # smooth underlying spectra: random walk filtered
    raw = np.cumsum(rng.normal(size=(N, K + 4)), axis=1)
    raw = (raw - raw.mean(1, keepdims=True)) / raw.std(1, keepdims=True)
    master = raw[:, 2 : K + 2]
    # slave: shifted by 1 channel, gain 1.15, slope baseline, small noise
    x = np.linspace(0, 1, K)[None, :]
    slave = 1.15 * raw[:, 3 : K + 3] + 0.3 + 0.2 * x
    slave += 0.01 * rng.normal(size=slave.shape)
    beta = rng.normal(size=K) * (rng.uniform(size=K) < 0.2)
    y = master @ beta + 0.05 * rng.normal(size=N)
    return (
        jnp.asarray(master),
        jnp.asarray(slave),
        jnp.asarray(y[:, None]),
    )


def test_ds_recovers_master_space():
    master, slave, _ = _instruments()
    n_t = 60  # transfer subset (>= K so DS is well-posed)
    tm = direct_standardization(master[:n_t], slave[:n_t], ridge=1e-6)
    rec = apply_transfer(tm, slave[n_t:])
    err = float(jnp.linalg.norm(rec - master[n_t:]))
    base = float(jnp.linalg.norm(slave[n_t:] - master[n_t:]))
    assert err < 0.2 * base  # large improvement over no transfer


def test_pds_recovers_master_space_better_than_nothing():
    master, slave, _ = _instruments()
    n_t = 60
    tm = piecewise_ds(master[:n_t], slave[:n_t], window=2, A=5)
    rec = apply_transfer(tm, slave[n_t:])
    err = float(jnp.linalg.norm(rec - master[n_t:]))
    base = float(jnp.linalg.norm(slave[n_t:] - master[n_t:]))
    assert err < 0.2 * base
    # F is banded: nothing outside the window band
    F = np.asarray(tm.F)
    K = F.shape[0]
    ii, jj = np.nonzero(F)
    assert np.all(np.abs(ii - jj) <= 2)


def test_transfer_preserves_master_model_accuracy():
    """The end goal: a master-calibrated PLS model applied to transferred
    slave spectra predicts nearly as well as on native master spectra."""
    master, slave, y = _instruments()
    n_t = 60
    est = PLSRegressor(n_components=8).fit(master[:n_t], y[:n_t])
    tm = piecewise_ds(master[:n_t], slave[:n_t], window=2, A=5)

    def rmse(pred):
        return float(jnp.sqrt(jnp.mean((jnp.asarray(pred) - y[n_t:]) ** 2)))

    r_master = rmse(est.predict(master[n_t:]))
    r_naive = rmse(est.predict(slave[n_t:]))
    r_transfer = rmse(est.predict(apply_transfer(tm, slave[n_t:])))
    assert r_transfer < 0.5 * r_naive  # transfer rescues the model
    assert r_transfer < 3.0 * r_master  # and lands near native accuracy


def test_callable_and_validation():
    master, slave, _ = _instruments(N=20, K=16)
    tm = direct_standardization(master, slave)
    assert np.allclose(
        np.asarray(tm(slave)), np.asarray(apply_transfer(tm, slave))
    )
    with pytest.raises(ValueError):
        direct_standardization(master, slave[:, :8])
    with pytest.raises(ValueError):
        piecewise_ds(master, slave, window=2, A=6)  # A > 2w+1

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


class TestEPO:
    """EPO (Roger 2003): planted-external-effect recovery and
    robustness-under-condition-shift."""

    def _spectra(self, seed=0, n=80, k=50, temp_scale=4.0):
        """Chemistry along v_chem (drives y); an external 'temperature'
        effect along v_temp, with per-sample random temperature."""
        rng = np.random.default_rng(seed)
        v_chem = np.sin(np.linspace(0, 3 * np.pi, k))
        v_temp = np.exp(-0.5 * ((np.arange(k) - k / 3) / 5.0) ** 2)
        v_temp /= np.linalg.norm(v_temp)
        conc = rng.normal(size=n)
        temp = rng.normal(size=n)
        X = (
            np.outer(conc, v_chem)
            + np.outer(temp * temp_scale, v_temp)
            + 0.02 * rng.normal(size=(n, k))
        )
        return X, conc, temp, v_temp

    def test_recovers_planted_direction(self):
        from pls_tpu.transfer import epo, epo_difference_matrix

        X, conc, temp, v_temp = self._spectra()
        # same samples re-measured at shifted temperature
        rng = np.random.default_rng(1)
        dtemp = rng.normal(size=len(temp)) + 2.0
        X2 = X + np.outer(dtemp, v_temp) + 0.02 * rng.normal(size=X.shape)
        D = epo_difference_matrix(X, X2)
        e = epo(D, 1)
        v = np.asarray(e.V[:, 0])
        assert abs(v @ v_temp) > 0.99
        assert float(e.sv_ratio[0]) > 0.9
        # filtered spectra carry ~no variance along the external direction
        Xf = np.asarray(e(X))
        assert np.abs(Xf @ v_temp).max() < np.abs(X @ v_temp).max() * 0.05

    def test_idempotent_and_orthogonal(self):
        from pls_tpu.transfer import epo

        X, _, _, _ = self._spectra(seed=2)
        D = np.random.default_rng(3).normal(size=(10, X.shape[1]))
        e = epo(D, 3)
        Xf = np.asarray(e(X))
        np.testing.assert_allclose(np.asarray(e(Xf)), Xf, atol=1e-8)
        assert np.abs(Xf @ np.asarray(e.V)).max() < 1e-8

    def test_robustness_under_condition_shift(self):
        """The textbook EPO payoff: a PARSIMONIOUS (1-component) model on
        EPO-filtered spectra predicts far better than the unfiltered
        1-component model when test spectra come from a hotter condition
        distribution.  (With enough extra components plain PLS can learn
        to model the external effect itself — EPO buys that robustness
        without spending model rank on it; measured 19x here.)"""
        import jax.numpy as jnp

        import pls_tpu as pt
        from pls_tpu.transfer import epo, epo_difference_matrix

        X, conc, temp, v_temp = self._spectra(seed=4)
        rng = np.random.default_rng(5)
        X2 = X + np.outer(rng.normal(size=len(temp)) * 2, v_temp)
        e = epo(epo_difference_matrix(X, X2), 1)

        # test set: same chemistry model, much stronger temperature term
        Xte, cte, _, _ = self._spectra(seed=6, temp_scale=12.0)

        def rmse(train_X, test_X):
            f = pt.fit(jnp.asarray(train_X), jnp.asarray(conc), 1)
            pred = np.asarray(pt.fitted_values(f, jnp.asarray(test_X)))[:, 0]
            return np.sqrt(np.mean((pred - cte) ** 2))

        raw = rmse(X, Xte)
        filt = rmse(np.asarray(e(X)), np.asarray(e(Xte)))
        assert filt < raw * 0.2

    def test_validation(self):
        from pls_tpu.transfer import epo, epo_difference_matrix

        D = np.zeros((5, 8))
        with pytest.raises(ValueError, match="n_components"):
            epo(D, 6)
        with pytest.raises(ValueError, match=">= 2"):
            epo_difference_matrix(D)
        with pytest.raises(ValueError, match="row-aligned"):
            epo_difference_matrix(D, D[:-1])

    def test_top_level_exports(self):
        import pls_tpu as pt
        from pls_tpu import transfer

        assert pt.epo is transfer.epo
        assert pt.EPOModel is transfer.EPOModel

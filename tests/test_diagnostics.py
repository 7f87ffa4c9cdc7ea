"""Model-space monitoring diagnostics (pls_tpu/models/diagnostics.py):
Hotelling T², SPE/Q residuals, leverage, control limits, MonitorModel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt


@pytest.fixture(scope="module")
def nir_fit():
    from pls_tpu import datasets

    X, y = datasets.load_nir()
    Xz = pt.ZScorer.fit(jnp.asarray(X)).transform(X)
    yz = pt.ZScorer.fit(jnp.asarray(y)).transform(y)
    fit = pt.fit(Xz, yz, 5)
    return fit, Xz, yz


def test_t2_matches_manual(nir_fit):
    fit, Xz, _ = nir_fit
    t2 = np.asarray(pt.hotelling_t2(fit, Xz))
    # manual: scores' Mahalanobis distance with diagonal training variances
    T = np.asarray(Xz @ fit.R)
    s2 = (T**2).sum(axis=0) / (T.shape[0] - 1)
    np.testing.assert_allclose(t2, (T**2 / s2).sum(axis=1), rtol=1e-6)
    # mean training T² is exactly A(N−1)/N for orthogonal-score fits
    N, A = T.shape
    np.testing.assert_allclose(t2.mean(), A * (N - 1) / N, rtol=1e-6)


def test_spe_decreases_with_components(nir_fit):
    fit, Xz, _ = nir_fit
    q_prev = None
    for c in range(1, 6):
        q = float(jnp.sum(pt.spe(fit, Xz, comp=c)))
        if q_prev is not None:
            assert q <= q_prev + 1e-9  # adding components only explains more X
        q_prev = q
    # residuals are orthogonal to the retained loadings' span:
    # E P (through R) == 0 for the deflation geometry
    E = pt.x_residuals(fit, Xz)
    proj = np.asarray(E @ fit.R)
    assert np.abs(proj).max() < 1e-6


def test_leverage_properties(nir_fit):
    fit, Xz, _ = nir_fit
    h = np.asarray(pt.leverage(fit))
    N, A = Xz.shape[0], fit.A
    assert h.shape == (N,)
    assert (h > 0).all() and (h <= 1.0 + 1e-9).all()
    # sum of score-space leverages = A + 1 (trace of the hat pieces)
    np.testing.assert_allclose(h.sum(), A + 1, rtol=1e-6)


def test_limits_monotone_in_alpha(nir_fit):
    fit, Xz, _ = nir_fit
    N, A = Xz.shape[0], fit.A
    assert pt.t2_limit(N, A, 0.01) > pt.t2_limit(N, A, 0.10)
    q = pt.spe(fit, Xz)
    assert pt.spe_limit(q, 0.01) > pt.spe_limit(q, 0.10)
    # false-positive rate on training data is near alpha for T²
    t2 = np.asarray(pt.hotelling_t2(fit, Xz))
    frac_out = (t2 > pt.t2_limit(N, A, 0.05)).mean()
    assert frac_out <= 0.15


def test_monitor_flags_outliers(nir_fit, tmp_path):
    fit, Xz, _ = nir_fit
    mon = pt.fit_monitor(fit, Xz, alpha=0.05)
    res = jax.jit(mon.check)(Xz)
    ok = np.asarray(res["ok"])
    assert ok.mean() > 0.7  # most calibration samples in control

    # gross X-space outlier: noise orthogonal-ish to the spectra manifold
    rng = np.random.default_rng(0)
    bad = np.asarray(Xz[:1]) + rng.normal(scale=5.0, size=(1, Xz.shape[1]))
    res_bad = mon.check(jnp.asarray(bad))
    assert not bool(res_bad["ok"][0])

    # score-space outlier: far along the first latent direction → T² trips
    far = 50.0 * np.asarray(fit.P[:, 0])[None, :]
    res_far = mon.check(jnp.asarray(far))
    assert not bool(res_far["t2_ok"][0])

    # monitor checkpoints like any other fit pytree
    p = tmp_path / "mon.npz"
    pt.save_fit(mon, str(p))
    back = pt.load_fit(str(p))
    res2 = back.check(Xz)
    np.testing.assert_allclose(
        np.asarray(res2["t2"]), np.asarray(res["t2"]), rtol=1e-6
    )
    assert back.alpha == 0.05


def test_estimator_monitor_roundtrip():
    from pls_tpu import datasets
    from pls_tpu.estimator import PLSRegressor

    X, y = datasets.load_nir()
    est = PLSRegressor(n_components=4).fit(X, y)
    est.build_monitor(X)
    res = est.check(X)
    assert np.asarray(res["ok"]).mean() > 0.7
    # raw-unit outlier caught through the estimator's internal scaling
    bad = np.asarray(X[:1]) * 3.0 + 1.0
    assert not bool(est.check(bad)["ok"][0])


def test_t2_without_stored_scores(nir_fit):
    fit, Xz, yz = nir_fit
    f2 = pt.fit(Xz, yz, 5, pt.KERNEL_TYPE2)  # no stored T
    with pytest.raises(ValueError):
        pt.hotelling_t2(f2, Xz)
    t2 = pt.hotelling_t2(f2, Xz, X_train=Xz)
    np.testing.assert_allclose(
        np.asarray(t2), np.asarray(pt.hotelling_t2(fit, Xz)), rtol=1e-4
    )


class TestContributions:
    """Fault-isolation contribution decompositions."""

    def _fit_and_monitor(self, nir):
        X, Y = nir
        X = jnp.asarray(X)
        f = pt.fit(X, jnp.asarray(Y), 5)
        return X, f

    def test_rows_sum_to_statistics(self, nir):
        X, f = self._fit_and_monitor(nir)
        cs = np.asarray(pt.spe_contributions(f, X, 5))
        np.testing.assert_allclose(
            cs.sum(axis=1), np.asarray(pt.spe(f, X, 5)), rtol=1e-10
        )
        ct = np.asarray(pt.t2_contributions(f, X, 5))
        np.testing.assert_allclose(
            ct.sum(axis=1), np.asarray(pt.hotelling_t2(f, X, 5)), rtol=1e-10
        )

    def test_planted_fault_isolated(self, nir):
        X, f = self._fit_and_monitor(nir)
        mon = pt.fit_monitor(f, X, 5)
        Xf = np.asarray(X[:4]).copy()
        Xf[:, 200] += 8.0  # break channel 200 on four samples
        res = mon.check(jnp.asarray(Xf))
        assert not bool(res["ok"].any())
        contrib = mon.contributions(jnp.asarray(Xf))
        # channel 200 is the top SPE contributor on every faulty sample
        assert np.all(np.argmax(np.asarray(contrib["spe"]), axis=1) == 200)
        # and the monitor contributions agree with the functional API
        np.testing.assert_allclose(
            np.asarray(contrib["spe"]),
            np.asarray(pt.spe_contributions(f, jnp.asarray(Xf), 5)),
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(contrib["t2"]).sum(axis=1),
            np.asarray(res["t2"]),
            rtol=1e-10,
        )

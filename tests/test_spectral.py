"""Spectral preprocessing (pls_tpu/spectral.py): SNV, MSC,
Savitzky–Golay, detrend, normalize — validated against scipy/numpy
formulations and on the reference's nir spectra."""

import numpy as np
import pytest
import scipy.signal

from pls_tpu import spectral


@pytest.fixture(scope="module")
def spectra(golden):
    """Raw-ish spectra: the z-scored nir X is fine as a waveform fixture."""
    X = golden("nir_Xz")
    # add synthetic baselines + scatter so the corrections have work to do
    rng = np.random.default_rng(0)
    slope = rng.normal(size=(X.shape[0], 1))
    gain = np.exp(rng.normal(scale=0.2, size=(X.shape[0], 1)))
    x = np.linspace(-1, 1, X.shape[1])[None, :]
    return gain * X + 0.5 * slope * x + rng.normal(scale=0.01, size=X.shape)


def test_snv_rows_standardized(spectra):
    Z = np.asarray(spectral.snv(spectra))
    assert np.allclose(Z.mean(axis=1), 0, atol=1e-10)
    assert np.allclose(Z.std(axis=1, ddof=1), 1, atol=1e-10)


def test_snv_constant_row_zero():
    X = np.vstack([np.full(16, 3.5), np.arange(16.0)])
    Z = np.asarray(spectral.snv(X))
    assert np.all(Z[0] == 0)
    assert np.isfinite(Z).all()


def test_msc_removes_scatter(spectra):
    ref = spectra.mean(axis=0)
    # construct spectra that are exact affine distortions of the reference
    rng = np.random.default_rng(1)
    a = rng.normal(size=(8, 1))
    b = np.abs(rng.normal(size=(8, 1))) + 0.5
    X = a + b * ref[None, :]
    Z = np.asarray(spectral.msc(X, reference=ref))
    assert np.allclose(Z, np.tile(ref, (8, 1)), atol=1e-8)


def test_msc_transformer_train_apply(spectra):
    tr = spectral.MSCorrection().fit(spectra[:40])
    Z_new = tr.transform(spectra[40:])
    assert Z_new.shape == spectra[40:].shape
    # against explicit per-row OLS on [1, ref]
    ref = spectra[:40].mean(axis=0)
    for i in range(3):
        b, a = np.polyfit(ref, spectra[40 + i], 1)
        assert np.allclose(Z_new[i], (spectra[40 + i] - a) / b, atol=1e-8)


@pytest.mark.parametrize("window,poly,deriv", [(11, 2, 0), (11, 2, 1),
                                               (15, 3, 2), (7, 4, 0),
                                               (21, 5, 1)])
def test_savgol_matches_scipy(spectra, window, poly, deriv):
    got = np.asarray(spectral.savgol(spectra, window, poly, deriv, delta=2.0))
    want = scipy.signal.savgol_filter(
        spectra, window, poly, deriv=deriv, delta=2.0, axis=1, mode="interp"
    )
    assert np.allclose(got, want, atol=1e-8)


def test_savgol_coeffs_match_scipy():
    got = spectral.savgol_coeffs(9, 3, deriv=1, delta=0.5)
    want = scipy.signal.savgol_coeffs(9, 3, deriv=1, delta=0.5, use="dot")
    # scipy's 'dot' convention is reversed relative to convolution order;
    # our coefficients are in window order (cross-correlation)
    assert np.allclose(got, want[::-1], atol=1e-12) or np.allclose(
        got, want, atol=1e-12
    )


def test_savgol_validation():
    X = np.zeros((2, 32))
    with pytest.raises(ValueError):
        spectral.savgol(X, 10, 2)  # even window
    with pytest.raises(ValueError):
        spectral.savgol(X, 7, 7)  # polyorder >= window
    with pytest.raises(ValueError):
        spectral.savgol(X, 33, 2)  # window > n_channels


def test_detrend_removes_polynomial_baseline():
    K = 101
    x = np.linspace(0, 1, K)
    base = 3.0 + 2.0 * x[None, :]
    signal = np.sin(8 * np.pi * x)[None, :]
    Z = np.asarray(spectral.detrend(base + signal, order=1))
    Zs = np.asarray(spectral.detrend(signal, order=1))
    assert np.allclose(Z, Zs, atol=1e-8)  # baseline gone, signal invariant


@pytest.mark.parametrize("norm", ["l1", "l2", "max", "area"])
def test_normalize(norm):
    rng = np.random.default_rng(2)
    X = np.abs(rng.normal(size=(6, 50))) + 0.1
    Z = np.asarray(spectral.normalize(X, norm))
    if norm == "l2":
        s = np.linalg.norm(Z, axis=1)
    elif norm == "l1":
        s = np.abs(Z).sum(axis=1)
    elif norm == "max":
        s = np.abs(Z).max(axis=1)
    else:
        s = np.abs(Z.sum(axis=1))
    assert np.allclose(s, 1.0, atol=1e-10)


def test_sklearn_pipeline_integration(spectra, golden):
    """The transformer facades compose in an sklearn Pipeline ahead of
    our PLSRegressor."""
    from sklearn.pipeline import Pipeline

    from pls_tpu.estimator import PLSRegressor

    y = golden("nir_Yz")
    pipe = Pipeline(
        [
            ("sg", spectral.SavitzkyGolay(window=11, polyorder=2, deriv=1)),
            ("snv", spectral.SNV()),
            ("pls", PLSRegressor(n_components=5)),
        ]
    )
    pipe.fit(spectra, y)
    r2 = pipe.score(spectra, y)
    assert r2 > 0.8
    # cloneability (get_params/set_params round-trip)
    from sklearn.base import clone

    pipe2 = clone(pipe)
    pipe2.fit(spectra, y)
    assert np.allclose(pipe2.predict(spectra), pipe.predict(spectra))


def test_apply_chain_tokens(spectra):
    got = np.asarray(spectral.apply_chain(spectra, "savgol:11:2:1,snv"))
    want = np.asarray(spectral.snv(spectral.savgol(spectra, 11, 2, 1)))
    assert np.allclose(got, want, atol=1e-12)
    assert np.allclose(
        np.asarray(spectral.apply_chain(spectra, "detrend:2")),
        np.asarray(spectral.detrend(spectra, 2)),
    )
    with pytest.raises(ValueError):
        spectral.apply_chain(spectra, "wavelet")
    with pytest.raises(ValueError):
        spectral.apply_chain(spectra, "savgol:11")

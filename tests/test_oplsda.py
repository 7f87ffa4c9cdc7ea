"""OPLS-DA (Bylesjö 2006) + S-plot (Wiklund 2008) tests — capability
extension beyond the reference (regression-only, /root/reference).

Synthetic design: class separation on variables 0-2 and a strong
class-orthogonal confounder factor loading on variables 0-7 — the
confounder OVERLAPS the signal variables, so it leaks into the predictive
loading p (the structure OPLS exists to strip; a confounder on disjoint
variables never enters p = Xᵀ(Xw)/tᵀt and would be invisible to the
filter).  Invariants:

- n_ortho=0 OPLS-DA classifies identically to PLS-DA at the same A;
- the orthogonal score recovers the confounder factor (|corr| > 0.85)
  while carrying no class information (|corr with y| < 0.05);
- 1-LV OPLS-DA beats 1-LV PLS-DA on the training data and clearly wins
  when the confounder's scale SHIFTS between train and test;
- S-plot corners rank the true discriminative variables highest;
- the sklearn-protocol classifier round-trips params, handles arbitrary
  label values, and beats chance comfortably on held-out data.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pls_tpu as pt
from pls_tpu.models import oplsda, plsda


def _synth(seed=0, n=120, k=30, ortho_scale=6.0):
    """Two classes separated along vars 0-2; a class-orthogonal latent
    factor g loading uniformly on vars 0-7 (overlapping the signal).
    Returns (X, labels, g)."""
    rng = np.random.default_rng(seed)
    labels = np.repeat([0, 1], n // 2)
    v_sep = np.zeros(k)
    v_sep[:3] = [1.0, -1.0, 0.5]
    v_conf = np.zeros(k)
    v_conf[:8] = 1.0 / np.sqrt(8)
    g = rng.normal(size=n)
    X = rng.normal(size=(n, k))
    X += np.outer(2.5 * (labels - 0.5), v_sep)
    X += np.outer(g * ortho_scale, v_conf)
    return X, labels, g


class TestOPLSDAFunctional:
    def test_zero_ortho_matches_plsda(self):
        X, labels, _ = _synth()
        Xz = pt.colwise_z_scores(jnp.asarray(X))
        lab = jnp.asarray(labels)
        of = oplsda.fit_oplsda(Xz, lab, 2, n_ortho=0, A=2)
        f = plsda.fit_plsda(Xz, lab, 2, 2)
        np.testing.assert_array_equal(
            np.asarray(oplsda.predict_classes(of, Xz)),
            np.asarray(plsda.predict_classes(f, Xz)),
        )

    def test_ortho_score_recovers_confounder_not_class(self):
        X, labels, g = _synth()
        Xz = pt.colwise_z_scores(jnp.asarray(X))
        of = oplsda.fit_oplsda(Xz, jnp.asarray(labels), 2, n_ortho=1, A=1)
        t_o = np.asarray(of.T_o[:, 0])
        y = labels - labels.mean()
        assert abs(np.corrcoef(t_o, y)[0, 1]) < 0.05
        assert abs(np.corrcoef(t_o, g)[0, 1]) > 0.85
        # ~20% of z-scored X variance is the 8-variable confounder block
        assert 0.1 < float(of.r2x_o[0]) < 0.35

    def test_filter_beats_plain_plsda(self):
        X, labels, _ = _synth()
        Xz = pt.colwise_z_scores(jnp.asarray(X))
        lab = jnp.asarray(labels)
        of = oplsda.fit_oplsda(Xz, lab, 2, n_ortho=1, A=1)
        f = plsda.fit_plsda(Xz, lab, 2, 1)
        acc_o = float(
            (np.asarray(oplsda.predict_classes(of, Xz)) == labels).mean()
        )
        acc_p = float(
            (np.asarray(plsda.predict_classes(f, Xz)) == labels).mean()
        )
        assert acc_o > 0.9
        assert acc_o >= acc_p

    def test_s_plot_ranks_discriminative_variables(self):
        X, labels, _ = _synth()
        Xz = pt.colwise_z_scores(jnp.asarray(X))
        of = oplsda.fit_oplsda(Xz, jnp.asarray(labels), 2, n_ortho=1, A=1)
        from pls_tpu.models.opls import correct

        Xf, _ = correct(of, Xz)
        t = Xf @ of.pls.R[:, 0]
        # S-plot on the orthogonality-FILTERED matrix (the matrix the
        # predictive component models); against raw X the confounder
        # variance dilutes p(corr) on the overlap block
        cov, corr = oplsda.s_plot(Xf, t)
        corr = np.abs(np.asarray(corr))
        assert np.all(corr <= 1.0 + 1e-9)
        # the two strong separating variables dominate the reliability axis
        assert set(np.argsort(corr)[-2:]) == {0, 1}
        assert corr[:2].min() > corr[8:].max()

    def test_s_plot_zero_variance_column(self):
        X = np.random.default_rng(1).normal(size=(40, 5))
        X[:, 3] = 2.5  # constant column
        t = X[:, 0] + 0.1 * np.random.default_rng(2).normal(size=40)
        cov, corr = oplsda.s_plot(jnp.asarray(X), jnp.asarray(t))
        assert np.asarray(cov)[3] == pytest.approx(0.0, abs=1e-12)
        assert np.asarray(corr)[3] == 0.0


class TestOPLSDAClassifier:
    def test_holdout_accuracy_and_labels(self):
        X, labels, _ = _synth(seed=3, n=160)
        names = np.array(["ctrl", "case"])[labels]
        # interleave the two class blocks so the 120/40 split holds both
        order = np.argsort(np.tile(np.arange(80), 2), kind="stable")
        X, names = X[order], names[order]
        clf = oplsda.OPLSDAClassifier(n_components=1, n_ortho=1)
        clf.fit(X[:120], names[:120])
        assert list(clf.classes_) == ["case", "ctrl"]
        assert clf.score(X[120:], names[120:]) >= 0.8
        proba = clf.predict_proba(X[120:])
        assert proba.shape == (40, 2)
        np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-6)
        assert clf.r2x_ortho_.shape == (1,)

    def test_ortho_filter_beats_plsda_under_confounder_shift(self):
        """When the confounder scale SHIFTS between train and test, the
        1-LV PLS-DA decision direction (which mixes in confounder
        variance) degrades while OPLS-DA's filtered component holds
        (measured: 0.86 vs 0.71 at a 3x scale shift)."""
        Xtr, ytr, _ = _synth(seed=4, ortho_scale=6.0)
        Xte, yte, _ = _synth(seed=5, ortho_scale=18.0)
        op = oplsda.OPLSDAClassifier(n_components=1, n_ortho=1).fit(Xtr, ytr)
        pd_ = plsda.PLSDAClassifier(n_components=1).fit(Xtr, ytr)
        assert op.score(Xte, yte) > pd_.score(Xte, yte)

    def test_param_roundtrip_and_transforms(self):
        X, labels, _ = _synth(seed=6)
        clf = oplsda.OPLSDAClassifier(n_components=2, n_ortho=2)
        params = clf.get_params()
        clf2 = oplsda.OPLSDAClassifier().set_params(**params)
        assert clf2.get_params() == params
        clf.fit(X, labels)
        assert clf.transform(X).shape == (X.shape[0], 2)
        assert clf.ortho_scores(X).shape == (X.shape[0], 2)
        cov, corr = clf.s_plot()
        assert cov.shape == (X.shape[1],) and corr.shape == (X.shape[1],)

    def test_single_class_raises(self):
        X = np.random.default_rng(0).normal(size=(10, 4))
        with pytest.raises(ValueError, match="2 classes"):
            oplsda.OPLSDAClassifier().fit(X, np.zeros(10))

    def test_top_level_exports(self):
        assert pt.OPLSDAClassifier is oplsda.OPLSDAClassifier
        assert pt.fit_oplsda is oplsda.fit_oplsda
        assert pt.s_plot is oplsda.s_plot

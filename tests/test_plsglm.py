"""PLS-GLM (models/plsglm.py): logistic and Poisson PLS."""

import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.models.plsglm import fit_plsglm, predict_plsglm


def _logit_data(N=400, K=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N, K))
    X = (X - X.mean(0)) / X.std(0)
    beta = np.linspace(1.0, -1.0, K)
    eta = 0.3 + X @ beta
    y = (rng.uniform(size=N) < 1 / (1 + np.exp(-eta))).astype(float)
    return jnp.asarray(X), jnp.asarray(y), beta


def test_full_rank_matches_sklearn_logistic():
    """A = K reproduces unregularized Fisher scoring."""
    from sklearn.linear_model import LogisticRegression

    X, y, _ = _logit_data()
    f = fit_plsglm(X, y, A=X.shape[1], family="binomial")
    ref = LogisticRegression(C=1e10, tol=1e-10, max_iter=1000).fit(
        np.asarray(X), np.asarray(y)
    )
    assert np.allclose(np.asarray(f.coef), ref.coef_[0], atol=1e-4)
    assert abs(float(f.intercept) - ref.intercept_[0]) < 1e-4
    p = np.asarray(predict_plsglm(f, X))
    assert np.allclose(p, ref.predict_proba(np.asarray(X))[:, 1], atol=1e-5)


def test_truncation_regularizes():
    """A < K shrinks coefficients but keeps discrimination."""
    X, y, beta = _logit_data()
    f_full = fit_plsglm(X, y, A=8)
    f_2 = fit_plsglm(X, y, A=2)
    assert float(jnp.linalg.norm(f_2.coef)) < float(
        jnp.linalg.norm(f_full.coef)
    )
    # deviance ordering: more components fit at least as well
    assert float(f_full.deviance) <= float(f_2.deviance) + 1e-6
    # low-rank model still ranks samples correctly (AUC proxy)
    p = np.asarray(predict_plsglm(f_2, X))
    yn = np.asarray(y)
    auc = (p[yn == 1][:, None] > p[yn == 0][None, :]).mean()
    assert auc > 0.8
    # coefficient direction agrees with the truth
    c = np.corrcoef(np.asarray(f_2.coef), beta)[0, 1]
    assert c > 0.9


def test_poisson_family():
    rng = np.random.default_rng(1)
    N, K = 500, 6
    X = rng.normal(size=(N, K))
    X = (X - X.mean(0)) / X.std(0)
    beta = np.array([0.5, -0.3, 0.2, 0.0, 0.4, -0.2])
    lam = np.exp(0.5 + X @ beta)
    y = rng.poisson(lam).astype(float)
    f = fit_plsglm(jnp.asarray(X), jnp.asarray(y), A=K, family="poisson")
    # compare with statsmodels-free check: full-rank Poisson GLM == IRLS
    # fixed point; verify score equation X'(y - mu) ~ 0 at the solution
    mu = np.asarray(predict_plsglm(f, jnp.asarray(X)))
    score = np.abs(X.T @ (np.asarray(y) - mu)) / N
    assert np.all(score < 1e-4), score
    assert abs(np.mean(np.asarray(y) - mu)) < 1e-5  # intercept score
    assert np.allclose(np.asarray(f.coef), beta, atol=0.1)


def test_validation():
    X, y, _ = _logit_data(N=50)
    with pytest.raises(ValueError):
        fit_plsglm(X, y, A=4, family="gamma")


def test_classifier_facade():
    from pls_tpu.estimator import PLSGLMClassifier

    X, y, _ = _logit_data()
    Xr = np.asarray(X) * 3.0 + 5.0  # raw units
    labels = np.where(np.asarray(y) > 0, "pos", "neg")
    clf = PLSGLMClassifier(n_components=4).fit(Xr, labels)
    acc = clf.score(Xr, labels)
    # Bayes accuracy of this synthetic task is ~0.78 (|eta| is modest)
    assert acc > 0.7
    proba = clf.predict_proba(Xr)
    assert proba.shape == (len(labels), 2)
    assert np.allclose(proba.sum(axis=1), 1.0)
    assert set(clf.predict(Xr)) <= {"pos", "neg"}
    # raw-unit coef_/intercept_ reproduce the decision function
    eta = Xr @ clf.coef_[0] + clf.intercept_[0]
    assert np.allclose(eta, clf.decision_function(Xr), atol=1e-8)
    with pytest.raises(ValueError):
        PLSGLMClassifier().fit(Xr, np.zeros(len(labels)))

"""PLS path modeling (models/plspm.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pls_tpu.models.plspm import fit_plspm, plspm_scores


def _sem_data(N=2000, seed=0):
    """Three latent variables with known structure:
        xi2 = 0.6 xi1 + e2 ;  xi3 = 0.4 xi1 + 0.5 xi2 + e3
    each measured by 4 indicators with loading 0.9."""
    rng = np.random.default_rng(seed)
    xi1 = rng.normal(size=N)
    xi2 = 0.6 * xi1 + np.sqrt(1 - 0.6**2) * rng.normal(size=N)
    e3_var = 1 - (0.4**2 + 0.5**2 + 2 * 0.4 * 0.5 * 0.6)
    xi3 = 0.4 * xi1 + 0.5 * xi2 + np.sqrt(e3_var) * rng.normal(size=N)
    lam = 0.9
    X = np.empty((N, 12))
    for b, xi in enumerate([xi1, xi2, xi3]):
        for j in range(4):
            X[:, 4 * b + j] = lam * xi + np.sqrt(1 - lam**2) * rng.normal(
                size=N
            )
    X = (X - X.mean(0)) / X.std(0, ddof=0)
    blocks = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    path = np.zeros((3, 3))
    path[1, 0] = 1  # xi1 -> xi2
    path[2, 0] = 1  # xi1 -> xi3
    path[2, 1] = 1  # xi2 -> xi3
    return jnp.asarray(X), blocks, path, (xi1, xi2, xi3)


@pytest.mark.parametrize("scheme", ["centroid", "factorial", "path"])
def test_recovers_planted_paths(scheme):
    X, blocks, path, _ = _sem_data()
    f = fit_plspm(X, blocks, path, scheme=scheme)
    assert bool(f.converged)
    P = np.asarray(f.paths)
    assert abs(P[1, 0] - 0.6) < 0.06
    assert abs(P[2, 0] - 0.4) < 0.06
    assert abs(P[2, 1] - 0.5) < 0.06
    # reflective loadings near the planted 0.9
    assert np.all(np.abs(np.asarray(f.loadings) - 0.9) < 0.05)
    # R² of endogenous latents positive, exogenous exactly 0
    r2 = np.asarray(f.r2)
    assert r2[0] == 0 and r2[1] > 0.25 and r2[2] > 0.4
    assert 0 < float(f.gof) < 1


def test_scores_recover_latents():
    X, blocks, path, (xi1, xi2, xi3) = _sem_data()
    f = fit_plspm(X, blocks, path)
    S = np.asarray(f.scores)
    for b, xi in enumerate([xi1, xi2, xi3]):
        c = np.corrcoef(S[:, b], xi)[0, 1]
        assert c > 0.9, (b, c)  # oriented positively by construction
    # plspm_scores reproduces the training scores
    S2 = np.asarray(plspm_scores(f, X))
    assert np.allclose(S2, S, atol=1e-8)


def test_two_block_mode_a_is_first_pls_component():
    """Mode-A two-block PLS-PM converges to the dominant singular pair of
    XᵀY (Wold): scores match the first PLSSVD component."""
    rng = np.random.default_rng(3)
    N, Kx, Ky = 300, 7, 5
    T = rng.normal(size=(N, 1))
    X = T @ rng.normal(size=(1, Kx)) + 0.5 * rng.normal(size=(N, Kx))
    Y = T @ rng.normal(size=(1, Ky)) + 0.5 * rng.normal(size=(N, Ky))
    X = (X - X.mean(0)) / X.std(0)
    Y = (Y - Y.mean(0)) / Y.std(0)
    Z = jnp.asarray(np.hstack([X, Y]))
    blocks = [list(range(Kx)), list(range(Kx, Kx + Ky))]
    path = np.zeros((2, 2))
    path[1, 0] = 1
    f = fit_plspm(Z, blocks, path, scheme="factorial")
    u, _, vt = np.linalg.svd(X.T @ Y)
    tx = X @ u[:, 0]
    ty = Y @ vt[0]
    S = np.asarray(f.scores)
    assert abs(np.corrcoef(S[:, 0], tx)[0, 1]) > 1 - 1e-8
    assert abs(np.corrcoef(S[:, 1], ty)[0, 1]) > 1 - 1e-8


def test_mode_b_formative_runs():
    X, blocks, path, _ = _sem_data(N=800)
    f = fit_plspm(X, blocks, path, modes=["B", "A", "A"])
    assert bool(f.converged)
    P = np.asarray(f.paths)
    assert abs(P[2, 1] - 0.5) < 0.1


def test_validation_errors():
    X, blocks, path, _ = _sem_data(N=50)
    with pytest.raises(ValueError):
        fit_plspm(X, [[0, 1], [1, 2]], np.zeros((2, 2)))  # overlap
    bad = path.copy().T  # upper-triangular
    with pytest.raises(ValueError):
        fit_plspm(X, blocks, bad)
    with pytest.raises(ValueError):
        fit_plspm(X, blocks, path, scheme="nope")
    with pytest.raises(ValueError):
        fit_plspm(X, blocks, path, modes=["A"])


def test_bootstrap_paths_cover_truth():
    from pls_tpu.models.plspm import bootstrap_plspm

    X, blocks, path, _ = _sem_data(N=600, seed=4)
    bs = bootstrap_plspm(X, blocks, path, n_boot=120, key=0)
    lo, hi = np.asarray(bs.paths_lo), np.asarray(bs.paths_hi)
    truth = {(1, 0): 0.6, (2, 0): 0.4, (2, 1): 0.5}
    for (i, j), v in truth.items():
        assert lo[i, j] < v < hi[i, j], ((i, j), lo[i, j], hi[i, j])
        assert 0 < np.asarray(bs.paths_se)[i, j] < 0.12
    # strong planted effects are significant
    t = np.asarray(bs.paths_t)
    for (i, j) in truth:
        assert t[i, j] > 3
    # no-path entries stay exactly zero in every resample
    assert np.all(np.asarray(bs.samples)[:, 0, :] == 0)
    assert np.all(np.asarray(bs.loadings_se) < 0.05)

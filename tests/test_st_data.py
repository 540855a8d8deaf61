"""Spatio-temporal data layer gates (VERDICT round-1 items 5 & 6):
- scattered (t, s, y) → NaN-padded grid with sort/unsort round trip;
- gridded-from-scattered model == dense GP oracle on the scattered rows;
- TemporallyGroupedData + time-varying H (ScatteredSpatialHead) == dense GP
  when Z spans all observation sites (conditional is exact interpolation);
- SpatialSparsity: Ms ≪ Nd inducing sites recover the dense posterior, Z is
  a trainable Param with non-zero gradients.

Reference parity: `data/sequential.py:9` pad_with_nan_to_make_grid,
`data/data.py:727` TemporallyGroupedData, `sparsity/sparsity.py:65`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.data.spatiotemporal import (
    SpatioTemporalData,
    TemporallyGroupedData,
    pad_with_nan_to_make_grid,
    spatial_minibatch_indices,
)
from physs_gp_tpu.kernels import Matern32, RBF
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.utils.training import trainable_mask
from physs_gp_tpu.zoo import scattered_st_gp, sparse_st_gp, st_gp


def _scattered(rng, Nt=9, Ns=5, keep=0.6, ds=2):
    """Random grid, random subset of cells observed, shuffled row order."""
    t = np.sort(rng.uniform(0, 3, Nt))
    S = rng.uniform(-1, 1, (Ns, ds))
    F = rng.normal(size=(Nt, Ns))
    tt, ss = np.nonzero(rng.uniform(size=(Nt, Ns)) < keep)
    X = np.hstack([t[tt][:, None], S[ss]])
    y = F[tt, ss]
    perm = rng.permutation(X.shape[0])
    return X[perm], y[perm]


def _dense_gp(kern_t, kern_s, X, y, noise, X_pred=None):
    """fp64 dense GP oracle on scattered rows X [N, 1+ds], y [N]."""
    Kt = np.asarray(kern_t.K(X[:, :1], X[:, :1]))
    Ks = np.asarray(kern_s.K(X[:, 1:], X[:, 1:]))
    K = Kt * Ks + noise * np.eye(X.shape[0])
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    lml = (
        -0.5 * y @ alpha
        - np.log(np.diag(L)).sum()
        - 0.5 * y.shape[0] * np.log(2 * np.pi)
    )
    out = {"lml": lml}
    if X_pred is not None:
        Kx = np.asarray(kern_t.K(X_pred[:, :1], X[:, :1])) * np.asarray(
            kern_s.K(X_pred[:, 1:], X[:, 1:])
        )
        out["mean"] = Kx @ alpha
        v = np.linalg.solve(L, Kx.T)
        kd = np.asarray(kern_t.K_diag(X_pred[:, :1])) * np.asarray(
            kern_s.K_diag(X_pred[:, 1:])
        )
        out["var"] = kd - np.sum(v * v, axis=0)
    return out


def test_pad_with_nan_to_make_grid_contract():
    rng = np.random.default_rng(0)
    X, y = _scattered(rng, Nt=7, Ns=4, keep=0.5)
    n_added, Xg, Yg = pad_with_nan_to_make_grid(X, y)
    # original rows first, unchanged
    np.testing.assert_array_equal(Xg[: X.shape[0]], X)
    np.testing.assert_array_equal(Yg[: X.shape[0], 0], y)
    # completion rows all-NaN, total == Nt * Ns
    assert np.isnan(Yg[X.shape[0]:]).all()
    Nt = np.unique(X[:, 0]).shape[0]
    Ns = np.unique(X[:, 1:], axis=0).shape[0]
    assert Xg.shape[0] == Nt * Ns == X.shape[0] + n_added
    # grid is complete: every (t, s) pair present exactly once
    assert np.unique(Xg, axis=0).shape[0] == Nt * Ns


def test_spatiotemporal_data_roundtrip():
    rng = np.random.default_rng(1)
    X, y = _scattered(rng, Nt=8, Ns=5, keep=0.7)
    d = SpatioTemporalData.from_scattered(X, y)
    assert d.Y.shape == (d.Nt, d.Ns, 1)
    # unsort(grid) returns the original rows in the original order
    np.testing.assert_allclose(d.unsort(d.Y)[:, 0], y)
    np.testing.assert_allclose(d.unsort(d.Y_flat)[:, 0], y)
    # grid cells without data are NaN
    assert np.isnan(d.Y).sum() == d.Nt * d.Ns - X.shape[0]


@pytest.mark.slow
def test_scattered_to_grid_model_matches_dense_gp():
    """Scattered rows → grid → ST filter == dense GP on those rows."""
    rng = np.random.default_rng(2)
    X, y = _scattered(rng, Nt=10, Ns=4, keep=0.6)
    kern_t = Matern32(lengthscale=0.9, variance=1.1)
    kern_s = RBF(lengthscales=positive_param(jnp.array([0.8, 0.7])))
    noise = 0.05
    d = SpatioTemporalData.from_scattered(X, y)
    m = st_gp(d.t, d.Y_flat, d.X_space, k_time=kern_t, k_space=kern_s,
              noise=noise)
    dense = _dense_gp(kern_t, kern_s, X, y, noise)
    np.testing.assert_allclose(
        float(m.log_marginal_likelihood()), dense["lml"], rtol=1e-8
    )
    # posterior at the original rows via unsort
    post = m.posterior()
    dense_p = _dense_gp(kern_t, kern_s, X, y, noise, X_pred=X)
    mean_rows = d.unsort(np.asarray(post.mean))[:, 0]
    np.testing.assert_allclose(mean_rows, dense_p["mean"], rtol=1e-6, atol=1e-8)


def test_temporally_grouped_shapes_and_roundtrip():
    rng = np.random.default_rng(3)
    # moving sensors: 1-3 observations at random locations per time
    rows = []
    for k, tk in enumerate(np.sort(rng.uniform(0, 2, 12))):
        for _ in range(rng.integers(1, 4)):
            rows.append([tk, *rng.uniform(-1, 1, 2), rng.normal()])
    A = np.array(rows)
    X, y = A[:, :3], A[:, 3]
    perm = rng.permutation(X.shape[0])
    X, y = X[perm], y[perm]
    g = TemporallyGroupedData.from_scattered(X, y)
    assert g.X_st.shape == (g.Nt, g.Ng, 2)
    assert g.Y_st.shape == (g.Nt, g.Ng, 1)
    np.testing.assert_allclose(g.unsort(g.Y_st)[:, 0], y)
    # padded cells are NaN and count matches
    assert np.isfinite(g.Y_st).sum() == X.shape[0]


@pytest.mark.slow
def test_grouped_scattered_model_matches_dense_gp():
    """TemporallyGroupedData + time-varying H == dense GP when Z spans all
    sites (spatial conditional is exact interpolation, correction == 0)."""
    rng = np.random.default_rng(4)
    X, y = _scattered(rng, Nt=9, Ns=4, keep=0.55)
    kern_t = Matern32(lengthscale=1.1, variance=0.9)
    kern_s = RBF(lengthscales=positive_param(jnp.array([0.9, 0.6])))
    noise = 0.04
    m, data = scattered_st_gp(
        X, y, Z=np.unique(X[:, 1:], axis=0),
        k_time=kern_t, k_space=kern_s, noise=noise,
    )
    dense = _dense_gp(kern_t, kern_s, X, y, noise, X_pred=X)
    np.testing.assert_allclose(
        float(m.log_marginal_likelihood()), dense["lml"], rtol=1e-6
    )
    post = m.posterior()
    mean_rows = data.unsort(np.asarray(post.mean))[:, 0]
    var_rows = data.unsort(np.asarray(post.var))[:, 0]
    np.testing.assert_allclose(mean_rows, dense["mean"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(var_rows, dense["var"], rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_sparse_sites_recover_dense_posterior():
    """Ms ≪ Nd inducing sites: sparse posterior ≈ dense GP at data rows."""
    rng = np.random.default_rng(5)
    Nt, Nd = 12, 24
    t = np.sort(rng.uniform(0, 3, Nt))
    # data sites on a fine 1D line; inducing sites a coarse subset
    X_space = np.linspace(-1, 1, Nd)[:, None]
    Z = np.linspace(-1, 1, 7)[:, None]
    kern_t = Matern32(lengthscale=1.0, variance=1.0)
    ls = positive_param(jnp.array([0.9]))
    kern_s = RBF(lengthscales=ls)
    # smooth spatial field sampled from the model family
    F = np.sin(2 * t[:, None]) * np.cos(1.5 * X_space[None, :, 0])
    Y = F + 0.05 * rng.normal(size=F.shape)
    noise = 0.05**2
    m = sparse_st_gp(t, Y, X_space, Z, k_time=kern_t, k_space=kern_s,
                     noise=noise)
    assert float(jnp.isfinite(m.log_marginal_likelihood()))
    post = m.posterior()
    X_rows = np.hstack([np.repeat(t, Nd)[:, None], np.tile(X_space, (Nt, 1))])
    dense = _dense_gp(kern_t, kern_s, X_rows, F.reshape(-1) + 0 * X_rows[:, 0],
                      noise)
    dense_p = _dense_gp(
        kern_t, kern_s, X_rows, np.asarray(Y).reshape(-1), noise, X_pred=X_rows
    )
    rmse_sparse = np.sqrt(np.mean(
        (np.asarray(post.mean).reshape(-1) - dense_p["mean"]) ** 2
    ))
    scale = np.std(dense_p["mean"])
    assert rmse_sparse < 0.05 * scale, (rmse_sparse, scale)
    # sparse variances bounded below by ~the dense ones (DTC never
    # over-confident relative to dense at the data sites)
    assert np.mean(np.asarray(post.var).reshape(-1) >= dense_p["var"] - 1e-6) > 0.95


@pytest.mark.slow
def test_sparse_z_is_trainable_param():
    rng = np.random.default_rng(6)
    t = np.sort(rng.uniform(0, 2, 8))
    X_space = np.linspace(-1, 1, 9)[:, None]
    Z = np.array([[-0.7], [0.1], [0.8]])
    Y = rng.normal(size=(8, 9))
    m = sparse_st_gp(t, Y, X_space, Z, noise=0.1, train_z=True)
    g = jax.grad(lambda mm: mm.get_objective())(m)
    gz = np.asarray(g.kernel.Z.raw)
    assert np.isfinite(gz).all() and np.abs(gz).sum() > 0
    mask = trainable_mask(m)
    assert bool(np.asarray(mask.kernel.Z.raw).all())


def test_spatial_minibatch_indices():
    rng = np.random.default_rng(7)
    idx = spatial_minibatch_indices(rng, Ns=50, batch=8)
    assert idx.shape == (8,) and idx.min() >= 0 and idx.max() < 50


@pytest.mark.slow
def test_scattered_st_predict_matches_dense_gp():
    """Prediction at arbitrary NEW scattered rows == dense GP conditional
    (Z spans all sites incl. query locations -> conditional exact)."""
    rng = np.random.default_rng(8)
    X, y = _scattered(rng, Nt=8, Ns=4, keep=0.7)
    Xq = np.hstack([
        rng.uniform(X[:, 0].min(), X[:, 0].max(), (5, 1)),  # new times
        X[rng.integers(0, X.shape[0], 5), 1:],              # existing sites
    ])
    kern_t = Matern32(lengthscale=1.0, variance=1.0)
    kern_s = RBF(lengthscales=positive_param(jnp.array([0.8, 0.7])))
    noise = 0.05
    from physs_gp_tpu.zoo import scattered_st_predict

    m, data = scattered_st_gp(
        X, y, Z=np.unique(X[:, 1:], axis=0),
        k_time=kern_t, k_space=kern_s, noise=noise,
    )
    pred = scattered_st_predict(m, data, Xq)
    dense = _dense_gp(kern_t, kern_s, X, y, noise, X_pred=Xq)
    np.testing.assert_allclose(
        pred.mean[:, 0], dense["mean"], rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        pred.var[:, 0], dense["var"], rtol=1e-4, atol=1e-7
    )

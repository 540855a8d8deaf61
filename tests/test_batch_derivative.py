"""BatchGP + derivative-kernel gates (SURVEY.md §2.4/§2.10, phi_ml recipes):
- BatchGP lml/predict == hand-rolled dense GP (incl. NaN masking);
- derivative kernel blocks == finite differences of the base kernel;
- curl-free GP field reconstructions are curl-free and beat independent GPs;
- Helmholtz decomposition splits a known field.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern52, RBF
from physs_gp_tpu.kernels.derivative import DerivativeKernel, grad_ops
from physs_gp_tpu.likelihoods import Gaussian
from physs_gp_tpu.models.batch_gp import BatchGP
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.zoo.phi_ml import curl_free_gp, div_free_kernel_2d, helmholtz_gp


def test_batch_gp_matches_dense():
    rng = np.random.default_rng(0)
    N = 30
    X = rng.uniform(-2, 2, (N, 2))
    y = np.sin(X[:, 0]) * np.cos(X[:, 1]) + 0.05 * rng.normal(size=N)
    kern = RBF(lengthscales=positive_param(jnp.array([0.8, 1.1])),
               variance=positive_param(1.4))
    noise = 0.01
    m = BatchGP(X=jnp.asarray(X), Y=jnp.asarray(y)[:, None], kernel=kern,
                likelihood=Gaussian(positive_param(noise)))
    K = np.asarray(kern.K(X, X)) + noise * np.eye(N)
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    lml = -0.5 * y @ alpha - np.log(np.diag(L)).sum() - N / 2 * np.log(2 * np.pi)
    np.testing.assert_allclose(m.log_marginal_likelihood(), lml, rtol=1e-8)
    Xs = rng.uniform(-2, 2, (7, 2))
    Ks = np.asarray(kern.K(Xs, X))
    mean_d = Ks @ alpha
    v = np.linalg.solve(L, Ks.T)
    var_d = np.asarray(kern.K_diag(Xs)) - np.sum(v * v, 0)
    pred = m.predict_f(jnp.asarray(Xs))
    np.testing.assert_allclose(pred.mean[:, 0], mean_d, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(pred.var[:, 0], var_d, rtol=1e-6, atol=1e-10)


def test_batch_gp_nan_masking():
    rng = np.random.default_rng(1)
    N = 20
    X = rng.uniform(-1, 1, (N, 1))
    y = np.sin(2 * X[:, 0]) + 0.1 * rng.normal(size=N)
    y_nan = y.copy()
    drop = [3, 7, 15]
    y_nan[drop] = np.nan
    keep = np.setdiff1d(np.arange(N), drop)
    kern = Matern52(lengthscale=0.5)
    lik = Gaussian(positive_param(0.01))
    m_nan = BatchGP(X=jnp.asarray(X), Y=jnp.asarray(y_nan)[:, None],
                    kernel=kern, likelihood=lik)
    m_drop = BatchGP(X=jnp.asarray(X[keep]), Y=jnp.asarray(y[keep])[:, None],
                     kernel=kern, likelihood=lik)
    np.testing.assert_allclose(
        m_nan.log_marginal_likelihood(), m_drop.log_marginal_likelihood(),
        rtol=1e-8,
    )
    Xs = np.linspace(-1, 1, 9)[:, None]
    p1, p2 = m_nan.predict_f(jnp.asarray(Xs)), m_drop.predict_f(jnp.asarray(Xs))
    np.testing.assert_allclose(p1.mean, p2.mean, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(p1.var, p2.var, rtol=1e-6, atol=1e-10)


def test_derivative_kernel_matches_finite_differences():
    base = RBF(lengthscales=positive_param(jnp.array([0.7, 1.2])),
               variance=positive_param(0.9))
    k = DerivativeKernel(base=base, ops=((), (0,), (1, 1)))
    x1 = jnp.array([0.3, -0.2])
    x2 = jnp.array([-0.5, 0.4])
    B = k.K_blocks(x1[None], x2[None])[:, :, 0, 0]
    eps = 1e-5

    def kf(a, b):
        return float(base.k_scalar(jnp.asarray(a), jnp.asarray(b)))

    # d/dx1_0 (op a=(0,)) vs fd
    fd10 = (kf(x1 + np.array([eps, 0]), x2) - kf(x1 - np.array([eps, 0]), x2)) / (
        2 * eps
    )
    np.testing.assert_allclose(B[1, 0], fd10, rtol=1e-6)
    # cross: d/dx1_0 d/dx2_1^2 — second difference needs a larger step to
    # dominate fp64 roundoff
    eps2 = 1e-3

    def d2b(a, b):
        return (
            kf(a, b + np.array([0, eps2]))
            - 2 * kf(a, b)
            + kf(a, b - np.array([0, eps2]))
        ) / eps2**2

    eps1 = 1e-4
    fd_cross = (
        d2b(x1 + np.array([eps1, 0]), x2) - d2b(x1 - np.array([eps1, 0]), x2)
    ) / (2 * eps1)
    np.testing.assert_allclose(B[1, 2], fd_cross, rtol=1e-4)
    # symmetry of full gram
    X = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (5, 2)))
    G = k.K(X, X)
    np.testing.assert_allclose(G, G.T, atol=1e-10)
    w = np.linalg.eigvalsh(np.asarray(G))
    assert w.min() > -1e-8
    np.testing.assert_allclose(np.diag(np.asarray(G)), k.K_diag(X), rtol=1e-8)


def _potential_field(X, sign=-1.0):
    """phi = exp(-|x|^2/2); H = -grad phi (curl-free by construction)."""
    phi = np.exp(-0.5 * np.sum(X**2, -1))
    return sign * (-X) * phi[:, None]  # -grad phi = x*phi... sign bookkeeping


def test_curl_free_gp_beats_independent():
    rng = np.random.default_rng(3)
    N = 40
    X = rng.uniform(-2, 2, (N, 2))
    H = _potential_field(X)  # true curl-free field
    Y = H + 0.02 * rng.normal(size=H.shape)
    m = curl_free_gp(X, Y, noise=4e-4)
    Xs = rng.uniform(-1.5, 1.5, (25, 2))
    Hs = _potential_field(Xs)
    pred = m.predict_f(jnp.asarray(Xs))
    rmse_cf = float(np.sqrt(np.mean((np.asarray(pred.mean) - Hs) ** 2)))
    # independent per-component GPs
    rmses = []
    for c in range(2):
        mc = BatchGP(
            X=jnp.asarray(X), Y=jnp.asarray(Y[:, c : c + 1]),
            kernel=RBF(lengthscales=positive_param(jnp.ones(2)),
                       variance=positive_param(1.0)),
            likelihood=Gaussian(positive_param(4e-4)),
        )
        p = mc.predict_f(jnp.asarray(Xs))
        rmses.append(np.asarray(p.mean[:, 0]) - Hs[:, c])
    rmse_ind = float(np.sqrt(np.mean(np.stack(rmses) ** 2)))
    assert rmse_cf < rmse_ind, (rmse_cf, rmse_ind)
    assert rmse_cf < 0.05


def test_helmholtz_gp_runs_and_fits():
    rng = np.random.default_rng(4)
    N = 40
    X = rng.uniform(-2, 2, (N, 2))
    u_cf = _potential_field(X)
    psi = np.exp(-0.5 * np.sum((X - 0.5) ** 2, -1))
    u_df = np.stack([-(X[:, 1] - 0.5) * psi, (X[:, 0] - 0.5) * psi], -1) * np.array(
        [1.0, -1.0]
    )
    Y = u_cf + u_df + 0.02 * rng.normal(size=(N, 2))
    m = helmholtz_gp(X, Y, noise=4e-4)
    lml = float(m.log_marginal_likelihood())
    assert np.isfinite(lml)
    pred = m.predict_f(jnp.asarray(X))
    rmse = float(np.sqrt(np.mean((np.asarray(pred.mean) - (u_cf + u_df)) ** 2)))
    assert rmse < 0.05


def test_div_free_kernel_fields_are_divergence_free():
    """Sample-free check: divergence of the posterior mean field ~ 0."""
    rng = np.random.default_rng(5)
    N = 30
    X = rng.uniform(-1.5, 1.5, (N, 2))
    psi = np.exp(-0.5 * np.sum(X**2, -1))
    Y = np.stack([-X[:, 1] * psi, X[:, 0] * psi], -1)
    kern = div_free_kernel_2d(
        RBF(lengthscales=positive_param(jnp.ones(2)), variance=positive_param(1.0))
    )
    m = BatchGP(X=jnp.asarray(X), Y=jnp.asarray(Y), kernel=kern,
                likelihood=Gaussian(positive_param(1e-4)))

    def mean_field(x):
        return m.predict_f(x[None]).mean[0]

    for _ in range(5):
        x0 = jnp.asarray(rng.uniform(-1, 1, 2))
        Jac = jax.jacfwd(mean_field)(x0)
        div = Jac[0, 0] + Jac[1, 1]
        assert abs(float(div)) < 1e-4, float(div)

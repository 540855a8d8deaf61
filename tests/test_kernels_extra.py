"""Extra kernel families: periodic (+SS approx), quasi-periodic exact noise,
Wiener family, RQ/SM/arccosine/Gibbs/deep."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern32, Matern52, RBF
from physs_gp_tpu.kernels.markov import noise_matrix, to_ss, transition_matrix
from physs_gp_tpu.kernels.misc import RQ, ArcCosine, DeepKernel, Gibbs, SpectralMixture
from physs_gp_tpu.kernels.periodic import Periodic, _bessel_i
from physs_gp_tpu.kernels.wiener import IntegratedWiener, Wiener, WienerVelocity
from physs_gp_tpu.likelihoods import Gaussian
from physs_gp_tpu.models import StateSpaceGP
from physs_gp_tpu.utils.params import positive_param


def test_bessel_i_matches_scipy():
    from scipy.special import iv

    for x in (0.1, 1.0, 4.0):
        got = np.asarray(_bessel_i(np.arange(7), jnp.asarray(x)))
        expected = iv(np.arange(7), x)
        # quadrature is machine-accurate in ABSOLUTE terms; tiny high-order
        # values (I_6(0.1) ~ 2e-11) can't meet a pure relative tolerance
        np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-14)


def test_periodic_ss_approximates_exact_kernel():
    k = Periodic(
        lengthscales=positive_param(1.2),
        variance=positive_param(0.8),
        period=positive_param(1.7),
        n_harmonics=8,
    )
    taus = jnp.linspace(0.0, 3.0, 25)
    exact = jax.vmap(lambda t: k.k_scalar(jnp.zeros(1), t[None]))(taus)
    ss = to_ss(k)
    A = k.transition(taus)
    approx = jnp.einsum("oi,tij,jk,pk->t", ss.H, A, ss.Pinf, ss.H)
    np.testing.assert_allclose(approx, exact, atol=1e-6)
    # periodic is exactly periodic in SS form
    A_per = k.transition(jnp.asarray(1.7))
    np.testing.assert_allclose(A_per, np.eye(A_per.shape[0]), atol=1e-5)


def test_quasiperiodic_ssgp_matches_dense():
    """Periodic x Matern product: exact noiseless-factor composition."""
    rng = np.random.default_rng(0)
    T = 40
    t = np.sort(rng.uniform(0, 6, T))
    kq = Periodic(
        lengthscales=positive_param(1.5),
        variance=positive_param(1.0),
        period=positive_param(2.0),
        n_harmonics=10,
    ) * Matern52(lengthscale=4.0, variance=1.0)
    y = np.sin(2 * np.pi * t / 2.0) + 0.1 * rng.normal(size=T)
    noise = 0.05
    m = StateSpaceGP(
        t=jnp.asarray(t), Y=jnp.asarray(y)[:, None], kernel=kq,
        likelihood=Gaussian(positive_param(noise)),
    )
    # dense comparison uses the SS-implied covariance (the harmonic series
    # truncates the exact periodic kernel, so compare against itself)
    ss = to_ss(kq)
    tau = jnp.abs(t[:, None] - t[None, :])
    A = transition_matrix(kq, tau.reshape(-1)).reshape(T, T, ss.state_dim, -1)
    K = jnp.einsum("oi,stij,jk,pk->st", ss.H, A, ss.Pinf, ss.H)
    K = K + noise * jnp.eye(T)
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), jnp.asarray(y))
    lml_dense = (
        -0.5 * y @ alpha - jnp.sum(jnp.log(jnp.diag(L)))
        - T / 2 * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(m.log_marginal_likelihood(), lml_dense, rtol=1e-7)
    # exact noise composition: Q for the product must be PSD and small-dt safe
    Q = noise_matrix(kq, jnp.asarray([1e-5, 0.1]))
    w = np.linalg.eigvalsh(np.asarray(Q[0]))
    assert w.min() > -1e-12


@pytest.mark.parametrize(
    "make",
    [
        Wiener,
        WienerVelocity,
        functools.partial(IntegratedWiener, q=2),
        functools.partial(IntegratedWiener, q=3),
    ],
)
def test_wiener_ssgp_matches_dense(make):
    rng = np.random.default_rng(1)
    T = 30
    t = np.sort(rng.uniform(0.1, 4, T))
    k = make(variance=positive_param(0.7), P0=positive_param(1e-4))
    y = np.cumsum(rng.normal(size=T) * 0.3)
    noise = 0.04
    m = StateSpaceGP(
        t=jnp.asarray(t), Y=jnp.asarray(y)[:, None], kernel=k,
        likelihood=Gaussian(positive_param(noise)),
    )
    # dense: non-stationary covariance relative to t=0 start + P0 handling:
    # the filter starts at the first data point with P0 (not at t=0), so the
    # implied prior covariance is k(t - t0 + ...) — build from SS directly.
    ss = to_ss(k)
    d = ss.state_dim
    # marginal cov of state at time t_i (propagated from t_0 with P0):
    def state_cov(ti, t0):
        A = k.transition(jnp.asarray(ti - t0))
        return A @ ss.Pinf @ A.T + noise_matrix(k, jnp.asarray(ti - t0)[None])[0]

    K = np.zeros((T, T))
    for i in range(T):
        Pi = state_cov(t[i], t[0])
        for j in range(i, T):
            Aij = np.asarray(k.transition(jnp.asarray(t[j] - t[i])))
            Kij = np.asarray(ss.H) @ np.asarray(Pi) @ Aij.T @ np.asarray(ss.H).T
            K[i, j] = K[j, i] = Kij[0, 0]
    K += noise * np.eye(T)
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    lml_dense = (
        -0.5 * y @ alpha - np.log(np.diag(L)).sum() - T / 2 * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(m.log_marginal_likelihood(), lml_dense, rtol=1e-7)


def test_rq_sm_arccos_gibbs_deep_psd():
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.uniform(-1, 1, (15, 2)))
    kernels = [
        RQ(lengthscales=positive_param(0.8), variance=positive_param(1.0),
           alpha=positive_param(1.5)),
        SpectralMixture.init(3, 2),
        ArcCosine(),
        Gibbs(variance=positive_param(1.0),
              l_fn=lambda x: 0.5 + 0.3 * jnp.sum(x**2)),
        DeepKernel.init(RBF(), [2, 8, 2]),
    ]
    for k in kernels:
        K = k.K(X, X)
        np.testing.assert_allclose(K, K.T, atol=1e-9, err_msg=str(type(k)))
        w = np.linalg.eigvalsh(np.asarray(K))
        assert w.min() > -1e-7, (type(k), w.min())
        np.testing.assert_allclose(
            jnp.diag(K), k.K_diag(X), rtol=1e-7, err_msg=str(type(k))
        )

    # RQ -> RBF as alpha -> inf
    rq_big = RQ(lengthscales=positive_param(0.8), variance=positive_param(1.0),
                alpha=positive_param(1e6))
    rbf = RBF(lengthscales=positive_param(0.8), variance=positive_param(1.0))
    np.testing.assert_allclose(rq_big.K(X, X), rbf.K(X, X), rtol=1e-4)


def test_aggregated_kernel_recovers_averages():
    """Aggregated GP: observe box averages, infer the pointwise function."""
    from physs_gp_tpu.kernels.aggregated import AggregatedKernel, uniform_box_nodes
    from physs_gp_tpu.models.batch_gp import BatchGP
    from physs_gp_tpu.utils.params import positive_param
    from physs_gp_tpu.likelihoods import Gaussian
    import numpy as np

    rng = np.random.default_rng(6)
    R = 16
    lows = np.linspace(0, 4, R + 1)[:-1][:, None]
    highs = lows + 4.0 / R
    nodes, w = uniform_box_nodes(lows, highs, n_per_dim=8)
    f = lambda x: np.sin(2 * x)
    y = np.array([
        np.mean(f(np.linspace(l[0], h[0], 200))) for l, h in zip(lows, highs)
    ]) + 0.01 * rng.normal(size=R)
    base = RBF(lengthscales=positive_param(0.7), variance=positive_param(1.0))
    agg = AggregatedKernel(base=base, nodes=jnp.asarray(nodes), weights=jnp.asarray(w))
    m = BatchGP(X=jnp.arange(R)[:, None] * 1.0, Y=jnp.asarray(y)[:, None],
                kernel=agg, likelihood=Gaussian(positive_param(1e-4)))
    lml = float(m.log_marginal_likelihood())
    assert np.isfinite(lml)
    # pointwise reconstruction via cross-covariances
    Xs = np.linspace(0.2, 3.8, 30)[:, None]
    Kxr = agg.cross_K(jnp.arange(R), jnp.asarray(Xs)).T  # [Ns, R]
    Krr = agg.K(jnp.arange(R), jnp.arange(R)) + 1e-4 * jnp.eye(R)
    alpha = jnp.linalg.solve(Krr, jnp.asarray(y))
    f_rec = np.asarray(Kxr @ alpha)
    rmse = float(np.sqrt(np.mean((f_rec - f(Xs[:, 0])) ** 2)))
    assert rmse < 0.1, rmse

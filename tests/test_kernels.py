import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import (
    RBF,
    Matern12,
    Matern32,
    Matern52,
    Matern72,
    to_ss,
    transition_matrix,
)
from physs_gp_tpu.kernels.markov import stationary_noise
from physs_gp_tpu.utils.params import positive_param

MATERNS = [Matern12, Matern32, Matern52, Matern72]


@pytest.mark.parametrize("make", MATERNS)
def test_transition_matches_expm(make):
    k = make(lengthscale=0.7, variance=2.0)
    ss = to_ss(k)
    for dt in [0.0, 0.01, 0.3, 2.0]:
        A_closed = k.transition(jnp.asarray(dt))
        A_expm = jax.scipy.linalg.expm(ss.F * dt)
        np.testing.assert_allclose(A_closed, A_expm, atol=1e-10, err_msg=f"dt={dt}")


@pytest.mark.parametrize("make", MATERNS)
def test_pinf_is_stationary(make):
    """F Pinf + Pinf F^T + L Qc L^T = 0 and Pinf[0,0] = variance."""
    k = make(lengthscale=1.3, variance=0.5)
    ss = to_ss(k)
    res = ss.F @ ss.Pinf + ss.Pinf @ ss.F.T + ss.L @ ss.Qc @ ss.L.T
    np.testing.assert_allclose(res, 0.0, atol=1e-8)
    np.testing.assert_allclose(ss.Pinf[0, 0], 0.5, rtol=1e-8)


@pytest.mark.parametrize("make", MATERNS)
def test_ss_covariance_matches_dense_K(make):
    """H expm(F|dt|) Pinf H^T must equal k(t, t') for t >= t'."""
    k = make(lengthscale=0.9, variance=1.7)
    ss = to_ss(k)
    taus = jnp.array([0.0, 0.05, 0.4, 1.1, 3.0])
    A = k.transition(taus)  # [5, d, d]
    cov_ss = jnp.einsum("oi,tij,jk,pk->top", ss.H, A, ss.Pinf, ss.H)[:, 0, 0]
    cov_dense = k.K(jnp.zeros((1, 1)), taus[:, None])[0]
    np.testing.assert_allclose(cov_ss, cov_dense, rtol=1e-8)


@pytest.mark.parametrize("make", MATERNS)
def test_gram_psd_and_diag(make):
    k = make(lengthscale=0.5, variance=2.0)
    X = jnp.linspace(0, 3, 20)[:, None]
    K = k.K(X, X)
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    w = np.linalg.eigvalsh(np.asarray(K))
    assert w.min() > -1e-9
    np.testing.assert_allclose(jnp.diag(K), k.K_diag(X), rtol=1e-12)


def test_scalar_matches_gram():
    k = Matern52(lengthscale=0.8, variance=1.5)
    X1 = jnp.array([[0.1], [0.9]])
    X2 = jnp.array([[0.3], [2.0], [1.1]])
    K_gram = k.K(X1, X2)
    K_scal = jnp.array([[k.k_scalar(a, b) for b in X2] for a in X1])
    np.testing.assert_allclose(K_gram, K_scal, rtol=1e-8)


def test_rbf_ard():
    k = RBF(
        lengthscales=positive_param(jnp.array([0.5, 2.0])),
        variance=positive_param(3.0),
    )
    x1 = jnp.array([0.0, 0.0])
    x2 = jnp.array([0.5, 2.0])
    expected = 3.0 * np.exp(-0.5 * (1.0 + 1.0))
    np.testing.assert_allclose(k.k_scalar(x1, x2), expected, rtol=1e-8)
    np.testing.assert_allclose(k.K(x1[None], x2[None])[0, 0], expected, rtol=1e-8)


def test_sum_kernel_ss_block_structure():
    k1 = Matern32(lengthscale=0.5)
    k2 = Matern12(lengthscale=2.0)
    k = k1 + k2
    ss = to_ss(k)
    assert ss.F.shape == (3, 3)
    # dense covariance equals sum
    X = jnp.linspace(0, 2, 7)[:, None]
    np.testing.assert_allclose(k.K(X, X), k1.K(X, X) + k2.K(X, X), rtol=1e-10)
    # transitions block-diagonal & match expm of the composed F
    dt = jnp.asarray(0.37)
    A = transition_matrix(k, dt)
    np.testing.assert_allclose(A, jax.scipy.linalg.expm(ss.F * 0.37), atol=1e-10)
    # stationary SS covariance at lags matches dense K
    taus = jnp.array([0.0, 0.2, 1.0])
    At = transition_matrix(k, taus)
    cov_ss = jnp.einsum("oi,tij,jk,pk->t", ss.H, At, ss.Pinf, ss.H)
    np.testing.assert_allclose(
        cov_ss, k.K(jnp.zeros((1, 1)), taus[:, None])[0], rtol=1e-8
    )


def test_product_kernel_ss_kron():
    k1 = Matern32(lengthscale=0.5, variance=2.0)
    k2 = Matern12(lengthscale=1.5, variance=0.5)
    k = k1 * k2
    ss = to_ss(k)
    assert ss.F.shape == (2, 2 * 1) or ss.F.shape == (2, 2)
    taus = jnp.array([0.0, 0.3, 1.2])
    At = transition_matrix(k, taus)
    cov_ss = jnp.einsum("oi,tij,jk,pk->t", ss.H, At, ss.Pinf, ss.H)
    np.testing.assert_allclose(
        cov_ss, k.K(jnp.zeros((1, 1)), taus[:, None])[0], rtol=1e-8
    )


def test_stationary_noise_psd():
    k = Matern52(lengthscale=0.4)
    ss = to_ss(k)
    A = k.transition(jnp.array([0.01, 0.5, 5.0]))
    Q = stationary_noise(A, ss.Pinf)
    for i in range(3):
        w = np.linalg.eigvalsh(np.asarray(Q[i]))
        assert w.min() > -1e-10


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_composition_ssgp_matches_dense(seed):
    """Random Sum/Product trees over the Matérn family: the composed
    state-space model's lml must equal the dense GP built from the SAME
    composition's closed-form K — gates the block-diag/Kronecker
    composition algebra (`to_ss`/`transition_matrix`/`noise_matrix`) on
    shapes no hand-written case covers, incl. missing data and the
    parallel scan."""
    from physs_gp_tpu.kernels import Matern52, Matern72
    from physs_gp_tpu.likelihoods import Gaussian
    from physs_gp_tpu.models import BatchGP, StateSpaceGP
    from physs_gp_tpu.utils.params import positive_param

    rng = np.random.default_rng(seed)

    def leaf():
        cls = [Matern12, Matern32, Matern52, Matern72][rng.integers(4)]
        return cls(lengthscale=float(rng.uniform(0.4, 2.5)),
                   variance=float(rng.uniform(0.3, 2.0)))

    def tree(depth):
        if depth == 0 or rng.uniform() < 0.3:
            return leaf()
        a, b = tree(depth - 1), tree(depth - 1)
        return a + b if rng.uniform() < 0.5 else a * b

    kern = tree(2)
    T = 16
    t = np.sort(rng.uniform(0, 4, T))
    y = rng.normal(size=(T, 1))
    y[rng.integers(T), 0] = np.nan
    noise = 0.05
    lik = Gaussian(positive_param(noise))

    dense = BatchGP(X=jnp.asarray(t)[:, None], Y=jnp.asarray(y),
                    kernel=kern, likelihood=lik)
    lml_dense = float(dense.log_marginal_likelihood())
    for parallel in (False, True):
        m = StateSpaceGP(t=jnp.asarray(t), Y=jnp.asarray(y), kernel=kern,
                         likelihood=lik, parallel=parallel)
        np.testing.assert_allclose(
            float(m.log_marginal_likelihood()), lml_dense, rtol=1e-8,
            err_msg=f"seed={seed} parallel={parallel} kern={kern}",
        )

"""CVI gates (SURVEY.md §7 M4):
- Gaussian-likelihood CVI with lr=1 reaches the exact sites in ONE step and
  reproduces the exact posterior / ELBO == lml.
- Poisson CVI posterior matches brute-force quadrature on a tiny problem.
- ELBO increases monotonically under natural-gradient updates.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern32, Matern52
from physs_gp_tpu.likelihoods import Bernoulli, Gaussian, Poisson
from physs_gp_tpu.models import CVIGP, StateSpaceGP
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.utils.struct import replace



pytestmark = pytest.mark.slow  # multi-minute gate tier

def test_gaussian_cvi_one_step_exact():
    rng = np.random.default_rng(0)
    T = 40
    t = np.sort(rng.uniform(0, 4, T))
    y = np.sin(2 * t) + 0.2 * rng.normal(size=T)
    y = jnp.asarray(y)[:, None]
    t = jnp.asarray(t)
    kern = Matern32(lengthscale=0.7, variance=1.1)
    noise = 0.05
    lik = Gaussian(positive_param(noise))

    m = CVIGP.init(t, y, kern, lik)
    m = m.natural_gradient_update(1.0)
    # exact CVI fixed point for Gaussian likelihood: sites == (y, noise I)
    np.testing.assert_allclose(m.sites.Y, y, rtol=1e-8)
    np.testing.assert_allclose(
        m.sites.V[:, 0, 0], noise, rtol=1e-8
    )
    exact = StateSpaceGP(t=t, Y=y, kernel=kern, likelihood=lik)
    post_cvi = m.posterior()
    post_ex = exact.posterior()
    np.testing.assert_allclose(post_cvi.mean, post_ex.mean, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(post_cvi.var, post_ex.var, rtol=1e-7, atol=1e-10)
    # at the fixed point the ELBO equals the exact lml
    np.testing.assert_allclose(
        m.elbo(), exact.log_marginal_likelihood(), rtol=1e-8
    )


def test_gaussian_cvi_with_missing_data():
    rng = np.random.default_rng(1)
    T = 30
    t = np.sort(rng.uniform(0, 3, T))
    y = np.sin(2 * t) + 0.1 * rng.normal(size=T)
    y = jnp.asarray(y)[:, None].at[jnp.array([2, 9, 17])].set(jnp.nan)
    t = jnp.asarray(t)
    kern = Matern32(lengthscale=0.5)
    lik = Gaussian(positive_param(0.1))
    m = CVIGP.init(t, y, kern, lik).natural_gradient_update(1.0)
    exact = StateSpaceGP(t=t, Y=y, kernel=kern, likelihood=lik)
    np.testing.assert_allclose(m.elbo(), exact.log_marginal_likelihood(), rtol=1e-8)
    post_cvi, post_ex = m.posterior(), exact.posterior()
    np.testing.assert_allclose(post_cvi.mean, post_ex.mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(post_cvi.var, post_ex.var, rtol=1e-6, atol=1e-9)


def _direct_vgp_optimum(K, y, lik_ell, iters=4000, lr=0.02):
    """Directly maximise the dense-GP ELBO over q = N(m, L L^T):
    ELBO = sum_i ELL_i(m_i, S_ii) - KL(q || N(0, K)). Returns (m, diag S)."""
    T = len(y)
    Kj = jnp.asarray(K) + 1e-10 * jnp.eye(T)
    Lk = jnp.linalg.cholesky(Kj)

    def unpack(theta):
        m = theta[:T]
        tril = jnp.zeros((T, T)).at[jnp.tril_indices(T)].set(theta[T:])
        diag = jnp.exp(jnp.diagonal(tril))
        L = tril.at[jnp.diag_indices(T)].set(diag)
        return m, L

    def neg_elbo(theta):
        m, L = unpack(theta)
        S_diag = jnp.sum(L * L, axis=1)
        ell = jnp.sum(lik_ell(jnp.asarray(y), m, S_diag))
        # KL(N(m, LL^T) || N(0, K))
        A = jax.scipy.linalg.solve_triangular(Lk, L, lower=True)
        b = jax.scipy.linalg.solve_triangular(Lk, m, lower=True)
        kl = 0.5 * (
            jnp.sum(A * A)
            + b @ b
            - T
            - 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
            + 2 * jnp.sum(jnp.log(jnp.diagonal(Lk)))
        )
        return kl - ell

    import optax

    theta = jnp.zeros(T + T * (T + 1) // 2)
    # init L = 0.5 * I in log-diag parameterisation
    opt = optax.adam(lr)
    state = opt.init(theta)
    step = jax.jit(
        lambda th, st: (lambda g: (optax.apply_updates(th, opt.update(g, st)[0]),
                                   opt.update(g, st)[1]))(jax.grad(neg_elbo)(th))
    )
    for _ in range(iters):
        theta, state = step(theta, state)
    m, L = unpack(theta)
    return np.asarray(m), np.asarray(jnp.sum(L * L, axis=1)), float(-neg_elbo(theta))


def test_poisson_cvi_matches_direct_elbo_optimum():
    """CVI fixed point == argmax of the ELBO (computed by direct gradient
    ascent on a dense-GP parameterisation of q)."""
    from physs_gp_tpu.likelihoods.nongaussian import expected_log_lik as ell_fn

    t = jnp.asarray([0.0, 0.35, 1.0])
    kern = Matern32(lengthscale=0.8, variance=0.6)
    K = np.asarray(kern.K(t[:, None], t[:, None]))
    y = np.array([1.0, 3.0, 0.0])
    m = CVIGP.init(t, jnp.asarray(y)[:, None], kern, Poisson())
    for _ in range(200):
        m = m.natural_gradient_update(0.7)
    post = m.posterior()
    lik = Poisson()
    mean_d, var_d, elbo_d = _direct_vgp_optimum(
        K, y, lambda yy, mm, vv: ell_fn(lik, yy, mm, vv)
    )
    np.testing.assert_allclose(post.mean[:, 0], mean_d, atol=2e-4)
    np.testing.assert_allclose(post.var[:, 0], var_d, atol=2e-4)
    np.testing.assert_allclose(float(m.elbo()), elbo_d, atol=1e-5)


@pytest.mark.parametrize("parallel", [False, True])
def test_elbo_monotone_poisson(parallel):
    rng = np.random.default_rng(3)
    T = 60
    t = np.sort(rng.uniform(0, 6, T))
    f = 1.2 * np.sin(t) + 0.3
    y = rng.poisson(np.exp(f)).astype(float)
    m = CVIGP.init(
        jnp.asarray(t), jnp.asarray(y)[:, None], Matern52(lengthscale=1.0),
        Poisson(), parallel=parallel,
    )
    elbos = [float(m.elbo())]
    for _ in range(30):
        m = m.natural_gradient_update(0.8)
        elbos.append(float(m.elbo()))
    diffs = np.diff(elbos)
    # allow tiny numerical wiggle near convergence
    assert (diffs > -1e-6).all(), f"ELBO not monotone: {elbos}"
    assert elbos[-1] > elbos[0] + 1.0


def test_bernoulli_cvi_trains_and_predicts():
    rng = np.random.default_rng(4)
    T = 80
    t = np.sort(rng.uniform(0, 8, T))
    f = 2.0 * np.sin(t)
    y = (rng.uniform(size=T) < jax.scipy.stats.norm.cdf(f)).astype(float)
    m = CVIGP.init(
        jnp.asarray(t), jnp.asarray(y)[:, None], Matern52(lengthscale=1.5),
        Bernoulli(),
    )
    e0 = float(m.elbo())
    for _ in range(40):
        m = m.natural_gradient_update(0.8)
    assert float(m.elbo()) > e0 + 5.0
    # probability predictions in [0,1], correlated with truth
    pred = m.predict_y(jnp.asarray(t))
    p = np.asarray(pred.mean[:, 0])
    assert (p >= 0).all() and (p <= 1).all()
    truth = jax.scipy.stats.norm.cdf(f)
    assert np.corrcoef(p, truth)[0, 1] > 0.8
    # nlpd finite and better than chance
    nlpd = float(m.nlpd(jnp.asarray(t), jnp.asarray(y)[:, None][:, 0] * 1.0))
    assert np.isfinite(nlpd) and nlpd < np.log(2.0)


def test_vb_ng_adam_improves_hyperparams():
    from physs_gp_tpu.trainers import VB_NG_Adam

    rng = np.random.default_rng(5)
    T = 100
    t = np.sort(rng.uniform(0, 10, T))
    f = 1.5 * np.sin(t)
    y = rng.poisson(np.exp(f)).astype(float)
    m = CVIGP.init(
        jnp.asarray(t), jnp.asarray(y)[:, None], Matern32(lengthscale=3.0),
        Poisson(),
    )
    trainer = VB_NG_Adam(m, adam_lr=0.05, ng_lr=0.8)
    m2, losses = trainer.train(m, 25)
    assert losses[-1] < losses[0] - 5.0
    ls = float(m2.kernel.lengthscales.value)
    assert 0.2 < ls < 3.0  # moved off the bad init toward the truth (~1)

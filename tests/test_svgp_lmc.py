"""SVGP + LMC gates:
- SVGP with Z == X and Gaussian likelihood reaches the exact GP posterior /
  ELBO -> lml at the optimum;
- SVGP Poisson matches CVI on the same 1-D problem;
- LMC gram is PSD, correlates outputs, and fits multi-output data.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from physs_gp_tpu.kernels import Matern32, Matern52, RBF
from physs_gp_tpu.kernels.multi_output import LMC
from physs_gp_tpu.likelihoods import Gaussian, Poisson
from physs_gp_tpu.models import CVIGP, StateSpaceGP
from physs_gp_tpu.models.batch_gp import BatchGP
from physs_gp_tpu.models.svgp import SVGP
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.utils.training import trainable_mask, zero_untrainable


def _train(model, steps=400, lr=0.02, mask_data=True):
    mask = trainable_mask(model)
    opt = optax.adam(lr)
    state = opt.init(model)

    @jax.jit
    def step(m, s):
        loss, g = jax.value_and_grad(lambda mm: mm.get_objective())(m)
        g = zero_untrainable(g, mask)
        updates, s = opt.update(g, s)
        return optax.apply_updates(m, updates), s, loss

    for _ in range(steps):
        model, state, loss = step(model, state)
    return model, float(loss)


def test_svgp_full_rank_recovers_exact_gp():
    rng = np.random.default_rng(0)
    N = 40
    X = np.sort(rng.uniform(0, 5, N))[:, None]
    y = np.sin(2 * X[:, 0]) + 0.1 * rng.normal(size=N)
    kern = Matern52(lengthscale=0.8, variance=1.0)
    noise = 0.01
    lik = Gaussian(positive_param(noise).fix())
    m = SVGP.init(X, y[:, None], X, kern, lik)
    # freeze kernel hyperparams so only q is optimised -> exact ELBO == lml
    m = jax.tree_util.tree_map(lambda x: x, m)
    import dataclasses

    frozen_kern = Matern52(
        lengthscale=positive_param(0.8).fix(), variance=positive_param(1.0).fix()
    )
    m = dataclasses.replace(m, kernel=frozen_kern)
    m, _ = _train(m, steps=1500, lr=0.05)
    exact = BatchGP(X=jnp.asarray(X), Y=jnp.asarray(y)[:, None],
                    kernel=frozen_kern, likelihood=lik)
    lml = float(exact.log_marginal_likelihood())
    elbo = float(m.elbo())
    assert abs(elbo - lml) < 0.05, (elbo, lml)
    pf = m.predict_f(jnp.asarray(X))
    pe = exact.predict_f(jnp.asarray(X))
    np.testing.assert_allclose(pf.mean, pe.mean, atol=2e-3)
    np.testing.assert_allclose(pf.var, pe.var, atol=2e-3)


def test_svgp_poisson_matches_cvi():
    rng = np.random.default_rng(1)
    T = 60
    t = np.sort(rng.uniform(0, 6, T))
    f = 1.1 * np.sin(t) + 0.3
    y = rng.poisson(np.exp(f)).astype(float)
    kern = Matern32(
        lengthscale=positive_param(1.0).fix(), variance=positive_param(1.0).fix()
    )
    svgp = SVGP.init(t[:, None], y[:, None], t[:, None], kern, Poisson())
    svgp, _ = _train(svgp, steps=2500, lr=0.05)
    cvi = CVIGP.init(jnp.asarray(t), jnp.asarray(y)[:, None], kern, Poisson())
    for _ in range(100):
        cvi = cvi.natural_gradient_update(0.9)
    p_s = svgp.predict_f(jnp.asarray(t)[:, None])
    p_c = cvi.posterior()
    np.testing.assert_allclose(p_s.mean, p_c.mean, atol=2e-2)
    np.testing.assert_allclose(p_s.var, p_c.var, atol=2e-2)
    np.testing.assert_allclose(float(svgp.elbo()), float(cvi.elbo()), atol=0.5)


def test_lmc_psd_and_fits_correlated_outputs():
    rng = np.random.default_rng(2)
    N = 35
    X = np.sort(rng.uniform(0, 4, N))[:, None]
    g = np.sin(2 * X[:, 0])
    Y = np.stack([g + 0.05 * rng.normal(size=N),
                  -0.7 * g + 0.05 * rng.normal(size=N)], -1)
    lmc = LMC.init([RBF(lengthscales=positive_param(0.7))], P=2)
    K = lmc.K(X, X)
    np.testing.assert_allclose(K, K.T, atol=1e-10)
    assert np.linalg.eigvalsh(np.asarray(K)).min() > -1e-9
    np.testing.assert_allclose(np.diag(np.asarray(K)), lmc.K_diag(X), rtol=1e-8)

    m = BatchGP(X=jnp.asarray(X), Y=jnp.asarray(Y), kernel=lmc,
                likelihood=Gaussian(positive_param(0.0025)))
    m, loss = _train(m, steps=300, lr=0.05)
    pred = m.predict_f(jnp.asarray(X))
    rmse = float(np.sqrt(np.mean((np.asarray(pred.mean) - np.stack(
        [g, -0.7 * g], -1)) ** 2)))
    assert rmse < 0.05, rmse
    # learned mixing should be ~rank-1 with ratio ~ -0.7
    W = np.asarray(m.kernel.W.value)
    ratio = W[1, 0] / W[0, 0]
    assert abs(ratio + 0.7) < 0.15, ratio


def test_svgp_natural_gradient_one_step_conjugate():
    """With a Gaussian likelihood, one lr=1 natural-gradient step jumps to
    the exact optimum (classic conjugate exp-family result)."""
    rng = np.random.default_rng(5)
    N = 30
    X = np.sort(rng.uniform(0, 4, N))[:, None]
    y = np.sin(2 * X[:, 0]) + 0.1 * rng.normal(size=N)
    kern = Matern52(
        lengthscale=positive_param(0.8).fix(), variance=positive_param(1.0).fix()
    )
    lik = Gaussian(positive_param(0.01).fix())
    m = SVGP.init(X, y[:, None], X, kern, lik, whiten=False)
    m = m.natural_gradient_update(1.0)
    exact = BatchGP(X=jnp.asarray(X), Y=jnp.asarray(y)[:, None], kernel=kern,
                    likelihood=lik)
    np.testing.assert_allclose(
        float(m.elbo()), float(exact.log_marginal_likelihood()), rtol=1e-6
    )
    pf, pe = m.predict_f(jnp.asarray(X)), exact.predict_f(jnp.asarray(X))
    np.testing.assert_allclose(pf.mean, pe.mean, atol=1e-6)
    np.testing.assert_allclose(pf.var, pe.var, atol=1e-6)


def test_gprn_fits_signdependent_mixing():
    """GPRN: output = w(x) * g(x) with a sign-flipping weight — LMC (constant
    mixing) cannot represent this; GPRN must."""
    from physs_gp_tpu.models import GPRN

    rng = np.random.default_rng(7)
    N = 60
    X = np.sort(rng.uniform(-3, 3, N))[:, None]
    w = np.tanh(X[:, 0])          # slowly varying mixing weight
    g = np.sin(3 * X[:, 0])       # fast latent
    Y = (w * g + 0.05 * rng.normal(size=N))[:, None]
    m = GPRN.init(
        X, Y, X[::2], kernel_w=RBF(lengthscales=positive_param(2.0)),
        kernel_g=RBF(lengthscales=positive_param(0.6)),
        n_latent=1, noise=0.0025, n_mc=8,
    )
    m, loss = _train(m, steps=800, lr=0.02)
    pred = m.predict_f(jnp.asarray(X))
    r = float(np.sqrt(np.mean((np.asarray(pred.mean[:, 0]) - w * g) ** 2)))
    assert r < 0.15, r

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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_lmc_ldl_identity_recovers_independent_latents():
    """UnitLowerMixing with zero strict-lower entries gives W = I, so the
    LMC gram equals the block-diagonal of the latent kernels (ref LMC_LDL,
    `transforms/multi_output.py:357-383`)."""
    from physs_gp_tpu.kernels.multi_output import UnitLowerMixing

    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 3, 9))[:, None]
    lats = [RBF(lengthscales=positive_param(0.5)),
            Matern52(lengthscale=positive_param(1.2))]
    m = LMC.init_ldl(lats, P=2)
    W = np.asarray(m.W.value)
    np.testing.assert_allclose(W, np.eye(2), atol=0)
    K = np.asarray(m.K(X, X))  # [2N, 2N] output-minor ordering
    K00 = np.asarray(lats[0].K(X, X))
    K11 = np.asarray(lats[1].K(X, X))
    np.testing.assert_allclose(K[0::2, 0::2], K00, rtol=1e-10)
    np.testing.assert_allclose(K[1::2, 1::2], K11, rtol=1e-10)
    np.testing.assert_allclose(K[0::2, 1::2], 0.0, atol=1e-12)

    # nonzero strict-lower entry mixes latent 0 into output 1
    from physs_gp_tpu.utils.struct import replace
    from physs_gp_tpu.utils.params import param as _param

    m2 = replace(m, W=replace(m.W, z=_param(jnp.asarray([0.5]))))
    K2 = np.asarray(m2.K(X, X))
    np.testing.assert_allclose(
        K2[1::2, 1::2], K11 + 0.25 * K00, rtol=1e-9
    )
    np.testing.assert_allclose(K2[0::2, 1::2], 0.5 * K00, rtol=1e-9)


@pytest.mark.slow
def test_lmc_drd_scales_and_correlation():
    """CorrelationMixing: z=0 -> W = diag(scales) (independent scaled
    outputs); W W^T always has unit-correlation structure scaled by s_p s_q
    (ref LMC_DRD, `transforms/multi_output.py:386-430`)."""
    from physs_gp_tpu.kernels.multi_output import CorrelationMixing

    lats = [RBF(lengthscales=positive_param(0.5)),
            RBF(lengthscales=positive_param(0.5))]
    m = LMC.init_drd(lats, scales=[1.5, 0.5])
    W = np.asarray(m.W.value)
    np.testing.assert_allclose(W, np.diag([1.5, 0.5]), atol=1e-12)
    # correlation rows of W/scales are unit-norm for ANY z
    from physs_gp_tpu.utils.struct import replace
    from physs_gp_tpu.utils.params import param as _param

    m2 = replace(m, W=replace(m.W, z=_param(jnp.asarray([0.8]))))
    W2 = np.asarray(m2.W.value)
    corr_rows = W2 / np.array([1.5, 0.5])[:, None]
    np.testing.assert_allclose(
        np.sum(corr_rows**2, axis=1), np.ones(2), rtol=1e-10
    )
    # mixing is PSD and differentiable
    X = np.linspace(0, 2, 6)[:, None]
    K = np.asarray(m2.K(X, X))
    assert np.linalg.eigvalsh(K).min() > -1e-9
    g = jax.grad(lambda mm: jnp.sum(mm.K(jnp.asarray(X), jnp.asarray(X))))(m2)
    assert np.all(np.isfinite(np.asarray(g.W.z.raw)))


@pytest.mark.parametrize("mixing", ["softplus", "ldl", "drd"])
@pytest.mark.slow
def test_gprn_mixing_variants_run_and_train(mixing):
    """GPRN_Exp/LDL/DRD analogues: finite ELBO, finite grads, one Adam step
    improves (ref `transforms/multi_output.py:56-203`)."""
    from physs_gp_tpu.models import GPRN

    rng = np.random.default_rng(11)
    N = 24
    X = np.sort(rng.uniform(-2, 2, N))[:, None]
    g = np.sin(2 * X[:, 0])
    Y = np.stack([g, 0.6 * g], -1) + 0.05 * rng.normal(size=(N, 2))
    m = GPRN.init(
        X, Y, X[::3],
        kernel_w=RBF(lengthscales=positive_param(2.0)),
        kernel_g=RBF(lengthscales=positive_param(0.8)),
        n_latent=2, noise=0.01, n_mc=4, mixing=mixing,
    )
    e0 = float(m.elbo())
    assert np.isfinite(e0)
    grads = jax.grad(lambda mm: mm.get_objective())(m)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    m2, final_loss = _train(m, steps=60, lr=0.05)
    assert final_loss < -e0  # objective (= -elbo) decreased from its start
    pred = m2.predict_f(jnp.asarray(X))
    assert np.all(np.isfinite(np.asarray(pred.mean)))
    if mixing == "softplus":
        # softplus mixing implies positive weights: check by construction
        f = jnp.zeros((1, m2._n_w("softplus", 2, 2) + 2, 3))
        y0 = m2._mix(f, 3)
        assert np.all(np.isfinite(np.asarray(y0)))


def test_markov_lmc_matches_batch_lmc():
    """State-space LMC (MixedValueHead rows over stacked Markov latents,
    `zoo.lmc_markov_gp`) == the batch LMC kernel's exact lml on the same
    data — the two realisations of `transforms/multi_output.py:206` must
    agree to fp64 tolerance, incl. missing entries, sequential AND parallel."""
    from physs_gp_tpu.kernels import Matern32, Matern52
    from physs_gp_tpu.models import BatchGP
    from physs_gp_tpu.likelihoods.gaussian import Gaussian
    from physs_gp_tpu.zoo import lmc_markov_gp

    rng = np.random.default_rng(7)
    T, P = 18, 3
    t = np.sort(rng.uniform(0, 4, T))
    lat = [Matern32(lengthscale=0.7, variance=1.0),
           Matern52(lengthscale=1.8, variance=0.6)]
    W = rng.normal(size=(P, 2))
    Y = rng.normal(size=(T, P))
    Y[3, 1] = np.nan
    Y[9, 0] = np.nan
    noise = 0.05

    lmls = {}
    for parallel in (False, True):
        m = lmc_markov_gp(t, Y, lat, mixing=jnp.asarray(W), noise=noise,
                          parallel=parallel)
        lmls[parallel] = float(m.log_marginal_likelihood())

    from physs_gp_tpu.kernels.multi_output import LMC
    from physs_gp_tpu.utils.params import param as _param

    batch = BatchGP(
        X=jnp.asarray(t)[:, None], Y=jnp.asarray(Y),
        kernel=LMC(latents=lat, W=_param(jnp.asarray(W))),
        likelihood=Gaussian(positive_param(noise)),
    )
    lml_batch = float(batch.log_marginal_likelihood())
    np.testing.assert_allclose(lmls[False], lml_batch, rtol=1e-8)
    np.testing.assert_allclose(lmls[True], lml_batch, rtol=1e-8)


def test_markov_lmc_mixing_variants_and_training():
    """LMC_LDL/DRD mixing objects drop into the state-space head, W is
    trainable by default, and a CVI (Poisson) variant runs."""
    from physs_gp_tpu.kernels import Matern32
    from physs_gp_tpu.kernels.multi_output import UnitLowerMixing
    from physs_gp_tpu.likelihoods import Poisson
    from physs_gp_tpu.utils.training import trainable_mask
    from physs_gp_tpu.zoo import lmc_markov_gp

    rng = np.random.default_rng(1)
    T, P = 16, 2
    t = np.sort(rng.uniform(0, 4, T))
    lat = [Matern32(lengthscale=1.0, variance=1.0) for _ in range(P)]

    # unit-lower mixing (ref LMC_LDL): zero strict-lower == independent heads
    m = lmc_markov_gp(t, rng.normal(size=(T, P)), lat,
                      mixing=UnitLowerMixing.init(P, P), noise=0.1)
    lml = float(m.log_marginal_likelihood())
    assert np.isfinite(lml)

    # default mixing is a trainable Param
    m2 = lmc_markov_gp(t, rng.normal(size=(T, P)), lat, noise=0.1)
    mask = trainable_mask(m2)
    w_leaf = mask.observation.heads[0].W.raw
    assert bool(np.all(np.asarray(w_leaf)))

    # CVI path (Poisson counts)
    y = rng.poisson(1.0, size=(T, P)).astype(float)
    mc = lmc_markov_gp(t, y, lat, likelihood=Poisson(), cvi=True)
    import jax

    mc2, elbo = jax.jit(lambda mm: mm.step_with_elbo(0.8))(mc)
    assert np.isfinite(float(elbo))


def test_svgp_lmc_conjugate_one_step_matches_batch():
    """SVGP over a MULTI-OUTPUT kernel (the reference's variational
    `lmc_regression`, `zoo/multi_output.py:88` inference='Variational'):
    with Z == X and a Gaussian likelihood, one lr=1 natural-gradient step
    reaches the exact multi-output posterior — ELBO == BatchGP(LMC) lml."""
    from physs_gp_tpu.utils.params import param as _param

    rng = np.random.default_rng(11)
    N, P = 14, 2
    X = np.sort(rng.uniform(0, 4, N))[:, None]
    W = rng.normal(size=(P, 2))
    lats = [RBF(lengthscales=positive_param(0.7)),
            Matern52(lengthscale=positive_param(1.4))]
    lmc = LMC(latents=lats, W=_param(jnp.asarray(W)))
    g = np.sin(2 * X[:, 0])
    Y = np.stack([g, -0.5 * g], -1) + 0.05 * rng.normal(size=(N, P))
    lik = Gaussian(positive_param(0.01).fix())

    m = SVGP.init(X, Y, X, lmc, lik, whiten=False)
    m = m.natural_gradient_update(1.0)
    exact = BatchGP(X=jnp.asarray(X), Y=jnp.asarray(Y), kernel=lmc,
                    likelihood=lik)
    # exact up to the inducing-gram jitter (the [N*P, N*P] LMC gram is
    # larger and closer to singular than the single-output case above)
    np.testing.assert_allclose(
        float(m.elbo()), float(exact.log_marginal_likelihood()), rtol=2e-4
    )
    pf, pe = m.predict_f(jnp.asarray(X)), exact.predict_f(jnp.asarray(X))
    np.testing.assert_allclose(pf.mean, pe.mean, atol=1e-4)
    np.testing.assert_allclose(pf.var, pe.var, atol=1e-4)

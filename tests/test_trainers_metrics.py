"""Trainers, metrics, checkpointing gates."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern32
from physs_gp_tpu.likelihoods import Gaussian, Poisson
from physs_gp_tpu.metrics import confidence_interval, gaussian_nlpd, nlpd_quadrature, rmse
from physs_gp_tpu.models import CVIGP, StateSpaceGP
from physs_gp_tpu.trainers import LBFGSTrainer, VB_NG_LBFGS
from physs_gp_tpu.utils import load_model, save_model
from physs_gp_tpu.utils.params import positive_param


def _model(seed=0, T=80):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 6, T))
    y = np.sin(2 * t) + 0.1 * rng.normal(size=T)
    return StateSpaceGP(
        t=jnp.asarray(t), Y=jnp.asarray(y)[:, None],
        kernel=Matern32(lengthscale=2.0, variance=0.5),
        likelihood=Gaussian(positive_param(0.5)),
    )


@pytest.mark.slow
def test_lbfgs_trainer_converges():
    m = _model()
    tr = LBFGSTrainer(m)
    m2, losses = tr.train(m, 40)
    assert losses[-1] < losses[0] - 20
    # learned noise should approach the true 0.01 variance
    assert float(m2.likelihood.variance.value) < 0.1


@pytest.mark.slow
def test_vb_ng_lbfgs_on_poisson():
    rng = np.random.default_rng(1)
    T = 60
    t = np.sort(rng.uniform(0, 6, T))
    y = rng.poisson(np.exp(1.1 * np.sin(t)))
    m = CVIGP.init(jnp.asarray(t), jnp.asarray(y * 1.0)[:, None],
                   Matern32(lengthscale=2.0), Poisson())
    tr = VB_NG_LBFGS(m, ng_lr=0.8)
    m2, losses = tr.train(m, 10)
    assert losses[-1] < losses[0]


def test_metrics():
    y = jnp.asarray([1.0, 2.0, jnp.nan, 4.0])
    mean = jnp.asarray([1.1, 2.2, 0.0, 3.8])
    var = jnp.asarray([0.04, 0.04, 1.0, 0.04])
    r = float(rmse(y, mean))
    np.testing.assert_allclose(
        r, np.sqrt((0.01 + 0.04 + 0.04) / 3), rtol=1e-6
    )
    n = float(gaussian_nlpd(y, mean, var))
    assert np.isfinite(n)
    # quadrature NLPD of a Gaussian likelihood == closed form
    lik = Gaussian(positive_param(0.04))
    nq = float(nlpd_quadrature(lik, y, mean, jnp.zeros_like(var) + 1e-12))
    nc = float(gaussian_nlpd(y, mean, jnp.zeros_like(var) + 0.04))
    np.testing.assert_allclose(nq, nc, rtol=1e-4)
    lo, hi = confidence_interval(mean, var, 0.95)
    np.testing.assert_allclose(hi - mean, 1.959964 * jnp.sqrt(var), rtol=1e-5)


@pytest.mark.slow
def test_checkpoint_roundtrip():
    m = _model()
    tr = LBFGSTrainer(m)
    m2, _ = tr.train(m, 10)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_model(path, m2)
        m3 = load_model(path, _model())
        np.testing.assert_allclose(
            m3.kernel.lengthscales.raw, m2.kernel.lengthscales.raw
        )
        np.testing.assert_allclose(
            float(m3.log_marginal_likelihood()),
            float(m2.log_marginal_likelihood()),
            rtol=1e-12,
        )
        # wrong-structure template is rejected
        import dataclasses

        bad = dataclasses.replace(_model(), parallel=True)
        with pytest.raises(ValueError):
            load_model(path, bad)


def test_cvi_ell_sites_matches_dense_oracle():
    """_ell_sites' fused inverse+logdet form == naive per-step active-block
    computation (scipy logpdf + explicit inverse trace), incl. NaN sites."""
    from scipy.stats import multivariate_normal

    rng = np.random.default_rng(5)
    T, p = 9, 3
    t = np.sort(rng.uniform(0, 3, T))
    Y = rng.normal(size=(T, p))
    Y[2, 1] = np.nan  # inactive site element
    Y[6, 0] = np.nan
    m_q = rng.normal(size=(T, p))
    S_half = rng.normal(size=(T, p, p)) * 0.3
    S_q = S_half @ np.swapaxes(S_half, -1, -2) + 0.5 * np.eye(p)
    V_half = rng.normal(size=(T, p, p)) * 0.2
    V = V_half @ np.swapaxes(V_half, -1, -2) + 0.8 * np.eye(p)

    model = CVIGP.init(
        jnp.asarray(t), jnp.asarray(Y),
        Matern32(lengthscale=1.0, variance=1.0),
        Gaussian(positive_param(0.1)),
    )
    sites = model.sites
    sites = type(sites)(Y=jnp.where(jnp.isfinite(sites.Y), jnp.asarray(Y),
                                    jnp.nan), V=jnp.asarray(V))
    model = jax.tree_util.tree_map(lambda x: x, model)  # copy
    import dataclasses

    model = dataclasses.replace(model, sites=sites)

    got = float(model._ell_sites(jnp.asarray(m_q), jnp.asarray(S_q)))

    want = 0.0
    for k in range(T):
        ok = np.isfinite(Y[k])
        if not ok.any():
            continue
        Vk = V[k][np.ix_(ok, ok)]
        want += multivariate_normal.logpdf(Y[k][ok], m_q[k][ok], Vk)
        want += -0.5 * np.trace(
            np.linalg.solve(Vk, S_q[k][np.ix_(ok, ok)])
        )
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_multioutput_cvi_partial_nan_matches_exact():
    """Multi-output Gaussian CVI with PARTIAL per-step NaN patterns: one
    lr=1 step via step_with_elbo must reproduce the exact conjugate model
    (elbo == lml, matching posterior) — gates the fused site-ELL + shared
    naturals on the masked multi-output corner."""
    from physs_gp_tpu.kernels import StackedMarkov
    from physs_gp_tpu.likelihoods.gaussian import IndependentGaussian

    rng = np.random.default_rng(4)
    T, P = 24, 3
    t = np.sort(rng.uniform(0, 3, T))
    y = np.stack(
        [np.sin(2 * t), np.cos(t), 0.5 * np.sin(3 * t)], axis=1
    ) + 0.1 * rng.normal(size=(T, P))
    y[3, 1] = np.nan
    y[10, 0] = np.nan
    y[10, 2] = np.nan
    y[17] = np.nan  # fully-missing step
    t, y = jnp.asarray(t), jnp.asarray(y)
    kern = StackedMarkov(
        parts=[Matern32(lengthscale=0.6, variance=1.0) for _ in range(P)]
    )
    noises = [0.05, 0.1, 0.2]
    lik = IndependentGaussian(variances=[positive_param(v) for v in noises])

    m = CVIGP.init(t, y, kern, lik)
    m2, elbo0 = jax.jit(lambda mm: mm.step_with_elbo(1.0))(m)
    _, elbo1 = m2.step_with_elbo(1.0)

    exact = StateSpaceGP(t=t, Y=y, kernel=kern, likelihood=lik)
    lml = exact.log_marginal_likelihood()
    # at the conjugate fixed point (one lr=1 step) the ELBO is tight
    np.testing.assert_allclose(float(elbo1), float(lml), rtol=1e-8)
    post_cvi, post_ex = m2.posterior(), exact.posterior()
    np.testing.assert_allclose(post_cvi.mean, post_ex.mean, rtol=1e-6,
                               atol=1e-9)
    np.testing.assert_allclose(post_cvi.var, post_ex.var, rtol=1e-6,
                               atol=1e-9)


def test_natgrad_scan_matches_host_loop():
    """In-graph natgrad_scan == looping step_with_elbo on the host."""
    from physs_gp_tpu.trainers import natgrad_scan

    rng = np.random.default_rng(2)
    T = 50
    t = np.sort(rng.uniform(0, 6, T))
    y = rng.poisson(np.exp(1.1 * np.sin(t)))
    m = CVIGP.init(jnp.asarray(t), jnp.asarray(y * 1.0)[:, None],
                   Matern32(lengthscale=2.0), Poisson())

    m_scan, elbos = jax.jit(
        lambda mm: natgrad_scan(mm, 0.5, n_steps=4)
    )(m)

    m_host = m
    host_elbos = []
    step = jax.jit(lambda mm: mm.step_with_elbo(0.5))
    for _ in range(4):
        m_host, e = step(m_host)
        host_elbos.append(float(e))

    np.testing.assert_allclose(np.asarray(elbos), host_elbos, rtol=1e-10)
    np.testing.assert_allclose(m_scan.sites.Y, m_host.sites.Y, rtol=1e-12)
    np.testing.assert_allclose(m_scan.sites.V, m_host.sites.V, rtol=1e-12)
    assert np.all(np.diff(np.asarray(elbos)) > 0)  # monotone on conjugate-ish


def test_natgrad_scan_nan_guard_reverts():
    """A step that NaNs the sites is reverted in-graph (no propagation)."""
    from physs_gp_tpu.trainers import natgrad_scan

    rng = np.random.default_rng(3)
    T = 40
    t = np.sort(rng.uniform(0, 6, T))
    y = rng.poisson(np.exp(np.sin(t)))
    m = CVIGP.init(jnp.asarray(t), jnp.asarray(y * 1.0)[:, None],
                   Matern32(lengthscale=2.0), Poisson())
    # an absurd lr drives the site update non-finite on some step; the guard
    # must keep every carried site leaf finite-patterned
    m2, elbos = jax.jit(
        lambda mm: natgrad_scan(mm, jnp.asarray([0.5, 1e12, 0.5, 0.5]))
    )(m)
    assert bool(jnp.all(jnp.isfinite(m2.sites.V)))
    assert bool(jnp.all(jnp.isfinite(m2.sites.Y)
                        == jnp.isfinite(m.sites.Y)))
    assert np.isfinite(float(elbos[-1]))


def test_vb_ng_adam_scan_trains():
    """In-graph VB_NG_ADAM improves the ELBO and moves hyperparameters."""
    from physs_gp_tpu.trainers import vb_ng_adam_scan

    rng = np.random.default_rng(4)
    T = 50
    t = np.sort(rng.uniform(0, 6, T))
    y = rng.poisson(np.exp(1.1 * np.sin(t)))
    m = CVIGP.init(jnp.asarray(t), jnp.asarray(y * 1.0)[:, None],
                   Matern32(lengthscale=2.0), Poisson())
    ls0 = float(m.kernel.lengthscales.value)
    m2, elbos = jax.jit(
        lambda mm: vb_ng_adam_scan(mm, n_steps=8, adam_lr=5e-2, ng_lr=0.5)
    )(m)
    assert float(elbos[-1]) > float(elbos[0])
    assert abs(float(m2.kernel.lengthscales.value) - ls0) > 1e-4


def test_adam_scan_matches_adam_trainer():
    """In-graph adam_scan == AdamTrainer's host loop (same opt, same lr)."""
    from physs_gp_tpu.trainers import AdamTrainer, adam_scan

    m = _model(seed=5, T=60)
    m_scan, losses_scan = jax.jit(
        lambda mm: adam_scan(mm, n_steps=5, lr=1e-2)
    )(m)
    tr = AdamTrainer(m, lr=1e-2)
    m_host, losses_host = tr.train(m, 5)
    np.testing.assert_allclose(
        np.asarray(losses_scan), losses_host, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_scan.likelihood.variance.value),
        float(m_host.likelihood.variance.value), rtol=1e-6,
    )
    assert float(losses_scan[-1]) < float(losses_scan[0])

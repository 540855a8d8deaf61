"""Square-root filter gates: sqrt variants == covariance variants (fp64),
and fp32 robustness where the covariance form fails."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern32, Matern52
from physs_gp_tpu.likelihoods import Gaussian
from physs_gp_tpu.models import StateSpaceGP
from physs_gp_tpu.utils.params import positive_param


def make_model(T=200, seed=0, noise=0.05, **kw):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 8, T))
    y = np.sin(2 * t) + 0.1 * rng.normal(size=T)
    y[7] = np.nan
    return StateSpaceGP(
        t=jnp.asarray(t),
        Y=jnp.asarray(y)[:, None],
        kernel=Matern52(lengthscale=0.7, variance=1.2),
        likelihood=Gaussian(positive_param(noise)),
        **kw,
    )


@pytest.mark.parametrize("parallel", [False, True])
@pytest.mark.slow
def test_sqrt_equals_covariance_form(parallel):
    m_cov = make_model(parallel=parallel, sqrt=False)
    m_sqrt = make_model(parallel=parallel, sqrt=True)
    np.testing.assert_allclose(
        m_sqrt.log_marginal_likelihood(), m_cov.log_marginal_likelihood(),
        rtol=1e-8,
    )
    p_cov, p_sqrt = m_cov.posterior(), m_sqrt.posterior()
    np.testing.assert_allclose(p_sqrt.mean, p_cov.mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(p_sqrt.var, p_cov.var, rtol=1e-6, atol=1e-9)


@pytest.mark.slow
def test_sqrt_chunked_equals_unchunked():
    m1 = make_model(T=128, parallel=True, sqrt=True)
    m2 = make_model(T=128, parallel=True, sqrt=True, chunk_size=32)
    np.testing.assert_allclose(
        m1.log_marginal_likelihood(), m2.log_marginal_likelihood(), rtol=1e-9
    )
    p1, p2 = m1.posterior(), m2.posterior()
    np.testing.assert_allclose(p1.mean, p2.mean, rtol=1e-8)
    np.testing.assert_allclose(p1.var, p2.var, rtol=1e-7)


def test_sqrt_blocked_schedule_matches_sequential(monkeypatch):
    """Chunked sqrt scans under the TPU-default blocked schedule (reduced
    distribute combine + carry folded into the block totals) == the
    sequential sqrt filter, exercised on CPU via PHYSS_INNER_SCAN."""
    m_seq = make_model(T=96, parallel=False, sqrt=True)
    lml_seq = m_seq.log_marginal_likelihood()
    p_seq = m_seq.posterior()

    monkeypatch.setenv("PHYSS_INNER_SCAN", "blocked")
    monkeypatch.setenv("PHYSS_SCAN_BLOCKS", "8")  # force multi-block totals
    m_blk = make_model(T=96, parallel=True, sqrt=True, chunk_size=32)
    np.testing.assert_allclose(
        m_blk.log_marginal_likelihood(), lml_seq, rtol=1e-9
    )
    p_blk = m_blk.posterior()
    np.testing.assert_allclose(p_blk.mean, p_seq.mean, rtol=1e-7, atol=1e-11)
    np.testing.assert_allclose(p_blk.var, p_seq.var, rtol=1e-6, atol=1e-11)


@pytest.mark.parametrize("parallel", [False, True])
@pytest.mark.slow
def test_sqrt_gradients_match_covariance(parallel):
    rng = np.random.default_rng(1)
    T = 64
    t = jnp.asarray(np.sort(rng.uniform(0, 4, T)))
    y = jnp.asarray(np.sin(2 * np.asarray(t)) + 0.1 * rng.normal(size=T))[:, None]

    def lml(log_ls, sqrt):
        m = StateSpaceGP(
            t=t, Y=y, kernel=Matern32(lengthscale=jnp.exp(log_ls)),
            likelihood=Gaussian(positive_param(0.05)),
            parallel=parallel, sqrt=sqrt,
        )
        return m.log_marginal_likelihood()

    g_sqrt = jax.grad(lambda l: lml(l, True))(jnp.asarray(0.1))
    g_cov = jax.grad(lambda l: lml(l, False))(jnp.asarray(0.1))
    np.testing.assert_allclose(g_sqrt, g_cov, rtol=1e-5)


@pytest.mark.slow
def test_sqrt_posterior_variances_never_negative_fp32_stress():
    """fp32 + tight observation noise: the sqrt path must keep variances
    PSD by construction (this is its reason to exist)."""
    rng = np.random.default_rng(2)
    T = 512
    t = np.sort(rng.uniform(0, 1, T)).astype(np.float32)  # dense sampling
    y = np.sin(20 * t).astype(np.float32)
    m = StateSpaceGP(
        t=jnp.asarray(t),
        Y=jnp.asarray(y)[:, None],
        kernel=Matern52(
            lengthscale=jnp.asarray(0.2, jnp.float32),
            variance=jnp.asarray(1.0, jnp.float32),
        ),
        likelihood=Gaussian(
            positive_param(jnp.asarray(1e-6, jnp.float32))  # brutal noise
        ),
        parallel=True,
        sqrt=True,
    )
    post = m.posterior()
    assert np.isfinite(np.asarray(post.mean)).all()
    assert (np.asarray(post.var) >= 0).all()
    assert np.isfinite(float(m.log_marginal_likelihood()))

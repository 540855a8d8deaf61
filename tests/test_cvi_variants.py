"""Model-level variant-equivalence gate for CVIGP.

The raw filter/smoother variant matrix is fuzz-gated in
`test_fuzz_kalman.py`; this file gates the same matrix THROUGH the model —
`step_with_elbo` (surrogate filter+smooth, fused site-ELL, natural-gradient
site update) must produce identical ELBOs, sites, and posteriors for every
{parallel, sqrt, chunked, blocked-schedule} configuration, on a multi-output
model with partial per-step NaN patterns (the corner where the sqrt
noise-factor masking bug lived, and where the reduced distribute combines /
init-folded carries / shared naturals could silently desynchronize).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern32, StackedMarkov
from physs_gp_tpu.likelihoods import Poisson
from physs_gp_tpu.likelihoods.gaussian import IndependentGaussian
from physs_gp_tpu.models import CVIGP
from physs_gp_tpu.utils.params import positive_param


def _gaussian_model(T=26, P=3, seed=4, **kw):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 3, T))
    y = np.stack(
        [np.sin(2 * t), np.cos(t), 0.5 * np.sin(3 * t)], axis=1
    ) + 0.1 * rng.normal(size=(T, P))
    y[3, 1] = np.nan
    y[10, 0] = np.nan
    y[10, 2] = np.nan
    y[17] = np.nan  # fully-missing step
    kern = StackedMarkov(
        parts=[Matern32(lengthscale=0.6, variance=1.0) for _ in range(P)]
    )
    lik = IndependentGaussian(
        variances=[positive_param(v) for v in (0.05, 0.1, 0.2)]
    )
    return CVIGP.init(jnp.asarray(t), jnp.asarray(y), kern, lik, **kw)


def _poisson_model(T=30, seed=0, **kw):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 10, T))
    y = rng.poisson(np.exp(np.sin(t))).astype(float)
    y[5] = np.nan
    return CVIGP.init(
        jnp.asarray(t), jnp.asarray(y)[:, None],
        Matern32(lengthscale=1.0, variance=1.0), Poisson(), **kw
    )


def _two_steps(model, lr=0.7):
    step = jax.jit(lambda mm: mm.step_with_elbo(lr))
    m1, _ = step(model)
    m2, elbo = step(m1)
    return m2, float(elbo)


VARIANTS = [
    dict(parallel=True),
    dict(parallel=True, chunk_size=7),          # T % chunk != 0 -> padding
    dict(parallel=True, sqrt=True),
    dict(parallel=True, sqrt=True, chunk_size=8),
]


@pytest.mark.parametrize("build", [_gaussian_model, _poisson_model],
                         ids=["gaussian-partial-nan", "poisson"])
@pytest.mark.parametrize("variant", VARIANTS,
                         ids=["par", "par-chunk", "sqrt", "sqrt-chunk"])
def test_cvi_step_variants_match_sequential(build, variant):
    m_ref, elbo_ref = _two_steps(build())
    m_v, elbo_v = _two_steps(build(**variant))

    np.testing.assert_allclose(elbo_v, elbo_ref, rtol=1e-8)
    np.testing.assert_allclose(m_v.sites.Y, m_ref.sites.Y, rtol=1e-7,
                               atol=1e-10)
    np.testing.assert_allclose(m_v.sites.V, m_ref.sites.V, rtol=1e-7,
                               atol=1e-10)
    p_v, p_ref = m_v.posterior(), m_ref.posterior()
    np.testing.assert_allclose(p_v.mean, p_ref.mean, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(p_v.var, p_ref.var, rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize("sqrt", [False, True])
def test_cvi_step_blocked_schedule_matches_sequential(monkeypatch, sqrt):
    """TPU-default blocked inner-scan schedule at the model level (tiny
    block width so the block-totals/distribute/carry-fold machinery all
    engage at T=26)."""
    monkeypatch.setenv("PHYSS_INNER_SCAN", "blocked")
    monkeypatch.setenv("PHYSS_SCAN_BLOCKS", "4")
    m_ref, elbo_ref = _two_steps(_gaussian_model())
    m_v, elbo_v = _two_steps(
        _gaussian_model(parallel=True, sqrt=sqrt, chunk_size=13)
    )
    np.testing.assert_allclose(elbo_v, elbo_ref, rtol=1e-8)
    np.testing.assert_allclose(m_v.sites.Y, m_ref.sites.Y, rtol=1e-7,
                               atol=1e-10)
    p_v, p_ref = m_v.posterior(), m_ref.posterior()
    np.testing.assert_allclose(p_v.var, p_ref.var, rtol=1e-6, atol=1e-10)

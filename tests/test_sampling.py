"""Posterior/prior trajectory sampling gates (`ops/sampling.py`,
`{StateSpaceGP,CVIGP,BatchGP,SVGP}.sample_f` — ref `models/vgp.py:284`
samples surface).

The parallel affine scan is gated EXACTLY against the sequential recurrence
(same key); the Matheron pathwise-conditioning construction is gated in MC
against dense joint-posterior oracles (mean AND cross-time covariance — the
jointness is the point).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern32, Matern52
from physs_gp_tpu.likelihoods import Gaussian
from physs_gp_tpu.models import StateSpaceGP
from physs_gp_tpu.ops.lgssm import build_lgssm
from physs_gp_tpu.ops.sampling import matheron_state_samples, sample_lgssm_states
from physs_gp_tpu.utils.params import positive_param


def _t(T, seed=0):
    return np.sort(np.random.default_rng(seed).uniform(0, 4, T))


def test_affine_scan_equals_sequential():
    """Parallel (A, c) associative scan == the sequential recurrence,
    bit-for-bit given the same key."""
    k = Matern52(lengthscale=0.7, variance=1.3)
    ssm = build_lgssm(k, jnp.asarray(_t(60)))
    key = jax.random.PRNGKey(0)
    xp = jax.jit(lambda: sample_lgssm_states(key, ssm, 3, parallel=True))()
    xs = jax.jit(lambda: sample_lgssm_states(key, ssm, 3, parallel=False))()
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xs), atol=1e-10)


def test_prior_sample_moments():
    """Sampled trajectories of f = Hx reproduce the kernel Gram."""
    k = Matern32(lengthscale=0.9, variance=1.4)
    t = _t(5, seed=1)
    ssm = build_lgssm(k, jnp.asarray(t))
    S = 6000
    xs = jax.jit(
        lambda key: sample_lgssm_states(key, ssm, S)
    )(jax.random.PRNGKey(1))
    f = np.asarray(xs @ ssm.H.T)[:, :, 0]  # [S, T]
    K = np.asarray(k.K(t[:, None], t[:, None]))
    emp = np.cov(f.T)
    np.testing.assert_allclose(emp, K, atol=0.12)
    np.testing.assert_allclose(f.mean(0), 0.0, atol=0.05)


def _dense_posterior(k, t, y, nv):
    K = np.asarray(k.K(t[:, None], t[:, None]))
    obs = np.isfinite(y)
    Ko = K[np.ix_(obs, obs)] + nv * np.eye(obs.sum())
    w = np.linalg.solve(Ko, y[obs])
    mean = K[:, obs] @ w
    cov = K - K[:, obs] @ np.linalg.solve(Ko, K[obs, :])
    return mean, cov


def test_matheron_posterior_joint():
    """Matheron state samples match the dense joint posterior — mean and
    CROSS-TIME covariance (includes a missing row)."""
    rng = np.random.default_rng(2)
    T, nv = 6, 0.1
    t = _t(T, seed=2)
    y = np.sin(1.3 * t) + 0.3 * rng.normal(size=T)
    y[2] = np.nan
    k = Matern32(lengthscale=0.8, variance=1.2)
    ssm = build_lgssm(k, jnp.asarray(t))
    R = jnp.broadcast_to(jnp.eye(1) * nv, (T, 1, 1))
    S = 6000
    xs = jax.jit(
        lambda key: matheron_state_samples(
            key, ssm, R, jnp.asarray(y)[:, None], S, parallel=True
        )
    )(jax.random.PRNGKey(2))
    f = np.asarray(xs @ ssm.H.T)[:, :, 0]
    mean, cov = _dense_posterior(k, t, y, nv)
    np.testing.assert_allclose(f.mean(0), mean, atol=0.04)
    np.testing.assert_allclose(np.cov(f.T), cov, atol=0.08)


@pytest.mark.parametrize("parallel,sqrt", [(False, False), (True, True)])
def test_model_sample_f_new_times(parallel, sqrt):
    """StateSpaceGP.sample_f at NEW times: sample moments == predict_f."""
    rng = np.random.default_rng(3)
    T = 8
    t = _t(T, seed=3)
    y = np.cos(t) + 0.2 * rng.normal(size=T)
    m = StateSpaceGP(
        t=jnp.asarray(t), Y=jnp.asarray(y)[:, None],
        kernel=Matern52(lengthscale=1.1, variance=1.0),
        likelihood=Gaussian(positive_param(0.05)),
        parallel=parallel, sqrt=sqrt,
    )
    ts = np.linspace(0.2, 3.8, 5)
    S = 4000
    fs = jax.jit(
        lambda key: m.sample_f(key, S, t_new=jnp.asarray(ts))
    )(jax.random.PRNGKey(3))
    assert fs.shape == (S, 5, 1)
    pf = m.predict_f(jnp.asarray(ts))
    np.testing.assert_allclose(np.asarray(fs).mean(0)[:, 0],
                               np.asarray(pf.mean)[:, 0], atol=0.05)
    np.testing.assert_allclose(np.asarray(fs).var(0)[:, 0],
                               np.asarray(pf.var)[:, 0], atol=0.06)


def test_cvi_sample_matches_exact_posterior():
    """Conjugate CVIGP: q == exact posterior, so sample moments match the
    exact StateSpaceGP posterior."""
    from physs_gp_tpu.models import CVIGP

    rng = np.random.default_rng(4)
    T = 7
    t = _t(T, seed=4)
    y = np.sin(t) + 0.2 * rng.normal(size=T)
    kern = Matern32(lengthscale=1.0, variance=1.0)
    lik = Gaussian(positive_param(0.04))
    m = CVIGP.init(jnp.asarray(t), jnp.asarray(y)[:, None], kern, lik)
    m, _ = jax.jit(lambda mm: mm.step_with_elbo(1.0))(m)
    S = 4000
    fs = jax.jit(lambda key: m.sample_f(key, S))(jax.random.PRNGKey(4))
    exact = StateSpaceGP(
        t=jnp.asarray(t), Y=jnp.asarray(y)[:, None], kernel=kern,
        likelihood=lik,
    ).posterior()
    np.testing.assert_allclose(np.asarray(fs).mean(0)[:, 0],
                               np.asarray(exact.mean)[:, 0], atol=0.05)
    np.testing.assert_allclose(np.asarray(fs).var(0)[:, 0],
                               np.asarray(exact.var)[:, 0], atol=0.05)


def test_mesh_samples_match_single_device():
    """Time-sharded (8-chip mesh) Matheron samples == single-device samples
    with the same key (the sharded smoother is exact)."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("t",))
    rng = np.random.default_rng(6)
    T = 64
    t = np.sort(rng.uniform(0, 10, T))
    y = np.sin(t) + 0.2 * rng.normal(size=T)
    y[5] = np.nan
    base = dict(
        t=jnp.asarray(t), Y=jnp.asarray(y)[:, None],
        kernel=Matern32(lengthscale=1.0, variance=1.0),
        likelihood=Gaussian(positive_param(0.05)),
    )
    key = jax.random.PRNGKey(7)
    m1 = StateSpaceGP(**base, parallel=True)
    m2 = StateSpaceGP(**base, mesh=mesh)
    f1 = jax.jit(lambda: m1.sample_f(key, 3))()
    f2 = jax.jit(lambda: m2.sample_f(key, 3))()
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-8)


def test_chunked_prior_scan_matches():
    """chunk_size (outer scan of inner prefixes) == the full associative
    scan, bit-for-bit, including a non-divisible T (padding)."""
    k = Matern52(lengthscale=0.7, variance=1.3)
    ssm = build_lgssm(k, jnp.asarray(_t(103, seed=9)))
    key = jax.random.PRNGKey(9)
    full = jax.jit(lambda: sample_lgssm_states(key, ssm, 2))()
    chunked = jax.jit(
        lambda: sample_lgssm_states(key, ssm, 2, chunk_size=16)
    )()
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-10)


def test_zero_q_factor_has_no_jitter_floor():
    """Exactly-zero Q (periodic rotations) must factor to ~0 — an absolute
    jitter floor would inject a random walk that accumulates over T
    (orthogonal A never decays it)."""
    from physs_gp_tpu.ops.matrix import safe_cholesky_rel

    for dt in (jnp.float32, jnp.float64):
        L = safe_cholesky_rel(jnp.zeros((4, 3, 3), dt))
        assert float(jnp.max(jnp.abs(L))) < 1e-12


def test_correction_model_sample_variance():
    """Off-site (DTC-corrected) models: sampled dispersion matches
    posterior() — the conditional residual is drawn, not dropped."""
    from physs_gp_tpu.zoo import deriv_st_gp

    rng = np.random.default_rng(10)
    T, Ns = 6, 5
    t = np.sort(rng.uniform(0, 2, T))
    Z = np.linspace(-1, 1, Ns)[:, None]
    Zs = np.linspace(-0.8, 0.8, 3)[:, None]
    Y = rng.normal(size=(T, 3 * Ns))
    m = deriv_st_gp(t, Y, Z, time_diff=1, space_diff=1, Zs=Zs, noise=0.1,
                    parallel=True)
    post = m.posterior()
    fs = jax.jit(lambda key: m.sample_f(key, 4000))(jax.random.PRNGKey(10))
    sd_ref = np.sqrt(np.asarray(post.var))
    np.testing.assert_allclose(np.asarray(fs).mean(0), np.asarray(post.mean),
                               atol=4 * sd_ref.max() / np.sqrt(4000))
    np.testing.assert_allclose(np.asarray(fs).var(0), np.asarray(post.var),
                               rtol=0.15)


def test_sample_confidence_intervals():
    """Sample-based CIs converge to the Gaussian closed form on a conjugate
    model; a nonlinear link shifts them the right way (exp median < mean)."""
    from physs_gp_tpu.metrics import confidence_interval, sample_confidence_intervals

    rng = np.random.default_rng(8)
    T = 8
    t = _t(T, seed=8)
    y = np.sin(t) + 0.2 * rng.normal(size=T)
    m = StateSpaceGP(
        t=jnp.asarray(t), Y=jnp.asarray(y)[:, None],
        kernel=Matern32(lengthscale=1.0, variance=1.0),
        likelihood=Gaussian(positive_param(0.05)),
    )
    med, lo, hi = sample_confidence_intervals(
        m, jax.random.PRNGKey(8), n_samples=6000
    )
    post = m.posterior()
    glo, ghi = confidence_interval(post.mean, post.var)
    np.testing.assert_allclose(np.asarray(med), np.asarray(post.mean),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(glo), atol=0.08)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(ghi), atol=0.08)
    med_e, _, _ = sample_confidence_intervals(
        m, jax.random.PRNGKey(8), n_samples=6000, link=jnp.exp
    )
    # exp is convex: the pushed-forward MEDIAN is exp(median) < E[exp(f)]
    np.testing.assert_allclose(np.asarray(med_e), np.exp(np.asarray(med)),
                               rtol=1e-6)


def test_batch_and_svgp_samples():
    """BatchGP / SVGP joint samples reproduce their own predictive moments
    (and the two models agree on the conjugate problem)."""
    from physs_gp_tpu.models import SVGP
    from physs_gp_tpu.models.batch_gp import BatchGP

    rng = np.random.default_rng(5)
    N = 9
    X = _t(N, seed=5)[:, None]
    y = np.sin(X[:, 0]) + 0.2 * rng.normal(size=N)
    kern = Matern52(lengthscale=0.9, variance=1.0)
    lik = Gaussian(positive_param(0.05))
    bm = BatchGP(X=jnp.asarray(X), Y=jnp.asarray(y)[:, None], kernel=kern,
                 likelihood=lik)
    Xs = np.linspace(0.2, 3.8, 6)[:, None]
    S = 5000
    fb = jax.jit(lambda key: bm.sample_f(key, jnp.asarray(Xs), S))(
        jax.random.PRNGKey(5)
    )
    pf = bm.predict_f(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(fb).mean(0), np.asarray(pf.mean),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(fb).var(0), np.asarray(pf.var),
                               atol=0.05)
    # SVGP at Z = X after one lr=1 natgrad step == exact posterior
    sm = SVGP.init(jnp.asarray(X), jnp.asarray(y)[:, None], jnp.asarray(X),
                   kern, lik, whiten=False)
    sm = jax.jit(lambda mm: mm.natural_gradient_update(1.0))(sm)
    fs = jax.jit(lambda key: sm.sample_f(key, jnp.asarray(Xs), S))(
        jax.random.PRNGKey(6)
    )
    np.testing.assert_allclose(np.asarray(fs).mean(0), np.asarray(pf.mean),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(fs).var(0), np.asarray(pf.var),
                               atol=0.05)

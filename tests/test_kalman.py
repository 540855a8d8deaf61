"""Filter/smoother equivalence gates (SURVEY.md §4):
- KF lml == dense GP lml (1e-8, N<=512)
- smoothed posterior == dense GP posterior
- parallel == sequential
- gradients through both filters agree
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern12, Matern32, Matern52, Matern72
from physs_gp_tpu.ops import kalman, parallel_kalman
from physs_gp_tpu.ops.lgssm import build_lgssm
from physs_gp_tpu.models import StateSpaceGP
from physs_gp_tpu.likelihoods import Gaussian
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.utils.struct import replace


def make_data(T=64, seed=0, noise=0.1):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 5, size=T))
    y = np.sin(2 * t) + noise * rng.normal(size=T)
    return jnp.asarray(t), jnp.asarray(y)[:, None]


def dense_gp_lml(kernel, t, y, noise_var):
    K = kernel.K(t[:, None], t[:, None]) + noise_var * jnp.eye(t.shape[0])
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), y[:, 0])
    return (
        -0.5 * y[:, 0] @ alpha
        - jnp.sum(jnp.log(jnp.diag(L)))
        - 0.5 * t.shape[0] * jnp.log(2 * jnp.pi)
    )


def dense_gp_posterior(kernel, t, y, noise_var, t_star):
    K = kernel.K(t[:, None], t[:, None]) + noise_var * jnp.eye(t.shape[0])
    Ks = kernel.K(t_star[:, None], t[:, None])
    Kss = kernel.K_diag(t_star[:, None])
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), y[:, 0])
    mean = Ks @ alpha
    v = jax.scipy.linalg.solve_triangular(L, Ks.T, lower=True)
    var = Kss - jnp.sum(v * v, 0)
    return mean, var


@pytest.mark.parametrize("make", [Matern12, Matern32, Matern52, Matern72])
@pytest.mark.parametrize("parallel", [False, True])
def test_kf_lml_matches_dense_gp(make, parallel):
    t, y = make_data(T=64)
    kern = make(lengthscale=0.7, variance=1.3)
    noise = 0.05
    m = StateSpaceGP(
        t=t, Y=y, kernel=kern, likelihood=Gaussian(positive_param(noise)),
        parallel=parallel,
    )
    lml_ss = m.log_marginal_likelihood()
    lml_dense = dense_gp_lml(kern, t, y, noise)
    np.testing.assert_allclose(lml_ss, lml_dense, rtol=1e-8)


@pytest.mark.parametrize("parallel", [False, True])
def test_posterior_matches_dense_gp(parallel):
    t, y = make_data(T=48)
    kern = Matern32(lengthscale=0.5, variance=1.0)
    noise = 0.1
    m = StateSpaceGP(
        t=t, Y=y, kernel=kern, likelihood=Gaussian(positive_param(noise)),
        parallel=parallel,
    )
    post = m.posterior()
    mean_d, var_d = dense_gp_posterior(kern, t, y, noise, t)
    np.testing.assert_allclose(post.mean[:, 0], mean_d, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(post.var[:, 0], var_d, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("parallel", [False, True])
def test_predict_matches_dense_gp(parallel):
    t, y = make_data(T=40)
    kern = Matern52(lengthscale=0.8, variance=0.9)
    noise = 0.05
    m = StateSpaceGP(
        t=t, Y=y, kernel=kern, likelihood=Gaussian(positive_param(noise)),
        parallel=parallel,
    )
    t_star = jnp.linspace(-0.5, 5.5, 23)
    pred = m.predict_f(t_star)
    mean_d, var_d = dense_gp_posterior(kern, t, y, noise, t_star)
    np.testing.assert_allclose(pred.mean[:, 0], mean_d, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(pred.var[:, 0], var_d, rtol=1e-6, atol=1e-8)


def test_missing_data_equals_dropped_data():
    t, y = make_data(T=32)
    kern = Matern32(lengthscale=0.6)
    noise = 0.1
    y_missing = y.at[jnp.array([3, 10, 20])].set(jnp.nan)
    keep = np.setdiff1d(np.arange(32), [3, 10, 20])
    m_nan = StateSpaceGP(
        t=t, Y=y_missing, kernel=kern, likelihood=Gaussian(positive_param(noise))
    )
    lml_nan = m_nan.log_marginal_likelihood()
    lml_drop = dense_gp_lml(kern, t[keep], y[keep], noise)
    np.testing.assert_allclose(lml_nan, lml_drop, rtol=1e-8)
    # posterior at all t matches dense prediction from kept subset
    post = m_nan.posterior()
    mean_d, var_d = dense_gp_posterior(kern, t[keep], y[keep], noise, t)
    np.testing.assert_allclose(post.mean[:, 0], mean_d, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(post.var[:, 0], var_d, rtol=1e-6, atol=1e-8)


def test_parallel_equals_sequential_large():
    t, y = make_data(T=300, seed=5)
    y = y.at[jnp.array([5, 50, 200])].set(jnp.nan)
    kern = Matern52(lengthscale=0.4, variance=2.0)
    lik = Gaussian(positive_param(0.07))
    m_seq = StateSpaceGP(t=t, Y=y, kernel=kern, likelihood=lik, parallel=False)
    m_par = StateSpaceGP(t=t, Y=y, kernel=kern, likelihood=lik, parallel=True)
    np.testing.assert_allclose(
        m_seq.log_marginal_likelihood(), m_par.log_marginal_likelihood(), rtol=1e-9
    )
    ps, pp = m_seq.posterior(), m_par.posterior()
    np.testing.assert_allclose(ps.mean, pp.mean, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ps.var, pp.var, rtol=1e-7, atol=1e-9)


def test_chunked_parallel_equals_unchunked():
    t, y = make_data(T=128, seed=7)
    kern = Matern32(lengthscale=0.5)
    lik = Gaussian(positive_param(0.1))
    m_full = StateSpaceGP(t=t, Y=y, kernel=kern, likelihood=lik, parallel=True)
    m_chunk = StateSpaceGP(
        t=t, Y=y, kernel=kern, likelihood=lik, parallel=True, chunk_size=32
    )
    np.testing.assert_allclose(
        m_full.log_marginal_likelihood(),
        m_chunk.log_marginal_likelihood(),
        rtol=1e-9,
    )
    pf, pc = m_full.posterior(), m_chunk.posterior()
    np.testing.assert_allclose(pf.mean, pc.mean, rtol=1e-8)
    np.testing.assert_allclose(pf.var, pc.var, rtol=1e-8)


def test_blocked_schedule_matches_sequential(monkeypatch):
    """Chunked covariance-form scans under the TPU-default blocked schedule
    (reduced distribute combine + carry folded into the block totals) == the
    sequential filter, exercised on CPU via PHYSS_INNER_SCAN (mirrors the
    sqrt-path gate in test_sqrt_kalman.py)."""
    t, y = make_data(T=96, seed=3)
    kern = Matern32(lengthscale=0.5)
    lik = Gaussian(positive_param(0.1))
    m_seq = StateSpaceGP(t=t, Y=y, kernel=kern, likelihood=lik, parallel=False)
    lml_seq = m_seq.log_marginal_likelihood()
    p_seq = m_seq.posterior()

    monkeypatch.setenv("PHYSS_INNER_SCAN", "blocked")
    monkeypatch.setenv("PHYSS_SCAN_BLOCKS", "8")  # force multi-block totals
    m_blk = StateSpaceGP(
        t=t, Y=y, kernel=kern, likelihood=lik, parallel=True, chunk_size=32
    )
    np.testing.assert_allclose(
        m_blk.log_marginal_likelihood(), lml_seq, rtol=1e-9
    )
    p_blk = m_blk.posterior()
    np.testing.assert_allclose(p_blk.mean, p_seq.mean, rtol=1e-7, atol=1e-11)
    np.testing.assert_allclose(p_blk.var, p_seq.var, rtol=1e-6, atol=1e-11)


@pytest.mark.parametrize("parallel", [False, True])
@pytest.mark.slow
def test_gradients_match_dense(parallel):
    t, y = make_data(T=32)
    noise = 0.1

    def lml_ss(log_ls):
        kern = Matern32(lengthscale=jnp.exp(log_ls))
        m = StateSpaceGP(
            t=t, Y=y, kernel=kern, likelihood=Gaussian(positive_param(noise)),
            parallel=parallel,
        )
        return m.log_marginal_likelihood()

    def lml_dense_fn(log_ls):
        kern = Matern32(lengthscale=jnp.exp(log_ls))
        return dense_gp_lml(kern, t, y, noise)

    g_ss = jax.grad(lml_ss)(jnp.asarray(0.2))
    g_dense = jax.grad(lml_dense_fn)(jnp.asarray(0.2))
    np.testing.assert_allclose(g_ss, g_dense, rtol=1e-6)


def test_jit_and_grad_through_model_pytree():
    t, y = make_data(T=32)
    m = StateSpaceGP(
        t=t,
        Y=y,
        kernel=Matern32(lengthscale=0.7),
        likelihood=Gaussian(positive_param(0.1)),
    )
    obj = jax.jit(lambda mm: mm.get_objective())
    val = obj(m)
    grads = jax.grad(lambda mm: mm.get_objective())(m)
    # gradient wrt kernel lengthscale raw param exists and is finite
    g = grads.kernel.lengthscales.raw
    assert np.isfinite(g)
    assert np.isfinite(val)


def test_blocked_inner_scan_matches_assoc(monkeypatch):
    """blocked_inclusive_scan (the TPU-default chunk schedule; every combine
    at batch >= 256 on the Pallas path) == associative_scan == sequential,
    exercised on CPU via the PHYSS_INNER_SCAN knob (read at trace time)."""
    rng = np.random.default_rng(11)
    T = 96
    t = np.sort(rng.uniform(0, 10, T))
    y = np.sin(2 * t) + 0.1 * rng.normal(size=T)
    y[7] = np.nan
    y = jnp.asarray(y)[:, None]
    kern = Matern52(lengthscale=0.7, variance=1.2)
    ssm = build_lgssm(kern, jnp.asarray(t))
    R = jnp.broadcast_to(0.05 * jnp.eye(1), (T, 1, 1))
    f_ref = kalman.kalman_filter(ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0)
    s_ref = kalman.rts_smoother(ssm.A, ssm.Q, f_ref)

    monkeypatch.setenv("PHYSS_INNER_SCAN", "blocked")
    f = parallel_kalman.parallel_kalman_filter(
        ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0, chunk_size=16
    )
    s = parallel_kalman.parallel_rts_smoother(
        ssm.A, ssm.Q, f, chunk_size=16
    )
    np.testing.assert_allclose(f.lml, f_ref.lml, rtol=1e-9)
    np.testing.assert_allclose(f.ms, f_ref.ms, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(s.ms, s_ref.ms, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(s.Ps, s_ref.Ps, rtol=1e-5, atol=1e-9)

    # gradient path through the blocked schedule stays correct
    def lml_fn(log_ls):
        k = Matern52(lengthscale=jnp.exp(log_ls), variance=1.2)
        sm = build_lgssm(k, jnp.asarray(t))
        ff = parallel_kalman.parallel_kalman_filter(
            sm.A, sm.Q, sm.H, R, y, sm.m0, sm.P0, chunk_size=16
        )
        return ff.lml

    g_blocked = jax.grad(lml_fn)(jnp.asarray(np.log(0.7)))
    monkeypatch.setenv("PHYSS_INNER_SCAN", "assoc")
    g_assoc = jax.grad(lml_fn)(jnp.asarray(np.log(0.7)))
    np.testing.assert_allclose(g_blocked, g_assoc, rtol=1e-8)

"""Multi-chip sharding gates (SURVEY.md §2.11): time-axis sharded parallel
filter/smoother == single-device results, on an 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from physs_gp_tpu.kernels import Matern52
from physs_gp_tpu.likelihoods import Gaussian
from physs_gp_tpu.models import StateSpaceGP
from physs_gp_tpu.ops import kalman, parallel_kalman
from physs_gp_tpu.ops.lgssm import build_lgssm
from physs_gp_tpu.parallel.sharded import sharded_filter_smoother
from physs_gp_tpu.utils.params import positive_param


def _mesh(n=8, axis="t"):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


@pytest.mark.parametrize("n_dev,chunk", [(2, None), (8, None), (8, 8), (4, 16)])
def test_sharded_equals_single_device(n_dev, chunk):
    rng = np.random.default_rng(0)
    T = 256
    t = np.sort(rng.uniform(0, 10, T))
    y = np.sin(2 * t) + 0.1 * rng.normal(size=T)
    y[5] = np.nan
    y = jnp.asarray(y)[:, None]
    t = jnp.asarray(t)
    kern = Matern52(lengthscale=0.7, variance=1.2)
    noise = 0.05
    ssm = build_lgssm(kern, t)
    R = jnp.broadcast_to(noise * jnp.eye(1), (T, 1, 1))

    f_ref = kalman.kalman_filter(ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0)
    s_ref = kalman.rts_smoother(ssm.A, ssm.Q, f_ref)

    mesh = _mesh(n_dev)
    f_sh, s_sh = jax.jit(
        lambda *a: sharded_filter_smoother(
            *a, mesh=mesh, axis="t", chunk_size=chunk
        )
    )(ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0)

    np.testing.assert_allclose(f_sh.lml, f_ref.lml, rtol=1e-9)
    np.testing.assert_allclose(f_sh.ms, f_ref.ms, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(f_sh.Ps, f_ref.Ps, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(s_sh.ms, s_ref.ms, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(s_sh.Ps, s_ref.Ps, rtol=1e-5, atol=1e-9)


def test_sharded_gradients_match():
    """Gradient of the sharded lml wrt hyperparameters == unsharded."""
    rng = np.random.default_rng(1)
    T = 128
    t = jnp.asarray(np.sort(rng.uniform(0, 5, T)))
    y = jnp.asarray(np.sin(2 * np.asarray(t)) + 0.1 * rng.normal(size=T))[:, None]
    mesh = _mesh(8)
    noise = 0.05

    def lml_sharded(log_ls):
        kern = Matern52(lengthscale=jnp.exp(log_ls))
        ssm = build_lgssm(kern, t)
        R = jnp.broadcast_to(noise * jnp.eye(1), (T, 1, 1))
        f, _ = sharded_filter_smoother(
            ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0, mesh=mesh, axis="t"
        )
        return f.lml

    def lml_single(log_ls):
        kern = Matern52(lengthscale=jnp.exp(log_ls))
        m = StateSpaceGP(t=t, Y=y, kernel=kern,
                         likelihood=Gaussian(positive_param(noise)))
        return m.log_marginal_likelihood()

    # note: grad-of-shard_map must run under jit (eager transpose hits an
    # XLA sharding-override conflict on broadcasted cotangents)
    g_sh = jax.jit(jax.grad(lml_sharded))(jnp.asarray(0.1))
    g_ref = jax.grad(lml_single)(jnp.asarray(0.1))
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-6)


@pytest.mark.parametrize("n_dev,chunk", [(8, None), (4, 8)])
def test_sharded_sqrt_equals_single_device(n_dev, chunk):
    """Square-root sharded variant == sequential covariance filter/smoother."""
    from physs_gp_tpu.ops.matrix import safe_cholesky_rel
    from physs_gp_tpu.parallel.sharded import sharded_sqrt_filter_smoother

    rng = np.random.default_rng(2)
    T = 128
    t = np.sort(rng.uniform(0, 10, T))
    y = np.sin(2 * t) + 0.1 * rng.normal(size=T)
    y[7] = np.nan
    y = jnp.asarray(y)[:, None]
    kern = Matern52(lengthscale=0.7, variance=1.2)
    ssm = build_lgssm(kern, jnp.asarray(t))
    R = jnp.broadcast_to(0.05 * jnp.eye(1), (T, 1, 1))

    f_ref = kalman.kalman_filter(ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0)
    s_ref = kalman.rts_smoother(ssm.A, ssm.Q, f_ref)

    mesh = _mesh(n_dev)
    f_sh, s_sh = jax.jit(
        lambda *a: sharded_sqrt_filter_smoother(
            *a, mesh=mesh, axis="t", chunk_size=chunk
        )
    )(
        ssm.A, safe_cholesky_rel(ssm.Q), ssm.H, safe_cholesky_rel(R), y,
        ssm.m0, safe_cholesky_rel(ssm.P0),
    )
    np.testing.assert_allclose(f_sh.lml, f_ref.lml, rtol=1e-8)
    np.testing.assert_allclose(f_sh.ms, f_ref.ms, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(f_sh.Ps, f_ref.Ps, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(s_sh.ms, s_ref.ms, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(s_sh.Ps, s_ref.Ps, rtol=1e-4, atol=1e-8)


def test_cvi_step_with_mesh_matches_local():
    """A CVIGP natural-gradient step through the mesh-routed surrogate pass
    == the same step computed locally (the 'sharded CVI step' gate)."""
    from physs_gp_tpu.kernels import Matern32
    from physs_gp_tpu.likelihoods import Poisson
    from physs_gp_tpu.models import CVIGP

    rng = np.random.default_rng(3)
    T = 100  # deliberately NOT divisible by 8: exercises runner padding
    t = np.sort(rng.uniform(0, 12, T))
    y = rng.poisson(np.exp(np.sin(t))).astype(np.float64)[:, None]
    kern = Matern32(lengthscale=1.0, variance=1.0)

    m_local = CVIGP.init(jnp.asarray(t), jnp.asarray(y), kern, Poisson(),
                         parallel=True)
    m_mesh = CVIGP.init(jnp.asarray(t), jnp.asarray(y), kern, Poisson(),
                        mesh=_mesh(8))

    step = lambda m: m.step_with_elbo(0.5)
    m1_l, e_l = jax.jit(step)(m_local)
    m1_m, e_m = jax.jit(step)(m_mesh)
    np.testing.assert_allclose(float(e_m), float(e_l), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(m1_m.sites.V), np.asarray(m1_l.sites.V), rtol=1e-6,
        atol=1e-10,
    )

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


@pytest.mark.slow
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


@pytest.mark.parametrize("chunk", [None, 8])
def test_sharded_time_varying_H(chunk):
    """Time-varying H [T, p, d] (scattered-sensor shape) shards over time and
    matches the single-device sequential filter/smoother."""
    rng = np.random.default_rng(4)
    T, p = 128, 2
    t = np.sort(rng.uniform(0, 10, T))
    kern = Matern52(lengthscale=0.7, variance=1.2)
    ssm = build_lgssm(kern, jnp.asarray(t))
    d = ssm.m0.shape[-1]
    H_tv = jnp.asarray(rng.normal(size=(T, p, d)) * 0.5)
    y = jnp.einsum("tpd,d->tp", H_tv, jnp.ones(d)) + 0.1 * rng.normal(
        size=(T, p)
    )
    y = y.at[3, 0].set(jnp.nan)
    R = jnp.broadcast_to(0.05 * jnp.eye(p), (T, p, p))

    f_ref = kalman.kalman_filter(ssm.A, ssm.Q, H_tv, R, y, ssm.m0, ssm.P0)
    s_ref = kalman.rts_smoother(ssm.A, ssm.Q, f_ref)

    mesh = _mesh(8)
    f_sh, s_sh = jax.jit(
        lambda *a: sharded_filter_smoother(
            *a, mesh=mesh, axis="t", chunk_size=chunk
        )
    )(ssm.A, ssm.Q, H_tv, R, y, ssm.m0, ssm.P0)
    np.testing.assert_allclose(f_sh.lml, f_ref.lml, rtol=1e-9)
    np.testing.assert_allclose(f_sh.ms, f_ref.ms, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(s_sh.ms, s_ref.ms, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(s_sh.Ps, s_ref.Ps, rtol=1e-4, atol=1e-8)


def test_scattered_model_time_shards():
    """End-to-end scattered-sensor model (config-4 shape, ScatteredSpatialHead
    H [T, Ng, D]) runs mesh-sharded and matches the local lml."""
    from physs_gp_tpu.zoo import scattered_st_gp
    from physs_gp_tpu.utils.struct import replace

    rng = np.random.default_rng(5)
    n_rows = 220
    t_rows = np.sort(rng.uniform(0, 5, n_rows))
    s_rows = rng.uniform(-1, 1, (n_rows, 1))
    y_rows = np.sin(2 * t_rows) * np.exp(-s_rows[:, 0] ** 2)
    X = np.column_stack([t_rows, s_rows])
    model, data = scattered_st_gp(X, y_rows, n_inducing=6)

    lml_local = float(jax.jit(lambda m: m.log_marginal_likelihood())(model))
    m_mesh = replace(model, mesh=_mesh(8), mesh_axis="t")
    lml_mesh = float(jax.jit(lambda m: m.log_marginal_likelihood())(m_mesh))
    np.testing.assert_allclose(lml_mesh, lml_local, rtol=1e-7)


def test_pad_amount_non_divisible_chunk_edge():
    """T=1001 over 8 shards with chunk=125: the padded per-shard segment is
    126 (> chunk), so padding must go to the full shard*chunk grid instead of
    tripping the chunked-scan divisibility assert (ADVICE round-2 #2)."""
    from physs_gp_tpu.ops.runner import _pad_amount

    pad = _pad_amount(1001, 125, n_shards=8)
    T_padded = 1001 + pad
    assert T_padded % 8 == 0
    seg = T_padded // 8
    assert seg <= 125 or seg % 125 == 0

    # and the no-op case still avoids over-padding
    pad2 = _pad_amount(1000, 125, n_shards=8)
    assert (1000 + pad2) // 8 <= 125 or ((1000 + pad2) // 8) % 125 == 0
    assert pad2 == 0


@pytest.mark.parametrize("sqrt", [False, True])
def test_composite_dp_t_mesh_matches_sequential(sqrt):
    """Composite dp×t mode: B independent series batched over a 'dp' mesh
    axis, each series' scan time-sharded over 't' — per-series lml and
    smoothed moments must match the sequential oracle."""
    from physs_gp_tpu.kernels import Matern32
    from physs_gp_tpu.ops.kalman import kalman_filter, rts_smoother
    from physs_gp_tpu.ops.matrix import safe_cholesky
    from physs_gp_tpu.parallel.sharded import sharded_sqrt_filter_smoother

    B, T = 2, 32
    rng = np.random.default_rng(9)
    t = np.sort(rng.uniform(0, 10, (B, T)), axis=1)
    y = rng.normal(size=(B, T, 1))
    y[0, 5, 0] = np.nan
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "t"))

    ssms = []
    for b in range(B):
        ssm = build_lgssm(Matern32(lengthscale=1.0), jnp.asarray(t[b]))
        R = jnp.broadcast_to(0.1 * jnp.eye(1), (T, 1, 1))
        ssms.append((ssm, R))
    lml_ref, sms_ref = [], []
    for b, (ssm, R) in enumerate(ssms):
        f = kalman_filter(ssm.A, ssm.Q, ssm.H, R, jnp.asarray(y[b]),
                          ssm.m0, ssm.P0)
        s = rts_smoother(ssm.A, ssm.Q, f)
        lml_ref.append(float(f.lml))
        sms_ref.append(np.asarray(s.ms))

    H = ssms[0][0].H  # shared static observation matrix: stays [p, d]
    Ab = jnp.stack([s.A for s, _ in ssms])
    m0b = jnp.stack([s.m0 for s, _ in ssms])
    if sqrt:
        Qb = jnp.stack([safe_cholesky(s.Q) for s, _ in ssms])
        Rb = jnp.stack([safe_cholesky(r) for _, r in ssms])
        P0b = jnp.stack([safe_cholesky(s.P0) for s, _ in ssms])
        fn = sharded_sqrt_filter_smoother
    else:
        Qb = jnp.stack([s.Q for s, _ in ssms])
        Rb = jnp.stack([r for _, r in ssms])
        P0b = jnp.stack([s.P0 for s, _ in ssms])
        fn = sharded_filter_smoother

    f2, s2 = jax.jit(lambda: fn(
        Ab, Qb, H, Rb, jnp.asarray(y), m0b, P0b,
        mesh=mesh, axis="t", batch_axis="dp",
    ))()
    np.testing.assert_allclose(np.asarray(f2.lml), lml_ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s2.ms), np.stack(sms_ref),
                               rtol=1e-6, atol=1e-9)

    # hyperparameter gradient flows through the composite mesh
    def loss(Qin):
        f, s = fn(Ab, Qin, H, Rb, jnp.asarray(y), m0b, P0b,
                  mesh=mesh, axis="t", batch_axis="dp")
        return jnp.sum(f.lml)

    g = jax.jit(jax.grad(loss))(Qb)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

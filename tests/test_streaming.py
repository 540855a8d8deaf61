"""Streaming / online assimilation (`models/streaming.py`).

Exactness contract: filtering segment-by-segment through the carried
(m, P, t_last) state reproduces the full-batch filter — lml, final state,
per-step filtered moments — and forecasts from the carried state match
`StateSpaceGP.predict_f` at points after all data (where smoothed ==
filtered == predicted).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from physs_gp_tpu.kernels import Matern32, Matern72
from physs_gp_tpu.likelihoods import Gaussian
from physs_gp_tpu.models import StateSpaceGP, StreamingGP
from physs_gp_tpu.ops.kalman import kalman_filter
from physs_gp_tpu.ops.lgssm import build_lgssm
from physs_gp_tpu.utils import positive_param
from physs_gp_tpu import zoo


def _series(T=60, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0.0, 8.0, T))
    y = np.sin(1.7 * t)[:, None] + 0.05 * rng.normal(size=(T, 1))
    y[rng.choice(T, 5, replace=False), 0] = np.nan  # missing rows
    return jnp.asarray(t), jnp.asarray(y)


def _model(t, y, **kw):
    return StateSpaceGP(
        t=t, Y=y, kernel=Matern32(lengthscale=0.9),
        likelihood=Gaussian(positive_param(0.05 ** 2)), **kw,
    )


@pytest.mark.parametrize("splits", [(20, 45), (1, 59), (30,)])
def test_segmented_equals_batch_filter(splits):
    t, y = _series()
    m = _model(t, y)
    s, state = StreamingGP(kernel=m.kernel, likelihood=m.likelihood), None
    state = s.init_state(t0=float(t[0]))

    segs, lo = [], 0
    for hi in list(splits) + [t.shape[0]]:
        state, seg = jax.jit(s.update)(state, t[lo:hi], y[lo:hi])
        segs.append(seg)
        lo = hi

    # lml: sum of segment increments == batch lml
    batch_lml = jax.jit(lambda mm: mm.log_marginal_likelihood())(m)
    np.testing.assert_allclose(float(state.lml), float(batch_lml), rtol=1e-10)

    # final carried state == batch filter's last row
    ssm = build_lgssm(m.kernel, t)
    R = m.likelihood.R(t.shape[0], 1)
    f = kalman_filter(ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0)
    np.testing.assert_allclose(np.asarray(state.m), np.asarray(f.ms[-1]),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.P), np.asarray(f.Ps[-1]),
                               atol=1e-12)

    # per-step filtered head moments == batch filter (concatenated segments)
    f_mean = jnp.concatenate([g.f_mean for g in segs])
    Hm = jnp.einsum("pd,td->tp", ssm.H, f.ms)
    np.testing.assert_allclose(np.asarray(f_mean), np.asarray(Hm), atol=1e-10)


@pytest.mark.parametrize("kw", [
    dict(parallel=True),
    dict(sqrt=True),
    dict(parallel=True, sqrt=True, chunk_size=16),
])
def test_filter_variants_match_sequential(kw):
    t, y = _series(T=48, seed=1)
    s = StreamingGP(kernel=Matern32(lengthscale=0.9),
                    likelihood=Gaussian(positive_param(0.05 ** 2)), **kw)
    s0 = StreamingGP(kernel=s.kernel, likelihood=s.likelihood)

    def run(sgp):
        st = sgp.init_state(t0=float(t[0]))
        st, _ = jax.jit(sgp.update)(st, t[:25], y[:25])
        st, _ = jax.jit(sgp.update)(st, t[25:], y[25:])
        return st

    a, b = run(s), run(s0)
    np.testing.assert_allclose(float(a.lml), float(b.lml), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(a.m), np.asarray(b.m), atol=1e-8)
    np.testing.assert_allclose(np.asarray(a.P), np.asarray(b.P), atol=1e-8)


def test_forecast_matches_predict_f():
    t, y = _series(T=50, seed=2)
    m = _model(t, y)
    s, state = StreamingGP.from_model(m)

    t_fut = jnp.linspace(float(t[-1]) + 0.1, float(t[-1]) + 2.0, 7)
    fc = jax.jit(s.forecast)(state, t_fut)
    ref = jax.jit(m.predict_f)(t_fut)
    np.testing.assert_allclose(np.asarray(fc.mean), np.asarray(ref.mean),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fc.var), np.asarray(ref.var),
                               atol=1e-9)

    # observation-space forecast adds the noise variance
    py = jax.jit(s.predict_y)(state, t_fut)
    np.testing.assert_allclose(
        np.asarray(py.var), np.asarray(fc.var) + 0.05 ** 2, atol=1e-9
    )


def test_streaming_physics_heads():
    """ODE-constrained model streams exactly (physics rows stay active)."""
    rng = np.random.default_rng(3)
    t_data = np.sort(rng.uniform(0, 6, 40))
    w = 2.0
    y_data = np.cos(w * t_data) + 0.03 * rng.normal(size=40)
    t_coll = np.linspace(0, 6, 30)
    m = zoo.ode_gp(t_data, y_data, t_coll, ode_coeffs=[w ** 2, 0.0, 1.0],
                   kernel=Matern72(lengthscale=1.2))

    s = StreamingGP(kernel=m.kernel, likelihood=m.likelihood,
                    observation=m.observation)
    state = s.init_state(t0=float(m.t[0]))
    T = m.t.shape[0]
    state, _ = jax.jit(s.update)(state, m.t[: T // 2], m.Y[: T // 2])
    state, _ = jax.jit(s.update)(state, m.t[T // 2:], m.Y[T // 2:])
    batch_lml = jax.jit(lambda mm: mm.log_marginal_likelihood())(m)
    np.testing.assert_allclose(float(state.lml), float(batch_lml), rtol=1e-9)

    # forecast stays close to the ODE solution just past the data window
    fc = jax.jit(s.forecast)(state, jnp.asarray([6.1, 6.3]))
    truth = np.cos(w * np.array([6.1, 6.3]))
    assert np.all(np.abs(np.asarray(fc.mean[:, 0]) - truth) < 0.15)


def test_fixed_size_serving_loop_compiles_once():
    """NaN-padded fixed-width batches reuse one compiled update."""
    t, y = _series(T=64, seed=4)
    s = StreamingGP(kernel=Matern32(lengthscale=0.9),
                    likelihood=Gaussian(positive_param(0.05 ** 2)))
    state = s.init_state(t0=float(t[0]))
    upd = jax.jit(s.update)

    B = 16
    for k in range(4):
        tb, yb = t[k * B:(k + 1) * B], y[k * B:(k + 1) * B]
        state, _ = upd(state, tb, yb)
    m = _model(t, y)
    np.testing.assert_allclose(
        float(state.lml),
        float(jax.jit(lambda mm: mm.log_marginal_likelihood())(m)),
        rtol=1e-10,
    )
    # padding contract: a trailing all-NaN row only advances the clock
    t_pad = jnp.concatenate([t[-2:] + 1.0, t[-1:] + 3.0])
    y_pad = jnp.concatenate([y[-2:] * jnp.nan, y[-1:] * jnp.nan])
    st2, seg = upd(state, t_pad, y_pad)
    np.testing.assert_allclose(float(st2.lml), float(state.lml), rtol=1e-12)


# ---------------------------------------------------------------------------
# StreamingCVI (online conjugate-computation VI)
# ---------------------------------------------------------------------------
from physs_gp_tpu.likelihoods import Poisson
from physs_gp_tpu.models import CVIGP, StreamingCVI


def test_streaming_cvi_gaussian_segments_exact():
    """Conjugate Gaussian + lr=1: sites hit their fixed point in one step,
    so segment ELBOs sum to the exact batch lml and the carried state
    equals the batch filter state."""
    t, y = _series(T=40, seed=5)
    s = StreamingCVI(kernel=Matern32(lengthscale=0.9),
                     likelihood=Gaussian(positive_param(0.05 ** 2)),
                     lr=1.0, n_iters=2)
    st = s.init_state(t0=float(t[0]))
    st, _ = jax.jit(s.update)(st, t[:18], y[:18])
    st, _ = jax.jit(s.update)(st, t[18:], y[18:])

    m = _model(t, y)
    batch_lml = float(jax.jit(lambda mm: mm.log_marginal_likelihood())(m))
    np.testing.assert_allclose(float(st.lml), batch_lml, rtol=1e-8)

    ssm = build_lgssm(m.kernel, t)
    f = kalman_filter(ssm.A, ssm.Q, ssm.H, m.likelihood.R(t.shape[0], 1), y,
                      ssm.m0, ssm.P0)
    np.testing.assert_allclose(np.asarray(st.m), np.asarray(f.ms[-1]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.P), np.asarray(f.Ps[-1]),
                               atol=1e-9)


def test_streaming_cvi_single_segment_equals_batch():
    """One segment covering all data reproduces batch CVIGP exactly
    (same iteration count / lr / frozen seed)."""
    rng = np.random.default_rng(6)
    T = 60
    t = jnp.asarray(np.sort(rng.uniform(0, 10, T)))
    lam = np.exp(1.2 * np.sin(1.1 * np.asarray(t)))
    y = jnp.asarray(rng.poisson(lam)[:, None].astype(np.float64))

    kern = Matern32(lengthscale=1.0)
    s = StreamingCVI(kernel=kern, likelihood=Poisson(), lr=0.5, n_iters=5)
    st = s.init_state(t0=float(t[0]))
    st, seg = jax.jit(s.update)(st, t, y)

    batch = CVIGP.init(t, y, kern, Poisson())
    elbo = None
    for _ in range(5):
        batch, elbo = jax.jit(lambda mm: mm.step_with_elbo(0.5))(batch)
    np.testing.assert_allclose(float(st.lml), float(elbo), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(seg.posterior().mean[1:]),
        np.asarray(batch.posterior().mean), atol=1e-8,
    )


def test_streaming_cvi_poisson_two_segments():
    """Online two-segment fit tracks the batch CVI posterior and forecasts
    a sane intensity past the data."""
    rng = np.random.default_rng(7)
    T = 80
    t = jnp.asarray(np.sort(rng.uniform(0, 12, T)))
    f_true = 1.2 * np.sin(0.9 * np.asarray(t)) + 0.3
    y = jnp.asarray(rng.poisson(np.exp(f_true))[:, None].astype(np.float64))

    kern = Matern32(lengthscale=1.4)
    s = StreamingCVI(kernel=kern, likelihood=Poisson(), lr=0.5, n_iters=15)
    st = s.init_state(t0=float(t[0]))
    st, seg1 = jax.jit(s.update)(st, t[:40], y[:40])
    st, seg2 = jax.jit(s.update)(st, t[40:], y[40:])
    assert np.isfinite(float(st.lml))

    batch = CVIGP.init(t, y, kern, Poisson())
    for _ in range(15):
        batch, _ = jax.jit(lambda mm: mm.step_with_elbo(0.5))(batch)
    m_online = np.concatenate([np.asarray(seg1.posterior().mean[1:]),
                               np.asarray(seg2.posterior().mean[1:])])
    m_batch = np.asarray(batch.posterior().mean)
    rmse = float(np.sqrt(np.mean((m_online - m_batch) ** 2)))
    assert rmse < 0.35, rmse

    fc = jax.jit(s.forecast)(st, t[-1] + jnp.asarray([0.1, 0.5, 1.0]))
    assert np.isfinite(np.asarray(fc.mean)).all()
    assert (np.asarray(fc.var) > 0).all()


# ---------------------------------------------------------------------------
# Round-4 gates: serving-path guards + online-approximation drift bound
# ---------------------------------------------------------------------------


def test_strict_times_poisons_out_of_order_segment():
    """Out-of-order / stale rows NaN-poison the carry instead of silently
    applying negative-dt transitions (production serving guard)."""
    t, y = _series(T=30, seed=8)
    s = StreamingGP(kernel=Matern32(lengthscale=0.9),
                    likelihood=Gaussian(positive_param(0.05 ** 2)))
    st = s.init_state(t0=float(t[0]))
    st, _ = jax.jit(s.update)(st, t[:20], y[:20])
    ok_lml = float(st.lml)
    assert np.isfinite(ok_lml)

    # second segment starts BEFORE t_last -> poisoned state + lml
    bad_t = t[10:20] - 0.5
    st_bad, seg_bad = jax.jit(s.update)(st, bad_t, y[10:20])
    assert not np.isfinite(float(st_bad.lml))
    assert not np.isfinite(np.asarray(st_bad.m)).all()
    assert not np.isfinite(float(seg_bad.lml))

    # opt-out restores the old permissive behavior
    s_loose = StreamingGP(kernel=s.kernel, likelihood=s.likelihood,
                          strict_times=False)
    st_loose, _ = jax.jit(s_loose.update)(st, bad_t, y[10:20])
    assert np.asarray(st_loose.t_last) == np.asarray(bad_t[-1])


def test_streaming_rejects_length_tied_likelihood_R():
    """A likelihood whose R ignores the requested T (per-step covariances
    stored over the training grid) must fail loudly, not misalign rows."""
    from physs_gp_tpu.likelihoods.gaussian import BlockDiagonalGaussian

    t, y = _series(T=20, seed=9)
    V = jnp.broadcast_to(0.01 * jnp.eye(1), (12, 1, 1))  # length-tied: 12
    s = StreamingGP(kernel=Matern32(lengthscale=0.9),
                    likelihood=BlockDiagonalGaussian(V=V))
    st = s.init_state(t0=float(t[0]))
    with pytest.raises(ValueError, match="parametric in T"):
        s.update(st, t[:8], y[:8])


def test_streaming_cvi_segment_likelihood_residual_mask():
    """The dummy carry row is excluded from nonlinear-residual enforcement
    (prevents double-counted boundary residuals in the accumulated ELBO)."""
    from physs_gp_tpu.likelihoods import Gaussian as G
    from physs_gp_tpu.likelihoods.composite import (
        CompositeLikelihood, NonlinearResidual,
    )

    res = NonlinearResidual(fn=lambda f: f[..., 0] ** 2,
                            noise_var=positive_param(0.1))
    lik = CompositeLikelihood(heads=[G(positive_param(0.05))], residual=res)
    s = StreamingCVI(kernel=Matern32(lengthscale=1.0), likelihood=lik)
    seg_lik = s._segment_likelihood(5)
    rm = np.asarray(seg_lik.residual_mask)
    assert rm.shape == (6,) and rm[0] == 0.0 and np.all(rm[1:] == 1.0)

    # user-supplied per-segment mask is preserved behind the dummy 0
    lik2 = CompositeLikelihood(
        heads=[G(positive_param(0.05))], residual=res,
        residual_mask=jnp.asarray([1.0, 0.0, 1.0]),
    )
    s2 = StreamingCVI(kernel=Matern32(lengthscale=1.0), likelihood=lik2)
    rm2 = np.asarray(s2._segment_likelihood(3).residual_mask)
    np.testing.assert_array_equal(rm2, [0.0, 1.0, 0.0, 1.0])

    with pytest.raises(ValueError, match="must cover one segment"):
        s2._segment_likelihood(7)


@pytest.mark.slow
def test_streaming_cvi_drift_bound_vs_segment_count():
    """Quantified online-approximation drift (VERDICT r3 #8): for
    non-conjugate likelihoods, streaming CVI never revisits past sites, so
    the posterior drifts from batch CVI as segments shrink. Gate: the
    posterior-mean RMSE vs the batch fit stays below a stated bound for up
    to 8 segments, and is monotone-ish (more segments -> no catastrophic
    blowup). Documented bound: drift < 0.25 latent units at 8 segments on
    a unit-scale Poisson series (see README serving notes)."""
    from math import erf as _erf

    from physs_gp_tpu.likelihoods import Probit

    rng = np.random.default_rng(11)
    T = 80
    t = jnp.asarray(np.sort(rng.uniform(0, 12, T)))
    f_true = 1.2 * np.sin(0.9 * np.asarray(t)) + 0.3

    cases = {
        "poisson": (Poisson(),
                    jnp.asarray(rng.poisson(np.exp(f_true))[:, None]
                                .astype(np.float64))),
        "probit": (Probit(),
                   jnp.asarray((rng.uniform(size=T) <
                                0.5 * (1 + np.vectorize(_erf)(
                                    f_true / np.sqrt(2))))
                               .astype(np.float64)[:, None])),
    }
    n_iters = 12
    for name, (lik, y) in cases.items():
        batch = CVIGP.init(t, y, Matern32(lengthscale=1.4), lik)
        for _ in range(n_iters):
            batch, _ = jax.jit(lambda mm: mm.step_with_elbo(0.5))(batch)
        m_batch = np.asarray(batch.posterior().mean)

        drifts = {}
        for n_seg in (1, 2, 4, 8):
            s = StreamingCVI(kernel=Matern32(lengthscale=1.4),
                             likelihood=lik, lr=0.5, n_iters=n_iters)
            st = s.init_state(t0=float(t[0]))
            B = T // n_seg
            means = []
            upd = jax.jit(s.update)
            for k in range(n_seg):
                st, seg = upd(st, t[k * B:(k + 1) * B], y[k * B:(k + 1) * B])
                means.append(np.asarray(seg.posterior().mean[1:]))
            assert np.isfinite(float(st.lml)), (name, n_seg)
            m_onl = np.concatenate(means)
            drifts[n_seg] = float(
                np.sqrt(np.mean((m_onl - m_batch) ** 2))
            )
        # single segment == batch (same schedule): tight agreement
        assert drifts[1] < 1e-6, (name, drifts)
        # documented drift bound for the online approximation
        assert drifts[8] < 0.25, (name, drifts)
        assert max(drifts.values()) < 0.25, (name, drifts)

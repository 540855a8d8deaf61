"""EKF gates:
- EKF on a LINEAR SDE == exact Kalman filter;
- EKF tracks the pendulum state from partial noisy observations;
- iterated parallel EKS converges to the sequential EKS trajectory;
- parameter learning (damping) through the EKF lml.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern32
from physs_gp_tpu.likelihoods import Gaussian
from physs_gp_tpu.models import StateSpaceGP
from physs_gp_tpu.models.ekf_gp import NonlinearSSGP
from physs_gp_tpu.ops.ekf import NonlinearSSM, ekf_filter, euler_maruyama_sample
from physs_gp_tpu.utils.params import positive_param


def test_ekf_linear_sde_matches_kalman():
    """OU process: EKF with linear drift must equal the exact KF lml."""
    rng = np.random.default_rng(0)
    T = 60
    t = np.sort(rng.uniform(0, 5, T))
    y = np.sin(2 * t) + 0.1 * rng.normal(size=T)
    ls, var, noise = 0.7, 1.3, 0.05
    lam = 1.0 / ls
    # Matern12 == OU: drift = -lam x, Qc = 2 var lam
    ssm = NonlinearSSM(
        drift=lambda x: -lam * x,
        L=jnp.eye(1),
        Qc=jnp.asarray([[2 * var * lam]]),
        m0=jnp.zeros(1),
        P0=jnp.asarray([[var]]),
        obs_fn=lambda x: x,
    )
    R = jnp.broadcast_to(noise * jnp.eye(1), (T, 1, 1))
    # EKF Euler-discretises the dynamics; use many substeps to converge
    f = ekf_filter(ssm, jnp.asarray(t), R, jnp.asarray(y)[:, None],
                   n_substeps=64)
    from physs_gp_tpu.kernels import Matern12

    m_exact = StateSpaceGP(
        t=jnp.asarray(t), Y=jnp.asarray(y)[:, None],
        kernel=Matern12(lengthscale=ls, variance=var),
        likelihood=Gaussian(positive_param(noise)),
    )
    lml_exact = float(m_exact.log_marginal_likelihood())
    # Euler transition e^{-lam dt} ~ (1 - lam dt/n)^n: few-percent tolerance
    np.testing.assert_allclose(float(f.lml), lml_exact, rtol=2e-3)


def _pendulum_drift(params, x):
    c, w2 = params
    return jnp.stack([x[1], -c * x[1] - w2 * jnp.sin(x[0])])


def _make_pendulum_data(c=0.25, w2=9.0, T=300, t_max=6.0, noise_sd=0.05,
                        seed=1):
    from scipy.integrate import solve_ivp

    rng = np.random.default_rng(seed)
    sol = solve_ivp(
        lambda s, x: [x[1], -c * x[1] - w2 * np.sin(x[0])],
        (0, t_max), [1.4, 0.0], dense_output=True, rtol=1e-9,
    )
    t = np.linspace(1e-3, t_max, T)
    f = sol.sol(t)[0]
    y = f + noise_sd * rng.normal(size=T)
    return t, y, sol


def _pendulum_model(t, y, c, w2, noise_sd, **kw):
    T = len(t)
    return NonlinearSSGP(
        t=jnp.asarray(t),
        Y=jnp.asarray(y)[:, None],
        params=(jnp.asarray(c), jnp.asarray(w2)),
        L=jnp.asarray([[0.0], [1.0]]),
        Qc=jnp.asarray([[0.1]]),
        m0=jnp.asarray([1.4, 0.0]),
        P0=0.1 * jnp.eye(2),
        R=jnp.broadcast_to(noise_sd**2 * jnp.eye(1), (T, 1, 1)),
        drift=_pendulum_drift,
        obs_fn=lambda p, x: x[:1],
        n_substeps=4,
        **kw,
    )


def test_ekf_pendulum_tracks_state():
    c, w2 = 0.25, 9.0
    t, y, sol = _make_pendulum_data(c, w2)
    m = _pendulum_model(t, y, c, w2, 0.05)
    ms, Ps = jax.jit(lambda mm: mm.posterior_states())(m)
    f_true = sol.sol(t)[0]
    v_true = sol.sol(t)[1]
    rmse_f = float(np.sqrt(np.mean((np.asarray(ms[:, 0]) - f_true) ** 2)))
    rmse_v = float(np.sqrt(np.mean((np.asarray(ms[:, 1]) - v_true) ** 2)))
    assert rmse_f < 0.05, rmse_f
    # velocity is never observed — must be recovered through the dynamics
    assert rmse_v < 0.3, rmse_v


def test_iterated_parallel_eks_matches_sequential():
    c, w2 = 0.25, 9.0
    t, y, _ = _make_pendulum_data(c, w2, T=256)
    m_seq = _pendulum_model(t, y, c, w2, 0.05)
    m_par = _pendulum_model(t, y, c, w2, 0.05, method="iterated_parallel",
                            n_iters=8)
    ms_seq, _ = jax.jit(lambda mm: mm.posterior_states())(m_seq)
    ms_par, _ = jax.jit(lambda mm: mm.posterior_states())(m_par)
    # iterated linearisation converges to a (slightly different) fixed point;
    # trajectories must agree closely
    np.testing.assert_allclose(ms_par[:, 0], ms_seq[:, 0], atol=2e-2)


def test_ekf_learns_damping():
    c_true, w2 = 0.3, 9.0
    t, y, _ = _make_pendulum_data(c_true, w2, T=400, noise_sd=0.02)

    def nll(c):
        m = _pendulum_model(t, y, c, w2, 0.02)
        return m.get_objective()

    import optax

    copt = jnp.asarray(1.0)  # bad init
    opt = optax.adam(0.05)
    state = opt.init(copt)
    step = jax.jit(lambda cc, ss: (lambda g: (optax.apply_updates(
        cc, opt.update(g, ss)[0]), opt.update(g, ss)[1]))(jax.grad(nll)(cc)))
    for _ in range(60):
        copt, state = step(copt, state)
    assert abs(float(copt) - c_true) < 0.05, float(copt)


def test_euler_maruyama_sample_statistics():
    """OU simulation: stationary variance of samples ~ var."""
    lam, var = 1.0, 0.8
    # long horizon: a single trajectory needs many correlation times for the
    # empirical variance to concentrate (rel sd ~ sqrt(2 tau / T_total))
    t = jnp.linspace(0, 400, 20000)
    x = euler_maruyama_sample(
        lambda x: -lam * x, jnp.eye(1), jnp.asarray([[2 * var * lam]]),
        jnp.zeros(1), t, jax.random.PRNGKey(0), n_substeps=2,
    )
    tail = np.asarray(x[1000:, 0])
    assert abs(tail.var() - var) < 0.15 * var, tail.var()

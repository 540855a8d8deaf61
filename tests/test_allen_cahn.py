"""Allen-Cahn nonlinear-ST-physics gate (VERDICT round-1 item 1, second half).

u_t = ε Δu + u − u³: data on the early window only, the PDE enforced through
the whole window (linear part as exact STOperatorHead rows, u − u³ via the MC
residual ELL with active sites on every head — full-state-observed surrogate).
Asserts the same discrimination structure as the pendulum gate: physics-on
extrapolation ≪ physics-off, AND the posteriors actually differ.

Reference: `experiments/ac/models/m_pigp.py:133-195`, `transforms/pdes.py:223`.
Config validated standalone: on=0.174 vs off=0.548 (seed 0, 150 iters).
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from physs_gp_tpu.kernels import Matern52
from physs_gp_tpu.kernels.rbf import RBF
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.utils.struct import replace
from physs_gp_tpu.zoo import allen_cahn_gp


pytestmark = pytest.mark.slow  # multi-minute gate tier

EPS, T_END, CUT = 0.08, 3.5, 1.0


def _simulate(nx=101, nt=4001):
    xs = np.linspace(-1, 1, nx)
    dx = xs[1] - xs[0]
    dt = T_END / (nt - 1)
    u = 0.5 * np.sin(0.5 * np.pi * xs)
    U = [u.copy()]
    for _ in range(nt - 1):
        uxx = np.zeros_like(u)
        uxx[1:-1] = (u[2:] - 2 * u[1:-1] + u[:-2]) / dx ** 2
        uxx[0], uxx[-1] = uxx[1], uxx[-2]
        u = u + dt * (EPS * uxx + u - u ** 3)
        U.append(u.copy())
    return xs, np.array(U)


def test_allen_cahn_physics_extrapolates():
    rng = np.random.default_rng(0)
    xs, U = _simulate()
    T, Ns, Nc = 36, 8, 8
    t = np.linspace(0, T_END, T)
    Z = np.linspace(-0.9, 0.9, Ns)[:, None]
    coll = np.linspace(-0.9, 0.9, Nc)[:, None]
    nt = U.shape[0]
    it = np.clip((t / T_END * (nt - 1)).astype(int), 0, nt - 1)
    F = np.array([np.interp(Z[:, 0], xs, U[k]) for k in it])
    Y = F + 0.02 * rng.normal(size=F.shape)
    Y[t > CUT, :] = np.nan

    def build():
        return allen_cahn_gp(
            t, Y, Z, coll, epsilon=EPS,
            k_time=Matern52(lengthscale=0.8, variance=1.0),
            k_space=RBF(lengthscales=positive_param(jnp.array([0.6])),
                        variance=positive_param(1.0)),
            noise=0.02 ** 2, coll_noise=1e-5, n_mc=16,
        )

    def train(m, iters=150):
        step = jax.jit(lambda mm: mm.step_with_elbo(0.5, hessian="gauss_newton"))
        for _ in range(iters):
            m, e = step(m)
        return m, float(e)

    m_on, elbo_on = train(build())
    assert np.isfinite(elbo_on)

    m_off = build()
    m_off = replace(m_off, likelihood=replace(
        m_off.likelihood,
        residual=replace(m_off.likelihood.residual,
                         fn=lambda f: jnp.zeros(f.shape[:-1] + (Nc,), f.dtype)),
    ))
    m_off, _ = train(m_off)

    later = t > CUT + 0.1
    p_on, p_off = m_on.posterior(), m_off.posterior()
    rmse_on = float(np.sqrt(np.mean(
        (np.asarray(p_on.mean)[later][:, :Ns] - F[later]) ** 2)))
    rmse_off = float(np.sqrt(np.mean(
        (np.asarray(p_off.mean)[later][:, :Ns] - F[later]) ** 2)))
    # validated margins: 0.174 vs 0.548 at this seed/config
    assert rmse_on < 0.30, rmse_on
    assert rmse_on < 0.6 * rmse_off, (rmse_on, rmse_off)
    diff = float(np.max(np.abs(
        np.asarray(p_on.mean)[:, :Ns] - np.asarray(p_off.mean)[:, :Ns])))
    assert diff > 0.3, diff
    # early-window fit stays tight with physics on
    early = t <= CUT
    rmse_early = float(np.sqrt(np.mean(
        (np.asarray(p_on.mean)[early][:, :Ns] - F[early]) ** 2)))
    assert rmse_early < 0.05, rmse_early

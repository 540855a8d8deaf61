"""Nonlinear dynamics zoo gates (Lotka-Volterra, Lorenz, latent force)."""
import jax
import jax.numpy as jnp
import numpy as np

from physs_gp_tpu.zoo import latent_force_gp, lorenz_gp, lotka_volterra_gp


def test_lotka_volterra_tracks_states():
    from scipy.integrate import solve_ivp

    a, b, d_, g = 1.0, 0.1, 0.075, 1.5
    sol = solve_ivp(
        lambda s, x: [a*x[0] - b*x[0]*x[1], d_*x[0]*x[1] - g*x[1]],
        (0, 20), [10.0, 5.0], dense_output=True, rtol=1e-9,
    )
    rng = np.random.default_rng(0)
    t = np.linspace(0.01, 20, 500)
    truth = sol.sol(t)
    y = truth.T + 0.2 * rng.normal(size=(500, 2))
    m = lotka_volterra_gp(t, y, alpha=a, beta=b, delta=d_, gamma=g,
                          q=0.01, noise=0.2)
    ms, _ = jax.jit(lambda mm: mm.posterior_states())(m)
    rmse = np.sqrt(np.mean((np.asarray(ms) - truth.T) ** 2))
    assert rmse < 0.2, rmse


def test_lorenz_recovers_hidden_states():
    from scipy.integrate import solve_ivp

    s_, r_, b_ = 10.0, 28.0, 8.0 / 3.0
    sol = solve_ivp(
        lambda s, x: [s_*(x[1]-x[0]), x[0]*(r_-x[2])-x[1], x[0]*x[1]-b_*x[2]],
        (0, 4), [1.0, 1.0, 1.0], dense_output=True, rtol=1e-10,
    )
    rng = np.random.default_rng(1)
    t = np.linspace(0.002, 4, 2000)
    truth = sol.sol(t)
    y = truth[0] + 0.5 * rng.normal(size=2000)  # observe x only
    m = lorenz_gp(t, y, q=0.5, noise=0.5)
    ms, _ = jax.jit(lambda mm: mm.posterior_states())(m)
    # hidden y/z components recovered through the dynamics
    corr_y = np.corrcoef(np.asarray(ms[:, 1]), truth[1])[0, 1]
    corr_z = np.corrcoef(np.asarray(ms[:, 2]), truth[2])[0, 1]
    assert corr_y > 0.95 and corr_z > 0.95, (corr_y, corr_z)


def test_latent_force_recovers_forcing():
    rng = np.random.default_rng(2)
    t = np.linspace(0.01, 10, 400)
    u_true = np.sin(1.5 * t)  # smooth forcing
    # simulate x' = -x + u with fine Euler
    x = np.zeros_like(t)
    for i in range(1, len(t)):
        dt = t[i] - t[i-1]
        x[i] = x[i-1] + dt * (-x[i-1] + u_true[i-1])
    y = x + 0.02 * rng.normal(size=len(t))
    m = latent_force_gp(t, y, force_lengthscale=2.0, force_variance=1.0,
                        damping=1.0, noise=0.02)
    ms, _ = jax.jit(lambda mm: mm.posterior_states())(m)
    u_rec = np.asarray(ms[:, 1])
    corr = np.corrcoef(u_rec[50:], u_true[50:])[0, 1]
    assert corr > 0.95, corr


def test_multiobjective_and_latent_predictor():
    from physs_gp_tpu.kernels import Matern52
    from physs_gp_tpu.likelihoods import Gaussian
    from physs_gp_tpu.models import (LatentPredictor, MultiObjectiveModel,
                                     StateSpaceGP)
    from physs_gp_tpu.transforms import (DerivativeHead, StateObservation,
                                         ValueHead)
    from physs_gp_tpu.likelihoods.gaussian import IndependentGaussian
    from physs_gp_tpu.utils.params import positive_param

    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0, 4, 40))
    y = np.sin(2 * t) + 0.05 * rng.normal(size=40)
    Y = jnp.stack([jnp.asarray(y), jnp.full(40, jnp.nan)], axis=1)
    m = StateSpaceGP(
        t=jnp.asarray(t), Y=Y, kernel=Matern52(lengthscale=0.7),
        likelihood=IndependentGaussian(
            variances=[positive_param(0.0025), positive_param(1.0, ).fix()]),
        observation=StateObservation(heads=[ValueHead(), DerivativeHead(order=1)]),
    )
    mo = MultiObjectiveModel(models=[m, m])
    np.testing.assert_allclose(
        float(mo.get_objective()), 2 * float(m.get_objective()), rtol=1e-10
    )
    lp = LatentPredictor(base=m, head=1)
    dpred = lp.predict_f(jnp.asarray(t))
    # derivative head should match the analytic derivative 2cos(2t)
    corr = np.corrcoef(np.asarray(dpred.mean[:, 0]), 2*np.cos(2*t))[0, 1]
    assert corr > 0.98, corr

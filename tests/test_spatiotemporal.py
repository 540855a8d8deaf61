"""Spatio-temporal gates (SURVEY.md §7 M6 / BASELINE configs 4-5):
- Kron-lifted ST filter == dense separable GP (lml + posterior, exact);
- off-grid spatial prediction == dense GP conditional;
- heat-equation physics rows: residual ~ 0, physics beats plain ST GP;
- parallel == sequential on the lifted state.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern32, Matern52, RBF, SpatioTemporalKernel
from physs_gp_tpu.models import SpatioTemporalGP
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.zoo import advection_diffusion_gp, st_gp


def _dense_st_inputs(t, Z):
    """All (t_i, z_j) pairs as [T*Ns, 1+ds], time-major site-minor."""
    T, Ns = t.shape[0], Z.shape[0]
    tt = np.repeat(np.asarray(t), Ns)[:, None]
    ss = np.tile(np.asarray(Z), (T, 1))
    return np.concatenate([tt, ss], axis=1)


def _dense_lml_and_posterior(kern_t, kern_s, t, Z, Y, noise, X_pred=None):
    X = _dense_st_inputs(t, Z)
    yf = np.asarray(Y).reshape(-1)
    ok = np.isfinite(yf)
    Kt = np.asarray(kern_t.K(X[:, :1], X[:, :1]))
    Ks = np.asarray(kern_s.K(X[:, 1:], X[:, 1:]))
    K = (Kt * Ks)[np.ix_(ok, ok)] + noise * np.eye(ok.sum())
    yo = yf[ok]
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, yo))
    lml = (
        -0.5 * yo @ alpha
        - np.log(np.diag(L)).sum()
        - 0.5 * ok.sum() * np.log(2 * np.pi)
    )
    out = {"lml": lml}
    if X_pred is not None:
        Kxt = np.asarray(kern_t.K(X_pred[:, :1], X[:, :1]))
        Kxs = np.asarray(kern_s.K(X_pred[:, 1:], X[:, 1:]))
        Kx = (Kxt * Kxs)[:, ok]
        kd = np.asarray(kern_t.K_diag(X_pred[:, :1])) * np.asarray(
            kern_s.K_diag(X_pred[:, 1:])
        )
        out["mean"] = Kx @ alpha
        v = np.linalg.solve(L, Kx.T)
        out["var"] = kd - np.sum(v * v, axis=0)
    return out


@pytest.mark.parametrize("parallel", [False, True])
def test_st_filter_matches_dense_gp(parallel):
    rng = np.random.default_rng(0)
    T, Ns = 14, 5
    t = np.sort(rng.uniform(0, 3, T))
    Z = rng.uniform(-1, 1, (Ns, 2))
    kern_t = Matern32(lengthscale=0.8, variance=1.3)
    kern_s = RBF(lengthscales=positive_param(jnp.array([0.7, 0.9])))
    Y = rng.normal(size=(T, Ns))
    Y[rng.uniform(size=Y.shape) < 0.2] = np.nan  # scattered missing
    noise = 0.07
    m = st_gp(t, Y, Z, k_time=kern_t, k_space=kern_s, noise=noise,
              parallel=parallel)
    lml_ss = m.log_marginal_likelihood()
    dense = _dense_lml_and_posterior(kern_t, kern_s, t, Z, Y, noise)
    np.testing.assert_allclose(lml_ss, dense["lml"], rtol=1e-8)


def test_st_offgrid_prediction_matches_dense():
    rng = np.random.default_rng(1)
    T, Ns = 10, 4
    t = np.sort(rng.uniform(0, 2, T))
    Z = rng.uniform(-1, 1, (Ns, 2))
    kern_t = Matern52(lengthscale=0.9, variance=0.8)
    kern_s = RBF(lengthscales=positive_param(jnp.array([0.8, 0.8])))
    Y = rng.normal(size=(T, Ns))
    noise = 0.05
    m = st_gp(t, Y, Z, k_time=kern_t, k_space=kern_s, noise=noise)
    s_new = rng.uniform(-0.8, 0.8, (3, 2))
    pred = m.predict_grid(jnp.asarray(s_new))
    X_pred = np.concatenate(
        [np.repeat(t, 3)[:, None], np.tile(s_new, (T, 1))], axis=1
    )
    dense = _dense_lml_and_posterior(
        kern_t, kern_s, t, Z, Y, noise, X_pred=X_pred
    )
    np.testing.assert_allclose(
        np.asarray(pred.mean).reshape(-1), dense["mean"], rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pred.var).reshape(-1), dense["var"], rtol=2e-3, atol=1e-6
    )


def test_st_prediction_at_new_times_matches_dense():
    rng = np.random.default_rng(2)
    T, Ns = 8, 3
    t = np.sort(rng.uniform(0, 2, T))
    Z = rng.uniform(-1, 1, (Ns, 1))
    kern_t = Matern32(lengthscale=0.7)
    kern_s = RBF(lengthscales=positive_param(jnp.array([0.6])))
    Y = rng.normal(size=(T, Ns))
    noise = 0.1
    m = st_gp(t, Y, Z, k_time=kern_t, k_space=kern_s, noise=noise)
    t_new = np.linspace(0.1, 2.4, 5)
    s_new = np.array([[0.3], [-0.5]])
    pred = m.predict_grid(jnp.asarray(s_new), t_new=jnp.asarray(t_new))
    X_pred = np.concatenate(
        [np.repeat(t_new, 2)[:, None], np.tile(s_new, (5, 1))], axis=1
    )
    dense = _dense_lml_and_posterior(
        kern_t, kern_s, t, Z, Y, noise, X_pred=X_pred
    )
    np.testing.assert_allclose(
        np.asarray(pred.mean).reshape(-1), dense["mean"], rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pred.var).reshape(-1), dense["var"], rtol=2e-3, atol=1e-6
    )


def _heat_solution(t, s, a=0.25, k=np.pi):
    """f(t, s) = exp(-a k^2 t) sin(k s) solves f_t = a f_ss on s in [0, 2]."""
    return np.exp(-a * k**2 * t) * np.sin(k * s)


@pytest.mark.parametrize("parallel", [False, True])
def test_heat_equation_physics(parallel):
    rng = np.random.default_rng(3)
    a_true = 0.25
    T = 30
    t = np.linspace(0, 0.6, T)
    Z = np.linspace(0, 2, 13)[:, None]
    F = _heat_solution(t[:, None], Z[None, :, 0], a=a_true)
    # observe only the first third of the time span, few sites, noisy
    Y = F + 0.02 * rng.normal(size=F.shape)
    Y[t > 0.2, :] = np.nan  # later times unobserved -> physics must carry
    coll = np.linspace(0.05, 1.95, 11)[:, None]
    m = advection_diffusion_gp(
        t, Y, Z, coll, diffusivity=a_true,
        k_time=Matern52(lengthscale=0.4, variance=1.0),
        k_space=RBF(lengthscales=positive_param(jnp.array([0.5])),
                    variance=positive_param(1.0)),
        noise=0.02**2, coll_noise=1e-6, parallel=parallel,
    )
    m_plain = st_gp(
        t, Y, Z,
        k_time=Matern52(lengthscale=0.4, variance=1.0),
        k_space=RBF(lengthscales=positive_param(jnp.array([0.5])),
                    variance=positive_param(1.0)),
        noise=0.02**2, parallel=parallel,
    )
    # predict on the unobserved later times at the grid sites
    pred = m.predict_grid(jnp.asarray(Z))
    pred_plain = m_plain.predict_grid(jnp.asarray(Z))
    later = t > 0.25
    rmse = float(np.sqrt(np.mean(
        (np.asarray(pred.mean)[later] - F[later]) ** 2)))
    rmse_plain = float(np.sqrt(np.mean(
        (np.asarray(pred_plain.mean)[later] - F[later]) ** 2)))
    assert rmse < 0.05, rmse
    assert rmse < 0.5 * rmse_plain, (rmse, rmse_plain)


def test_advection_term_and_trainable_diffusivity():
    """1D advection-diffusion with velocity + jit/grad through the model."""
    rng = np.random.default_rng(4)
    T, Ns = 12, 6
    t = np.linspace(0, 1, T)
    Z = np.linspace(0, 2, Ns)[:, None]
    Y = rng.normal(size=(T, Ns))
    a = positive_param(0.3)
    m = advection_diffusion_gp(
        t, Y, Z, np.array([[0.7], [1.3]]), diffusivity=a, velocity=[0.5],
        noise=0.1,
    )
    val, grads = jax.value_and_grad(
        lambda mm: mm.get_objective()
    )(m)
    assert np.isfinite(float(val))
    g_a = jax.tree_util.tree_leaves(
        grads.core.observation.heads[1].terms[1].coeff
    )
    assert np.isfinite(np.asarray(g_a)).all() and np.abs(np.asarray(g_a)).sum() > 0

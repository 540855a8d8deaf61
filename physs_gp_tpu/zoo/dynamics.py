"""Zoo: nonlinear dynamical-system GPs via EKF / iterated parallel EKS.

Counterpart of the reference's nonlinear PDE/SDE transforms + latent force
models (`transforms/pdes.py` LorenzSystem/LotkaVolterra, ref :223-1127;
`transforms/latent_force.py:11-302`): the system state follows known (or
parameterised) nonlinear dynamics, optionally driven by a GP latent force,
observed partially and noisily.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..kernels.matern import Matern32
from ..models.ekf_gp import NonlinearSSGP
from ..utils.params import Param, positive_param

__all__ = [
    "lotka_volterra_gp",
    "lorenz_gp",
    "latent_force_gp",
    "dynamic_covariance_gp",
]


def _param(v, fixed=False):
    if isinstance(v, Param):
        return v
    p = positive_param(v)
    return p.fix() if fixed else p


def lotka_volterra_gp(
    t, y_obs, alpha=1.0, beta=0.1, delta=0.075, gamma=1.5,
    q=0.05, noise=0.1, x0=(10.0, 5.0), dtype=jnp.float64,
    observed="both", n_substeps=4, **kw,
) -> NonlinearSSGP:
    """Lotka-Volterra predator-prey dynamics with process noise.

    y_obs: [T, 2] (NaN = missing) if observed='both', else [T, 1] prey only.
    Rate parameters may be jnp scalars (trainable through the lml).
    """
    t = jnp.asarray(np.ravel(t), dtype)
    T = t.shape[0]
    p = 2 if observed == "both" else 1

    def drift(params, x):
        a, b, d_, g = params
        prey, pred = x[0], x[1]
        return jnp.stack(
            [a * prey - b * prey * pred, d_ * prey * pred - g * pred]
        )

    def obs(params, x):
        return x[:p]

    return NonlinearSSGP(
        t=t,
        Y=jnp.asarray(y_obs, dtype).reshape(T, p),
        params=(
            jnp.asarray(alpha, dtype), jnp.asarray(beta, dtype),
            jnp.asarray(delta, dtype), jnp.asarray(gamma, dtype),
        ),
        L=jnp.eye(2, dtype=dtype),
        Qc=q * jnp.eye(2, dtype=dtype),
        m0=jnp.asarray(x0, dtype),
        P0=0.5 * jnp.eye(2, dtype=dtype),
        R=jnp.broadcast_to(noise**2 * jnp.eye(p, dtype=dtype), (T, p, p)),
        drift=drift,
        obs_fn=obs,
        n_substeps=n_substeps,
        **kw,
    )


def lorenz_gp(
    t, y_obs, sigma=10.0, rho=28.0, beta=8.0 / 3.0, q=0.5, noise=1.0,
    x0=(1.0, 1.0, 1.0), dtype=jnp.float64, n_substeps=8, **kw,
) -> NonlinearSSGP:
    """Lorenz-63 state estimation from partial observations (x only).

    (ref `transforms/pdes.py` LorenzSystem)"""
    t = jnp.asarray(np.ravel(t), dtype)
    T = t.shape[0]

    def drift(params, x):
        s, r, b = params
        return jnp.stack(
            [s * (x[1] - x[0]), x[0] * (r - x[2]) - x[1], x[0] * x[1] - b * x[2]]
        )

    return NonlinearSSGP(
        t=t,
        Y=jnp.asarray(y_obs, dtype).reshape(T, 1),
        params=(jnp.asarray(sigma, dtype), jnp.asarray(rho, dtype),
                jnp.asarray(beta, dtype)),
        L=jnp.eye(3, dtype=dtype),
        Qc=q * jnp.eye(3, dtype=dtype),
        m0=jnp.asarray(x0, dtype),
        P0=jnp.eye(3, dtype=dtype),
        R=jnp.broadcast_to(noise**2 * jnp.eye(1, dtype=dtype), (T, 1, 1)),
        drift=drift,
        obs_fn=lambda p, x: x[:1],
        n_substeps=n_substeps,
        **kw,
    )


def latent_force_gp(
    t, y_obs, force_lengthscale=1.0, force_variance=1.0, damping=1.0,
    noise=0.1, dtype=jnp.float64, n_substeps=2, **kw,
) -> NonlinearSSGP:
    """First-order latent force model: x' = -damping x + u(t), u ~ Matérn-1/2
    GP (ref `transforms/latent_force.py:11` LinearLFM): the GP force is part
    of the joint state, inferred alongside x."""
    t = jnp.asarray(np.ravel(t), dtype)
    T = t.shape[0]
    lam = 1.0 / force_lengthscale
    qc = 2.0 * force_variance * lam

    def drift(params, x):
        damp, lam_ = params
        return jnp.stack([-damp * x[0] + x[1], -lam_ * x[1]])

    return NonlinearSSGP(
        t=t,
        Y=jnp.asarray(y_obs, dtype).reshape(T, 1),
        params=(jnp.asarray(damping, dtype), jnp.asarray(lam, dtype)),
        L=jnp.asarray([[0.0], [1.0]], dtype),
        Qc=jnp.asarray([[qc]], dtype),
        m0=jnp.zeros(2, dtype),
        P0=jnp.diag(jnp.asarray([1.0, force_variance], dtype)),
        R=jnp.broadcast_to(noise**2 * jnp.eye(1, dtype=dtype), (T, 1, 1)),
        drift=drift,
        obs_fn=lambda p, x: x[:1],
        n_substeps=n_substeps,
        **kw,
    )


def dynamic_covariance_gp(
    t,
    Y,
    k_latent=None,
    variances=None,
    n_mc: int = 32,
    dtype=jnp.float64,
    parallel: bool = False,
    chunk_size=None,
):
    """Dynamic-correlation multivariate volatility model (ref
    `transforms/covariance.py:21` LKJStaticVarianceProcess +
    `likelihood/dynamic_covariance_likelihood.py:12`).

    Y [T, P]: y_t ~ N(0, D C(t) D) with C(t) the correlation matrix driven by
    Q = P(P−1)/2 independent latent state-space GPs through the canonical
    partial-correlation map. Variances (D²) are static trainable Params.
    Returns a CVIGP over the Q latent heads; read the fitted correlation path
    with `model.likelihood.correlation_path(model.posterior().mean)`.
    """
    from ..kernels.markov import StackedMarkov
    from ..likelihoods.dynamic_covariance import DynamicCovarianceGaussian
    from ..models.cvi_gp import CVIGP

    t = jnp.asarray(np.ravel(t), dtype)
    Y = jnp.asarray(Y, dtype)
    T, P = Y.shape
    Q = P * (P - 1) // 2
    kern = StackedMarkov(parts=[
        (k_latent() if callable(k_latent) else Matern32(
            lengthscale=1.0, variance=0.5))
        for _ in range(Q)
    ] if k_latent is None or callable(k_latent) else list(k_latent))
    if variances is None:
        variances = [1.0] * P
    lik = DynamicCovarianceGaussian(
        y=Y,
        variances=[_param(v) for v in variances],
        n_mc=n_mc,
    )
    Y_heads = jnp.full((T, Q), jnp.nan, dtype)
    return CVIGP.init(
        t=t, Y=Y_heads, kernel=kern, likelihood=lik,
        parallel=parallel, chunk_size=chunk_size,
    )

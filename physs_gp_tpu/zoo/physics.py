"""Zoo: one-call constructors for physics-informed temporal models.

Counterpart of the reference's `zoo/sde_diff.py` recipes (`diff_gp` ref :136,
`diff_cvi_sde_vgp` ref :335) for the temporal (1-D) families:

- `ode_gp`: exact conjugate physics-informed GP — data head + linear-ODE
  residual head observed as 0 at collocation times, all through one Kalman
  smoother (BASELINE config 3: damped oscillator).
- `monotonic_cvi_gp`: CVI model with a Probit head on f' enforcing
  monotonicity (ref: monotonic_timeseries experiment).
- `nonlinear_ode_cvi_gp`: CVI model with a nonlinear residual (pendulum
  sin f, Allen-Cahn-style terms) via MC expected log-likelihood.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..data.grids import merge_time_grids
from ..kernels.matern import Matern72
from ..likelihoods.composite import CompositeLikelihood, NonlinearResidual
from ..likelihoods.gaussian import Gaussian, IndependentGaussian
from ..likelihoods.nongaussian import Probit
from ..models.cvi_gp import CVIGP
from ..models.ssgp import StateSpaceGP
from ..transforms.operators import (
    DerivativeHead,
    LinearOperatorHead,
    StateObservation,
    ValueHead,
)
from ..utils.params import NegParam, Param, positive_param
from ..utils.shapes import as_points

__all__ = ["ode_gp", "monotonic_cvi_gp", "nonlinear_ode_cvi_gp", "allen_cahn_gp"]


def _param(v, fixed=False):
    if isinstance(v, Param):
        return v
    p = positive_param(v)
    return p.fix() if fixed else p


def ode_gp(
    t_data,
    y_data,
    t_coll,
    ode_coeffs,
    kernel=None,
    noise: float = 0.1,
    coll_noise: float = 1e-4,
    dtype=jnp.float64,
    parallel: bool = False,
    chunk_size=None,
) -> StateSpaceGP:
    """Physics-informed GP for a linear ODE  sum_k c_k f^(k) = 0.

    ode_coeffs: list of coefficients c_k (floats or trainable Params).
    The residual is pseudo-observed as 0 at `t_coll` with variance
    `coll_noise` (fixed); exact conjugate inference via the Kalman smoother.
    """
    kernel = kernel or Matern72(lengthscale=1.0, variance=1.0)
    t_all, Y = merge_time_grids(
        (t_data, y_data), (t_coll, np.zeros(np.asarray(t_coll).size))
    )
    obs = StateObservation(
        heads=[ValueHead(), LinearOperatorHead(coeffs=list(ode_coeffs))]
    )
    lik = IndependentGaussian(
        variances=[_param(noise), _param(coll_noise, fixed=True)]
    )
    return StateSpaceGP(
        t=jnp.asarray(t_all, dtype),
        Y=jnp.asarray(Y, dtype),
        kernel=kernel,
        likelihood=lik,
        observation=obs,
        parallel=parallel,
        chunk_size=chunk_size,
    )


def monotonic_cvi_gp(
    t_data,
    y_data,
    t_coll,
    kernel=None,
    noise: float = 0.1,
    probit_nu: float = 1e-2,
    dtype=jnp.float64,
    parallel: bool = False,
    chunk_size=None,
    constrained: bool = True,
) -> CVIGP:
    """Monotonic GP: data head + Probit head on f' >= 0 at collocation points
    (ref: `experiments/monotonic_timeseries/models/m_stgp.py:122-160`).

    `constrained=False` keeps the identical model structure (both heads, same
    time grid) but masks every probit pseudo-observation to NaN — the
    like-for-like unconstrained baseline whose derivative head can still be
    read out for violation-rate metrics.
    """
    kernel = kernel or Matern72(lengthscale=1.0, variance=1.0)
    n_coll = np.asarray(t_coll).size
    probit_obs = np.ones(n_coll) if constrained else np.full(n_coll, np.nan)
    t_all, Y = merge_time_grids((t_data, y_data), (t_coll, probit_obs))
    obs = StateObservation(heads=[ValueHead(), DerivativeHead(order=1)])
    lik = CompositeLikelihood(
        heads=[Gaussian(variance=_param(noise)), Probit(nu=probit_nu)]
    )
    return CVIGP.init(
        t=jnp.asarray(t_all, dtype),
        Y=jnp.asarray(Y, dtype),
        kernel=kernel,
        likelihood=lik,
        observation=obs,
        parallel=parallel,
        chunk_size=chunk_size,
    )


def nonlinear_ode_cvi_gp(
    t_data,
    y_data,
    t_coll,
    residual_fn,
    n_heads: int,
    kernel=None,
    noise: float = 0.1,
    coll_noise: float = 1e-3,
    n_mc: int = 32,
    dtype=jnp.float64,
    parallel: bool = False,
    chunk_size=None,
) -> CVIGP:
    """CVI model with a nonlinear ODE residual g(f, f', ..) = 0.

    residual_fn maps head samples [..., n_heads] -> residual [...]; e.g. the
    damped pendulum f'' + c f' + w^2 sin(f) (ref `transforms/pdes.py`
    DampedPendulum1D). Heads are (f, f', ..., f^(n_heads-1)).
    """
    kernel = kernel or Matern72(lengthscale=1.0, variance=1.0)
    t_np = np.asarray(t_data).ravel()
    tc_np = np.asarray(t_coll).ravel()
    # Y columns: data head observed at data times; remaining heads never
    # directly observed (they carry information only through the residual ELL,
    # via active sites at the collocation rows). Collocation times are merged
    # into the grid as NaN rows so `coll_mask` actually selects them.
    series = [(t_np, np.asarray(y_data).ravel())]
    for _ in range(n_heads - 1):
        series.append((tc_np, np.full(tc_np.size, np.nan)))
    t_all, Y = merge_time_grids(*series)
    coll_mask = jnp.asarray(np.isin(t_all, tc_np).astype(np.float64))
    obs = StateObservation(
        heads=[ValueHead()] + [DerivativeHead(order=k) for k in range(1, n_heads)]
    )
    # unobserved derivative heads get placeholder Gaussians — their Y columns
    # are all-NaN so their elementwise ELL contribution is exactly zero; they
    # participate only through the nonlinear residual term.
    lik = CompositeLikelihood(
        heads=[Gaussian(variance=_param(noise))]
        + [Gaussian(variance=_param(1.0, fixed=True)) for _ in range(n_heads - 1)],
        residual=NonlinearResidual(
            noise_var=_param(coll_noise, fixed=True), fn=residual_fn, n_mc=n_mc
        ),
        residual_mask=coll_mask,
    )
    return CVIGP.init(
        t=jnp.asarray(t_all, dtype),
        Y=jnp.asarray(Y, dtype),
        kernel=kernel,
        likelihood=lik,
        observation=obs,
        parallel=parallel,
        chunk_size=chunk_size,
    )


def allen_cahn_gp(
    t,
    Y_grid,
    Z,
    coll_points,
    epsilon: float = 1e-2,
    k_time=None,
    k_space=None,
    noise: float = 1e-2,
    coll_noise: float = 1e-3,
    n_mc: int = 32,
    dtype=jnp.float64,
    parallel: bool = False,
    sqrt: bool = False,
    chunk_size=None,
    site_var: float = 1.0,
) -> CVIGP:
    """Physics-informed ST CVI model for Allen-Cahn: ∂t u = ε Δu + u − u³.

    Reference: `experiments/ac/models/m_pigp.py:133-195` + the AllenCahn
    transform (`transforms/pdes.py:223`). The LINEAR part (∂t − εΔ) enters as
    exact STOperatorHead rows; the nonlinearity u − u³ enters through the MC
    residual ELL over the joint block posterior, with sites active on every
    head at the collocation rows (full-state-observed surrogate).

    Head layout: [Ns grid values | Nc collocation values | Nc linear rows];
    residual_c = lin_c − u_c + u_c³ → 0.
    """
    from ..kernels.matern import Matern32
    from ..kernels.rbf import RBF
    from ..kernels.spatio_temporal import SpatioTemporalKernel
    from ..transforms.operators import (
        OperatorTerm,
        STOperatorHead,
        SpatialHead,
        s_laplacian,
    )

    Z = as_points(Z, dtype)
    coll = as_points(coll_points, dtype)
    Ns, Nc = Z.shape[0], coll.shape[0]
    T = np.asarray(t).shape[0]
    kern = SpatioTemporalKernel(
        k_time=k_time or Matern32(lengthscale=1.0, variance=1.0),
        k_space=k_space or RBF(),
        Z=Z,
    )
    eps_c = epsilon
    neg_eps = (
        -eps_c if not isinstance(eps_c, Param)
        else NegParam(base=eps_c)
    )
    obs = StateObservation(heads=[
        SpatialHead(points=Z),
        SpatialHead(points=coll),
        STOperatorHead(points=coll, terms=[
            OperatorTerm(coeff=1.0, t_order=1),
            OperatorTerm(coeff=neg_eps, s_op=s_laplacian),
        ]),
    ])
    Y = jnp.concatenate([
        jnp.asarray(Y_grid, dtype),
        jnp.full((T, 2 * Nc), jnp.nan, dtype),
    ], axis=1)

    def residual(f):
        u_c = f[..., Ns:Ns + Nc]
        lin_c = f[..., Ns + Nc:]
        return lin_c - u_c + u_c ** 3

    lik = CompositeLikelihood(
        heads=[Gaussian(variance=_param(noise)) for _ in range(Ns)]
        + [Gaussian(variance=_param(1.0, fixed=True)) for _ in range(2 * Nc)],
        residual=NonlinearResidual(
            noise_var=_param(coll_noise, fixed=True), fn=residual, n_mc=n_mc
        ),
    )
    return CVIGP.init(
        t=jnp.asarray(np.ravel(t), dtype),
        Y=Y,
        kernel=kern,
        likelihood=lik,
        observation=obs,
        parallel=parallel,
        sqrt=sqrt,
        chunk_size=chunk_size,
        site_var=site_var,
    )


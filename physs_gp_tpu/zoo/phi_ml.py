"""Zoo: physics-ML vector-field recipes (curl-free fields, Helmholtz).

Counterpart of the reference's `zoo/phi_ml.py` (`magnetic_field_strength_H`
ref :7, `helmholtz` :146, `helmholtz_3D` :267): vector fields constrained by
potential structure, built from derivative-operator kernels.

- curl-free: H = -∇φ, φ ~ GP  →  K_H = ∇∇' k (with W = -I mixing).
- divergence-free (2D): u = (∂ψ/∂y, -∂ψ/∂x), ψ ~ GP.
- Helmholtz (2D): u = -∇φ + rot ψ — sum of independent curl- and div-free
  GPs; the kernel sum IS the decomposition, and the posterior splits the
  observed field into its components.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..kernels.derivative import DerivativeKernel, grad_ops
from ..kernels.rbf import RBF
from ..likelihoods.gaussian import Gaussian
from ..models.batch_gp import BatchGP
from ..utils.params import positive_param
from ..utils.shapes import as_points

__all__ = [
    "curl_free_kernel",
    "div_free_kernel_2d",
    "curl_free_gp",
    "helmholtz_gp",
    "helmholtz_st_gp",
    "helmholtz_st_predict",
    "magnetic_field_gp",
    "magnetic_field_predict",
]


def curl_free_kernel(base, ds: int) -> DerivativeKernel:
    """K of H = -∇φ (negated gradient field; curl H = 0 by construction)."""
    W = -jnp.eye(ds)
    return DerivativeKernel(base=base, ops=grad_ops(ds), W=W)


def div_free_kernel_2d(base) -> DerivativeKernel:
    """K of u = (∂ψ/∂y, -∂ψ/∂x) (2-D divergence-free field)."""
    # outputs: [∂/∂x0 ψ, ∂/∂x1 ψ]; mix to (∂y ψ, -∂x ψ)
    W = jnp.array([[0.0, 1.0], [-1.0, 0.0]])
    return DerivativeKernel(base=base, ops=grad_ops(2), W=W)


def curl_free_gp(
    X,
    Y_field,
    base_kernel=None,
    noise: float = 1e-3,
    dtype=jnp.float64,
) -> BatchGP:
    """Exact GP over a curl-free vector field (ref `magnetic_field_strength_H`).

    X [N, ds] positions; Y_field [N, ds] observed field components.
    """
    X = as_points(X, dtype)
    ds = X.shape[1]
    base = base_kernel or RBF(
        lengthscales=positive_param(jnp.ones(ds, dtype)),
        variance=positive_param(jnp.asarray(1.0, dtype)),
    )
    kern = curl_free_kernel(base, ds)
    return BatchGP(
        X=X,
        Y=jnp.asarray(Y_field, dtype),
        kernel=kern,
        likelihood=Gaussian(positive_param(jnp.asarray(noise, dtype))),
    )


def helmholtz_gp(
    X,
    Y_field,
    base_curl=None,
    base_div=None,
    noise: float = 1e-3,
    dtype=jnp.float64,
) -> BatchGP:
    """2-D Helmholtz decomposition GP (ref `zoo/phi_ml.py:146`):
    u = curl-free + div-free components, each its own base GP."""
    X = as_points(X, dtype)
    assert X.shape[1] == 2, "helmholtz_gp is the 2-D recipe"

    def default_base():
        return RBF(
            lengthscales=positive_param(jnp.ones(2, dtype)),
            variance=positive_param(jnp.asarray(1.0, dtype)),
        )

    k_cf = curl_free_kernel(base_curl or default_base(), 2)
    k_df = div_free_kernel_2d(base_div or default_base())
    kern = k_cf + k_df  # SumKernel over matching multi-output blocks
    # SumKernel lacks n_outputs; annotate via attribute convention
    return BatchGP(
        X=X,
        Y=jnp.asarray(Y_field, dtype),
        kernel=_MultiOutputSum(parts=[k_cf, k_df]),
        likelihood=Gaussian(positive_param(jnp.asarray(noise, dtype))),
    )


from ..kernels.base import SumKernel as _SumKernel
from ..utils.struct import field as _field, module as _module


@_module
class _MultiOutputSum(_SumKernel):
    """Sum of multi-output kernels with a shared output count."""

    parts: list = _field(default_factory=list)

    @property
    def n_outputs(self) -> int:
        return self.parts[0].n_outputs


# ---------------------------------------------------------------------------
# State-space (Markov-time) Helmholtz: the reference's `helmholtz` /
# `helmholtz_3D` 'sde_cvi' recipes (`zoo/phi_ml.py:146,267`) — independent
# latent spatio-temporal GPs on the stream (ψ) and potential (φ) functions,
# observed through fixed-mixing spatial-derivative flow heads
#     flow(t, s) = [∂x φ + ∂y ψ,  ∂y φ − ∂x ψ](t, s).
# O(T) in time via the Kalman scans instead of the O((2N)³) batch solve.
# ---------------------------------------------------------------------------


def _helmholtz_flow_heads(points, correction: bool):
    from ..transforms.operators import SpatialHead, StackedHead, s_grad

    def sh(i):
        return SpatialHead(points=points, s_op=s_grad(i),
                           correction=correction)

    u = StackedHead(parts=[sh(0), sh(1)])            # ∂x φ + ∂y ψ
    v = StackedHead(parts=[sh(1), (-1.0, sh(0))])    # ∂y φ − ∂x ψ
    return [u, v]


def helmholtz_st_gp(
    t,
    Y_flow,
    Z,
    k_time=None,
    k_space=None,
    noise: float = 1e-2,
    dtype=jnp.float64,
    parallel: bool = False,
    sqrt: bool = False,
    chunk_size=None,
    cvi: bool = False,
):
    """Spatio-temporal Helmholtz flow GP in state-space form.

    t [T] sorted times; Y_flow [T, 2*Ns] with columns [u(sites), v(sites)]
    (NaN = missing); Z [Ns, 2] spatial sites carrying the latent states.
    Two INDEPENDENT latent ST GPs (φ potential, ψ stream) stack
    block-diagonally (`StackedMarkov`); the flow components are fixed-mixing
    spatial-derivative observation rows over both latents (`StackedHead`),
    so the posterior splits the observed flow into its curl-free and
    divergence-free parts. `cvi=True` returns the CVI model (the reference's
    'sde_cvi' default); the conjugate Gaussian case is exact either way.

    `k_time` / `k_space` accept a single kernel (deep-copied so the latents
    stay independently trainable) or a `(k_φ, k_ψ)` pair. Note the classic
    identifiability fact: with IDENTICAL isotropic priors on φ and ψ, the u
    and v components are exactly uncorrelated — cross-component transfer
    (inferring v from u) needs asymmetric latent priors, e.g. a
    divergence-dominant flow with a small-variance stream kernel.
    """
    import copy

    from ..kernels import Matern32, StackedMarkov
    from ..kernels.spatio_temporal import SpatioTemporalKernel
    from ..models import CVIGP
    from ..models.ssgp import StateSpaceGP
    from ..transforms.operators import StateObservation

    Z = as_points(Z, dtype)
    Ns = Z.shape[0]
    assert Z.shape[1] == 2, "helmholtz_st_gp is the 2-D-space recipe"

    def st(k_t, k_s):
        return SpatioTemporalKernel(
            k_time=k_t
            or Matern32(lengthscale=jnp.asarray(1.0, dtype),
                        variance=jnp.asarray(1.0, dtype)),
            k_space=k_s
            or RBF(lengthscales=positive_param(jnp.ones(2, dtype)),
                   variance=positive_param(jnp.asarray(1.0, dtype))),
            Z=Z,
        )

    def pair(k):
        # (k_φ, k_ψ) pair, or independent copies of one kernel (the latents
        # must not share trainable hyperparameters)
        return k if isinstance(k, tuple) else (k, copy.deepcopy(k))

    kt_phi, kt_psi = pair(k_time)
    ks_phi, ks_psi = pair(k_space)
    kern = StackedMarkov(parts=[st(kt_phi, ks_phi), st(kt_psi, ks_psi)])
    obs = StateObservation(heads=_helmholtz_flow_heads(Z, correction=False))

    from ..likelihoods.gaussian import IndependentGaussian, SharedVariance

    # ONE physical flow-noise variance tied across all 2*Ns rows
    lik = IndependentGaussian(variances=[
        SharedVariance(p=positive_param(jnp.asarray(noise, dtype)), n=2 * Ns)
    ])
    t = jnp.asarray(t, dtype)
    Y = jnp.asarray(Y_flow, dtype)
    if cvi:
        return CVIGP.init(
            t, Y, kern, lik, observation=obs, parallel=parallel, sqrt=sqrt,
            chunk_size=chunk_size,
        )
    return StateSpaceGP(
        t=t, Y=Y, kernel=kern, likelihood=lik, observation=obs,
        parallel=parallel, sqrt=sqrt, chunk_size=chunk_size,
    )


# ---------------------------------------------------------------------------
# State-space magnetic field: the reference's `magnetic_field_strength_H`
# 'sde_cvi' recipe (`zoo/phi_ml.py:7`) — a 3-D curl-free field H = −∇φ over
# coordinates (t, x, y), with the first coordinate carrying the Markov
# factorisation: H₁ = −∂t φ comes free from the time-kernel state (the
# reference's latents [f dx dy dt ...] with fixed W rows [0,0,0,−1,…]),
# H₂/H₃ = −∂x/−∂y φ through the spatial conditional. O(T) in the first
# coordinate instead of the O(N³) batch solve of `curl_free_gp`.
# ---------------------------------------------------------------------------


def _magnetic_heads(points, include_potential: bool, correction: bool):
    from ..transforms.operators import SpatialHead, s_grad

    def sh(t_order=0, s_op=None, coeff=1.0):
        return SpatialHead(points=points, t_order=t_order, s_op=s_op,
                           coeff=coeff, correction=correction)

    heads = [sh()] if include_potential else []  # φ itself
    heads += [
        sh(t_order=1, coeff=-1.0),          # H₁ = −∂t φ
        sh(s_op=s_grad(0), coeff=-1.0),     # H₂ = −∂x φ
        sh(s_op=s_grad(1), coeff=-1.0),     # H₃ = −∂y φ
    ]
    return heads


def magnetic_field_gp(
    t,
    Y_field,
    Z,
    k_time=None,
    k_space=None,
    noise: float = 1e-2,
    include_potential: bool = False,
    dtype=jnp.float64,
    parallel: bool = False,
    sqrt: bool = False,
    chunk_size=None,
    cvi: bool = False,
):
    """Curl-free 3-D field GP in state-space form (ref
    `zoo/phi_ml.py:7` `magnetic_field_strength_H`, model='sde_cvi').

    t [T] sorted first coordinates; Y_field [T, 3*Ns] with column blocks
    [H₁(sites), H₂(sites), H₃(sites)] (NaN = missing) — the curl-free field
    H = −∇φ of one latent potential φ(t, x, y); Z [Ns, 2] spatial sites.
    `include_potential=True` (the reference's include_potential_function)
    prepends a φ(sites) block, so Y_field is [T, 4*Ns] = [φ, H₁, H₂, H₃].

    The time kernel needs first-derivative state (order ≥ Matérn-3/2);
    `derivative_row` raises a clear error otherwise. `cvi=True` returns the
    CVI model (the reference's 'sde_cvi' default); the conjugate Gaussian
    case is exact either way.
    """
    from ..kernels import Matern32
    from ..kernels.spatio_temporal import SpatioTemporalKernel
    from ..likelihoods.gaussian import IndependentGaussian, SharedVariance
    from ..models import CVIGP
    from ..models.ssgp import StateSpaceGP
    from ..transforms.operators import StateObservation

    Z = as_points(Z, dtype)
    Ns = Z.shape[0]
    assert Z.shape[1] == 2, "magnetic_field_gp takes 2 non-Markov coordinates"
    n_blocks = 4 if include_potential else 3
    Y = jnp.asarray(Y_field, dtype)
    if Y.shape[1] != n_blocks * Ns:
        raise ValueError(
            f"Y_field has {Y.shape[1]} columns; expected {n_blocks}*Ns = "
            f"{n_blocks * Ns} ({'[φ, H1, H2, H3]' if include_potential else '[H1, H2, H3]'} site blocks)"
        )

    kern = SpatioTemporalKernel(
        k_time=k_time
        or Matern32(lengthscale=jnp.asarray(1.0, dtype),
                    variance=jnp.asarray(1.0, dtype)),
        k_space=k_space
        or RBF(lengthscales=positive_param(jnp.ones(2, dtype)),
               variance=positive_param(jnp.asarray(1.0, dtype))),
        Z=Z,
    )
    obs = StateObservation(
        heads=_magnetic_heads(Z, include_potential, correction=False)
    )
    # ONE physical field-noise variance tied across all observed rows
    lik = IndependentGaussian(variances=[
        SharedVariance(p=positive_param(jnp.asarray(noise, dtype)),
                       n=n_blocks * Ns)
    ])
    t = jnp.asarray(t, dtype)
    if cvi:
        return CVIGP.init(
            t, Y, kern, lik, observation=obs, parallel=parallel, sqrt=sqrt,
            chunk_size=chunk_size,
        )
    return StateSpaceGP(
        t=t, Y=Y, kernel=kern, likelihood=lik, observation=obs,
        parallel=parallel, sqrt=sqrt, chunk_size=chunk_size,
    )


def magnetic_field_predict(model, s_new, include_potential: bool = False):
    """Field posterior (and optionally φ) at new spatial points on the
    training times: mean/var [T, (3|4)*N*] with the same column blocks as
    `magnetic_field_gp`. Off-site conditional residuals are included in the
    variance (per-head: the −∂t block scales by Var(f′), the gradient
    blocks by the derivative-kernel residual)."""
    from ..models.ssgp import GaussianMoments
    from ..ops.lgssm import project_mean, project_var
    from ..transforms.operators import StateObservation

    if hasattr(model, "surrogate_model"):
        model = model.surrogate_model()
    s_new = as_points(s_new, model.t.dtype)
    obs = StateObservation(
        heads=_magnetic_heads(s_new, include_potential, correction=True)
    )
    H = obs.H(model.kernel)
    _, _, s = model.filter_smooth()
    mean = project_mean(H, s.ms)
    var = project_var(H, s.Ps)
    corr = obs.var_correction(model.kernel)
    if corr is not None:
        var = var + corr
    return GaussianMoments(mean=mean, var=var)


def helmholtz_st_predict(model, s_new):
    """Flow posterior (u, v) at new spatial points on the training times.

    Returns mean/var [T, 2*N*] with columns [u(s_new), v(s_new)]; the
    off-site conditional residual is included in the variance (same DTC
    marginalisation as `StateSpaceGP.posterior`).
    """
    from ..models.ssgp import GaussianMoments
    from ..ops.lgssm import project_mean, project_var
    from ..transforms.operators import StateObservation

    if hasattr(model, "surrogate_model"):
        # CVI variant: the conjugate surrogate's smoothed posterior IS q
        model = model.surrogate_model()
    s_new = as_points(s_new, model.t.dtype)
    obs = StateObservation(heads=_helmholtz_flow_heads(s_new, correction=True))
    H = obs.H(model.kernel)
    _, _, s = model.filter_smooth()
    mean = project_mean(H, s.ms)
    var = project_var(H, s.Ps)
    corr = obs.var_correction(model.kernel)
    if corr is not None:
        var = var + corr
    return GaussianMoments(mean=mean, var=var)

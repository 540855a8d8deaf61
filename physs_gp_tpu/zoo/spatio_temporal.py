"""Zoo: spatio-temporal model recipes.

Counterpart of the reference's ST recipes in `zoo/sde_diff.py` (the separable
kron ST prior + SpatialSparsity) and the `gps.py` ST baselines:

- `st_gp`: Kronecker spatio-temporal GP regression on gridded sensor data
  (BASELINE config 4).
- `advection_diffusion_gp`: physics-informed ST GP for the linear PDE
  ∂t f = a Δf - v·∇f  enforced at spatial collocation points for every time
  step (BASELINE config 5 — 2D advection-diffusion/heat).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..kernels.matern import Matern32
from ..kernels.rbf import RBF
from ..kernels.spatio_temporal import SpatioTemporalKernel
from ..likelihoods.gaussian import Gaussian, IndependentGaussian
from ..models.stgp import SpatioTemporalGP
from ..transforms.operators import (
    OperatorTerm,
    STOperatorHead,
    s_grad,
    s_laplacian,
)
from ..utils.params import NegParam, Param, param, positive_param
from ..utils.shapes import as_points

__all__ = ["st_gp", "advection_diffusion_gp", "sparse_st_gp", "scattered_st_gp", "scattered_st_predict"]


def _param(v, fixed=False):
    if isinstance(v, Param):
        return v
    p = positive_param(v)
    return p.fix() if fixed else p


def st_gp(
    t,
    Y_grid,
    Z,
    k_time=None,
    k_space=None,
    noise: float = 0.1,
    dtype=jnp.float64,
    parallel: bool = False,
    sqrt: bool = False,
    chunk_size=None,
) -> SpatioTemporalGP:
    """Separable ST GP on a time x sites grid (NaN = missing)."""
    Ns = np.asarray(Z).shape[0]
    kern = SpatioTemporalKernel(
        k_time=k_time or Matern32(lengthscale=1.0, variance=1.0),
        k_space=k_space or RBF(),
        Z=jnp.asarray(Z, dtype),
    )
    lik = _grid_gaussian(noise, Ns)
    return SpatioTemporalGP.build(
        t=jnp.asarray(t, dtype),
        Y_grid=jnp.asarray(Y_grid, dtype),
        st_kernel=kern,
        likelihood=lik,
        parallel=parallel,
        sqrt=sqrt,
        chunk_size=chunk_size,
    )


def _grid_gaussian(noise, Ns, extra=()):
    """IndependentGaussian with one TIED variance across the Ns grid heads
    (a `SharedVariance` group — a repeated Param list would silently de-tie
    under training) plus per-extra-head fixed variances."""
    from ..likelihoods.gaussian import SharedVariance

    return IndependentGaussian(
        variances=[SharedVariance(p=_param(noise), n=Ns)]
        + [_param(v, fixed=True) for v in extra]
    )


def advection_diffusion_gp(
    t,
    Y_grid,
    Z,
    coll_points,
    diffusivity,
    velocity=None,
    k_time=None,
    k_space=None,
    noise: float = 0.1,
    coll_noise: float = 1e-4,
    dtype=jnp.float64,
    parallel: bool = False,
    sqrt: bool = False,
    chunk_size=None,
) -> SpatioTemporalGP:
    """Physics-informed ST GP: ∂t f - a Δf + v·∇f = 0 at `coll_points`.

    diffusivity / velocity components may be trainable Params (unknown
    physics). Residual rows are exact linear functionals of the Kron state —
    both sequential and parallel scans stay exact (no EKF linearisation).
    """
    Z = jnp.asarray(Z, dtype)
    Ns = Z.shape[0]
    coll_points = as_points(coll_points, dtype)
    Nc = coll_points.shape[0]
    ds = Z.shape[1]
    kern = SpatioTemporalKernel(
        k_time=k_time or Matern32(lengthscale=1.0, variance=1.0),
        k_space=k_space or RBF(),
        Z=Z,
    )
    a = diffusivity
    neg_a = NegParam(base=a) if isinstance(a, Param) else -a
    terms = [
        OperatorTerm(coeff=1.0, t_order=1),
        OperatorTerm(coeff=neg_a, s_op=s_laplacian),
    ]
    if velocity is not None:
        for i in range(ds):
            v_i = velocity[i]
            terms.append(OperatorTerm(coeff=v_i, s_op=s_grad(i)))
    head = STOperatorHead(points=coll_points, terms=terms)
    T = np.asarray(t).shape[0]
    extra_Y = jnp.zeros((T, Nc), dtype)
    lik = _grid_gaussian(noise, Ns, extra=[coll_noise] * Nc)
    return SpatioTemporalGP.build(
        t=jnp.asarray(t, dtype),
        Y_grid=jnp.asarray(Y_grid, dtype),
        st_kernel=kern,
        likelihood=lik,
        extra_heads=[head],
        extra_Y=extra_Y,
        parallel=parallel,
        sqrt=sqrt,
        chunk_size=chunk_size,
    )


def sparse_st_gp(
    t,
    Y,
    X_space,
    Z,
    k_time=None,
    k_space=None,
    noise: float = 0.1,
    dtype=jnp.float64,
    train_z: bool = True,
    parallel: bool = False,
    sqrt: bool = False,
    chunk_size=None,
):
    """SpatialSparsity ST GP: data at X_space [Nd, ds], state carried by
    Ms ≪ Nd inducing sites Z (ref `sparsity/sparsity.py:65` SpatialSparsity,
    `zoo/sde_diff.py:417`).

    Observations read the state through the spatial conditional
    w = K_xZ K_ZZ^{-1} with the conditional-variance residual folded into the
    noise (exact DTC-style sparse marginal). `train_z=True` makes Z a Param —
    optimisers move the inducing sites jointly with hyperparameters.
    """
    from ..models.ssgp import StateSpaceGP
    from ..transforms.operators import SpatialHead, StateObservation

    X_space = as_points(X_space, dtype)
    Z = as_points(Z, dtype)
    Nd = X_space.shape[0]
    kern = SpatioTemporalKernel(
        k_time=k_time or Matern32(lengthscale=1.0, variance=1.0),
        k_space=k_space or RBF(),
        Z=param(Z) if train_z else Z,
    )
    obs = StateObservation(
        heads=[SpatialHead(points=X_space, correction=True)]
    )
    lik = _grid_gaussian(noise, Nd)
    return StateSpaceGP(
        t=jnp.asarray(np.ravel(t), dtype),
        Y=jnp.asarray(Y, dtype),
        kernel=kern,
        likelihood=lik,
        observation=obs,
        parallel=parallel,
        sqrt=sqrt,
        chunk_size=chunk_size,
    )


def scattered_st_gp(
    X,
    Y,
    Z=None,
    n_inducing: int | None = None,
    k_time=None,
    k_space=None,
    noise: float = 0.1,
    dtype=jnp.float64,
    train_z: bool = False,
    parallel: bool = False,
    sqrt: bool = False,
    chunk_size=None,
):
    """Raw scattered sensor rows (t, s, y) end-to-end (BASELINE config 4).

    Groups rows by time (`data.spatiotemporal.TemporallyGroupedData`, ref
    `data/data.py:727`), pads ragged groups, and observes each step's points
    through a time-varying spatial conditional (`ScatteredSpatialHead`).
    Returns (model, data); map grid-shaped posteriors back to the input rows
    with `data.unsort(...)`.

    Z defaults to k-means centres of the spatial points (`n_inducing`, ref
    `data/sequential.py:208` kmeans filler convention) or all unique points.
    """
    from scipy.cluster.vq import kmeans2

    from ..data.spatiotemporal import TemporallyGroupedData
    from ..models.ssgp import StateSpaceGP
    from ..transforms.operators import ScatteredSpatialHead, StateObservation

    data = TemporallyGroupedData.from_scattered(np.asarray(X), np.asarray(Y))
    if data.P > 1:
        raise ValueError(
            "scattered_st_gp currently supports single-output data only "
            f"(got P={data.P}): ScatteredSpatialHead emits Ng observation "
            "rows per step, so multi-output Y would mismatch H/R. Model "
            "each output column as its own scattered_st_gp, or use st_gp "
            "with an LMC kernel for coupled outputs."
        )
    if Z is None:
        pts = np.asarray(X)[:, 1:]
        if n_inducing is not None and n_inducing < pts.shape[0]:
            Z = kmeans2(pts, n_inducing, minit="points", seed=0)[0]
        else:
            Z = np.unique(pts, axis=0)
    Z = as_points(Z, dtype)
    kern = SpatioTemporalKernel(
        k_time=k_time or Matern32(lengthscale=1.0, variance=1.0),
        k_space=k_space or RBF(),
        Z=param(Z) if train_z else Z,
    )
    obs = StateObservation(
        heads=[ScatteredSpatialHead(points=jnp.asarray(data.X_st, dtype))]
    )
    lik = _grid_gaussian(noise, data.Ng * data.P)
    model = StateSpaceGP(
        t=jnp.asarray(data.t, dtype),
        Y=jnp.asarray(data.Y_flat, dtype),
        kernel=kern,
        likelihood=lik,
        observation=obs,
        parallel=parallel,
        sqrt=sqrt,
        chunk_size=chunk_size,
    )
    return model, data


def scattered_st_predict(model, data, X_query):
    """Posterior q(f) at ARBITRARY scattered (t, s...) query rows for a
    `scattered_st_gp` model.

    Rebuilds the grouped grid over train + query rows (query Y = NaN) and
    re-runs the smoother — the scattered analogue of the NaN-augmentation
    prediction path (ref `models/sde_gp.py:392`). Assumes the zoo
    construction (shared-variance IndependentGaussian, one
    ScatteredSpatialHead). Returns GaussianMoments with one row per query.
    """
    import jax.numpy as jnp

    from ..data.spatiotemporal import TemporallyGroupedData
    from ..models.ssgp import GaussianMoments
    from ..transforms.operators import ScatteredSpatialHead, StateObservation
    from ..utils.struct import replace

    X_query = np.atleast_2d(np.asarray(X_query))
    nq = X_query.shape[0]
    P = data.P
    X_all = np.vstack([data.X_raw, X_query])
    Y_all = np.vstack([data.Y_raw, np.full((nq, P), np.nan)])
    d2 = TemporallyGroupedData.from_scattered(X_all, Y_all)
    dtype = model.t.dtype
    head0 = model.observation.heads[0]
    obs = StateObservation(heads=[ScatteredSpatialHead(
        points=jnp.asarray(d2.X_st, dtype),
        t_order=head0.t_order, s_op=head0.s_op, correction=head0.correction,
    )])
    from ..likelihoods.gaussian import SharedVariance

    v0 = model.likelihood.variances[0]
    v0 = getattr(v0, "p", v0)  # unwrap a SharedVariance group
    lik = IndependentGaussian(
        variances=[SharedVariance(p=v0, n=d2.Ng * P)]
    )
    m2 = replace(
        model, t=jnp.asarray(d2.t, dtype), Y=jnp.asarray(d2.Y_flat, dtype),
        observation=obs, likelihood=lik,
    )
    post = m2.posterior()
    mean_rows = d2.unsort(np.asarray(post.mean))
    var_rows = d2.unsort(np.asarray(post.var))
    return GaussianMoments(mean=mean_rows[-nq:], var=var_rows[-nq:])


"""Derivative-observation GP recipes — the reference's `zoo/diff.py` /
`zoo/sde_diff.py` family (`diff_gp`, `diff_vgp`, `diff_sde_vgp`,
`diff_hierarchical_sde_vgp`, `diff_cvi_sde_vgp`): one latent f observed
JOINTLY with its derivatives, y columns = [f, ∂t f…, ∂s f…].

TPU-native mapping:
- batch (`deriv_gp`)   — ONE autodiff `DerivativeKernel` over the scalar
  kernel contract replaces the reference's 1258-line per-(order,dim)
  closed-form tower (`kernels/diff_op.py`).
- temporal SS (`deriv_sde_gp`) — time derivatives are FREE in the Markov
  state: `DerivativeHead(order)` rows (the reference's
  `LTI_SDE_Full_State_Obs` + `keep_dims`, `zoo/sde_diff.py:136`).
- spatio-temporal SS (`deriv_st_gp`) — the reference's `hierarchical=True`
  construction (`zoo/sde_diff.py:335` diff_cvi_sde_vgp): temporal orders off
  the state, spatial orders through the spatial conditional
  (`SpatialHead(s_op=…)`), O(T) in time; optional inducing sites = the
  sparse `diff_hierarchical_sparse_sde_vgp` variant.

Derivative-order spec matches the reference ints: `k` → orders 1..k,
`-2` → second-only (SecondOrderOnlyDerivativeKernel), `None`/`0` → none.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.params import positive_param

__all__ = ["deriv_gp", "deriv_vgp", "deriv_sde_gp", "deriv_st_gp", "diff_orders"]


def diff_orders(n) -> tuple:
    """Reference diff spec → derivative orders tuple."""
    if not n:
        return ()
    if n == -2:
        return (2,)
    if n < 0:
        raise ValueError(f"unsupported diff spec {n}; use k >= 0 or -2")
    return tuple(range(1, n + 1))


def _param(v, fixed, dtype):
    p = positive_param(jnp.asarray(v, dtype))
    return p.fix() if fixed else p


def _noise_list(noise, n_blocks, fixed, dtype):
    vs = noise if isinstance(noise, (list, tuple)) else [noise] * n_blocks
    if len(vs) != n_blocks:
        raise ValueError(f"noise list has {len(vs)} entries; expected {n_blocks}")
    return [_param(v, fixed, dtype) for v in vs]


def _as_col(A, dtype):
    """1-D point arrays are COLUMNS (N points in 1-D), matching X handling."""
    A = np.asarray(A, float)
    if A.ndim == 1:
        A = A[:, None]
    return jnp.asarray(A, dtype)


def _batch_deriv_parts(X, Y, time_diff, space_diff, kernel, dtype):
    """Shared deriv_gp/deriv_vgp assembly: inputs, op list, joint kernel."""
    from ..kernels import RBF, DerivativeKernel

    X = _as_col(X, dtype)
    D = X.shape[1]
    ops = [()]
    ops += [(0,) * o for o in diff_orders(time_diff)]
    if D > 1:
        for i in range(1, D):
            ops += [(i,) * o for o in diff_orders(space_diff)]
    kernel = kernel or RBF(
        lengthscales=positive_param(jnp.ones(D, dtype)),
        variance=positive_param(jnp.asarray(1.0, dtype)),
    )
    kern = DerivativeKernel(base=kernel, ops=tuple(ops))
    Y = jnp.asarray(Y, dtype)
    if Y.shape[1] != len(ops):
        raise ValueError(
            f"Y has {Y.shape[1]} columns; the diff spec produces {len(ops)} "
            f"outputs [f, {len(diff_orders(time_diff))} time orders, "
            f"{D - 1} spatial dims x "
            f"{len(diff_orders(space_diff)) if D > 1 else 0} orders]"
        )
    return X, Y, kern, ops


def deriv_gp(
    X,
    Y,
    time_diff=1,
    space_diff=1,
    kernel=None,
    noise=0.1,
    fix_noise: bool = False,
    dtype=jnp.float64,
):
    """Batch GP observing [f, ∂t^o f…, ∂_i^o f…] (ref `zoo/diff.py:25`).

    X [N, D] (column 0 = time when D > 1; D == 1 → temporal only, space
    orders ignored); Y [N, P] data-major with P = 1 + |time orders| +
    (D-1)·|space orders| columns in that block order (NaN = missing).
    """
    from ..likelihoods.gaussian import IndependentGaussian
    from ..models.batch_gp import BatchGP

    X, Y, kern, ops = _batch_deriv_parts(X, Y, time_diff, space_diff, kernel, dtype)
    lik = IndependentGaussian(
        variances=_noise_list(noise, len(ops), fix_noise, dtype)
    )
    return BatchGP(X=X, Y=Y, kernel=kern, likelihood=lik)


def deriv_vgp(
    X,
    Y,
    time_diff=1,
    space_diff=1,
    kernel=None,
    Z=None,
    liks=None,
    noise=0.1,
    fix_noise: bool = False,
    whiten: bool = True,
    dtype=jnp.float64,
):
    """Variational batch derivative GP (ref `zoo/diff.py:93` diff_vgp):
    free-form q(u) at inducing inputs `Z` (None → X) over the SAME joint
    derivative prior as `deriv_gp`, with per-output likelihoods — the
    AutoIP construction (Gaussian data head + non-Gaussian constraint
    heads, e.g. `Probit` for monotonicity, the reference's `lik_arr`).

    `liks`: list of one likelihood per output column (len = 1 + |time
    orders| + (D-1)·|space orders|); None → independent Gaussians with
    `noise`. Conjugate case is gated == `deriv_gp`'s exact posterior via
    one lr=1 natural-gradient step (tests/test_deriv_zoo.py).
    """
    from ..likelihoods.nongaussian import PerOutputLikelihood
    from ..models.svgp import SVGP

    X, Y, kern, ops = _batch_deriv_parts(X, Y, time_diff, space_diff, kernel, dtype)
    if liks is None:
        from ..likelihoods.gaussian import Gaussian

        liks = [
            Gaussian(variance=p)
            for p in _noise_list(noise, len(ops), fix_noise, dtype)
        ]
    if len(liks) != len(ops):
        raise ValueError(f"liks has {len(liks)} entries; expected {len(ops)}")
    lik = PerOutputLikelihood(liks=list(liks))
    Z = X if Z is None else _as_col(Z, dtype)
    if Z.shape[1] != X.shape[1]:
        raise ValueError(
            f"Z has {Z.shape[1]} input dims; X has {X.shape[1]}"
        )
    return SVGP.init(X, Y, Z, kern, lik, whiten=whiten)


def deriv_sde_gp(
    t,
    Y,
    time_diff=1,
    kernel=None,
    noise=0.1,
    fix_noise: bool = False,
    dtype=jnp.float64,
    parallel: bool = False,
    sqrt: bool = False,
    chunk_size=None,
    cvi: bool = False,
):
    """Temporal state-space derivative GP (ref `zoo/sde_diff.py:136` diff_gp
    / `zoo/diff.py:632` diff_sde_vgp): y columns [f, f^{(o)}…] read straight
    off the Markov state — exact, O(T).

    The kernel's state must hold the requested orders (Matérn p ≥ max
    order); `derivative_row` raises a clear error otherwise. `cvi=True`
    returns the CVI model (non-conjugate extensions); conjugate Gaussian
    data is exact either way.
    """
    from ..kernels import Matern72
    from ..likelihoods.gaussian import IndependentGaussian
    from ..models import CVIGP
    from ..models.ssgp import StateSpaceGP
    from ..transforms.operators import (
        DerivativeHead,
        StateObservation,
        ValueHead,
    )

    orders = diff_orders(time_diff)
    kernel = kernel or Matern72(
        lengthscale=jnp.asarray(1.0, dtype), variance=jnp.asarray(1.0, dtype)
    )
    heads = [ValueHead()] + [DerivativeHead(order=o) for o in orders]
    Y = jnp.asarray(Y, dtype)
    if Y.shape[1] != len(heads):
        raise ValueError(
            f"Y has {Y.shape[1]} columns; expected {len(heads)} "
            f"([f] + orders {orders})"
        )
    obs = StateObservation(heads=heads)
    lik = IndependentGaussian(
        variances=_noise_list(noise, len(heads), fix_noise, dtype)
    )
    t = jnp.asarray(t, dtype)
    if cvi:
        return CVIGP.init(
            t, Y, kernel, lik, observation=obs, parallel=parallel, sqrt=sqrt,
            chunk_size=chunk_size,
        )
    return StateSpaceGP(
        t=t, Y=Y, kernel=kernel, likelihood=lik, observation=obs,
        parallel=parallel, sqrt=sqrt, chunk_size=chunk_size,
    )


def deriv_st_gp(
    t,
    Y,
    Z,
    time_diff=1,
    space_diff=1,
    k_time=None,
    k_space=None,
    Zs=None,
    noise=0.1,
    fix_noise: bool = False,
    dtype=jnp.float64,
    parallel: bool = False,
    sqrt: bool = False,
    chunk_size=None,
    cvi: bool = False,
):
    """Spatio-temporal hierarchical derivative GP (ref `zoo/sde_diff.py:335`
    diff_cvi_sde_vgp with hierarchical=True; `zoo/diff.py:296,465`).

    t [T] sorted times; Z [Ns, ds] spatial sites; Y [T, n_blocks·Ns] with
    column blocks [f(Z), ∂t^o f(Z)…, ∂_i^o f(Z)… per spatial dim] (NaN =
    missing). Temporal orders come off the Markov state, spatial orders
    through the spatial conditional at the sites. `Zs` [M, ds] = inducing
    sites ≠ data sites (the sparse variant): the state lives on Zs and every
    head gains the operator-read DTC variance correction.
    """
    from ..kernels import RBF, Matern32
    from ..kernels.spatio_temporal import SpatioTemporalKernel
    from ..likelihoods.gaussian import IndependentGaussian, SharedVariance
    from ..models import CVIGP
    from ..models.ssgp import StateSpaceGP
    from ..transforms.operators import (
        SpatialHead,
        StateObservation,
        s_grad,
        s_grad2,
    )

    Z = _as_col(Z, dtype)
    Ns, ds = Z.shape
    t_orders = diff_orders(time_diff)
    s_orders = diff_orders(space_diff)
    if any(o > 2 for o in s_orders):
        raise ValueError("spatial orders above 2 are not implemented")
    sparse = Zs is not None
    if sparse:
        Zs = _as_col(Zs, dtype)
        if Zs.shape[1] != ds:
            raise ValueError(f"Zs has {Zs.shape[1]} spatial dims; Z has {ds}")
    kern = SpatioTemporalKernel(
        k_time=k_time
        or Matern32(lengthscale=jnp.asarray(1.0, dtype),
                    variance=jnp.asarray(1.0, dtype)),
        k_space=k_space
        or RBF(lengthscales=positive_param(jnp.ones(ds, dtype)),
               variance=positive_param(jnp.asarray(1.0, dtype))),
        Z=Zs if sparse else Z,
    )

    def sh(t_order=0, s_op=None):
        return SpatialHead(points=Z, t_order=t_order, s_op=s_op,
                           correction=sparse)

    heads = [sh()]
    heads += [sh(t_order=o) for o in t_orders]
    for i in range(ds):
        heads += [sh(s_op=s_grad(i) if o == 1 else s_grad2(i))
                  for o in s_orders]
    Y = jnp.asarray(Y, dtype)
    if Y.shape[1] != len(heads) * Ns:
        raise ValueError(
            f"Y has {Y.shape[1]} columns; expected {len(heads)}*Ns = "
            f"{len(heads) * Ns} ([f, {len(t_orders)} time orders, "
            f"{ds} dims x {len(s_orders)} space orders] site blocks)"
        )
    obs = StateObservation(heads=heads)
    lik = IndependentGaussian(variances=[
        SharedVariance(p=p, n=Ns)
        for p in _noise_list(noise, len(heads), fix_noise, dtype)
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

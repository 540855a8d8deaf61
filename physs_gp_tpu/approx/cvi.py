"""Conjugate-computation VI (CVI) sites and natural-gradient updates.

Counterpart of the reference's conjugate approximate posteriors
(`approximate_posteriors/conjugate_gaussian_approximate_posterior.py:174-232`),
exponential-family transforms (`natural_gradients/exponential_family_transforms.py`)
and the CVI block update (`natural_gradients/cvi_nat_grad.py:48,346-410`).

The approximate posterior of a non-conjugate model IS a surrogate conjugate
model: q(f) ∝ p(f) · Π_t N(Ỹ_t | f_t, Ṽ_t). The sites (Ỹ, Ṽ) live here as
plain batched tensors [T, p] / [T, p, p]; the natural-gradient step is

    λ1 ← (1-lr) λ1 + lr (g1 - 2 g2 m)
    λ2 ← (1-lr) λ2 + lr g2,        λ1 = Ṽ⁻¹Ỹ, λ2 = -0.5 Ṽ⁻¹,

with (g1, g2) = ∂ELL/∂(m, S) of the data ELL at the current q marginals —
one `jax.grad`, vmapped over time blocks, exactly the reference's
`cvi_block_update` but with the PSD safeguard as an eigenvalue clip instead
of a retraction map.

Missing observations keep NaN in the site mean: the surrogate filter then
masks those steps natively, which replaces the reference's infinite-variance
bookkeeping with the shared fixed-shape NaN convention.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.matrix import mat_inv, symmetrize
from ..utils.struct import module

__all__ = ["Sites", "init_sites", "to_natural", "from_natural", "natgrad_update"]

_MIN_PREC = 1e-8  # floor on site precision eigenvalues (keeps Ṽ finite)


@module
class Sites:
    """CVI pseudo-observations: N(Ỹ_t | f_t, Ṽ_t) per time block."""

    Y: jnp.ndarray  # [T, p], NaN where the data point is missing
    V: jnp.ndarray  # [T, p, p] PSD blocks


def init_sites(Y_data: jnp.ndarray, init_var: float = 1.0, active=None) -> Sites:
    """Weak initial sites centred on zero; inactive elements stay NaN.

    `active` [T, p] marks the site elements that may carry information. The
    default (observed data elements only) reproduces plain CVI; physics models
    pass a wider mask so heads constrained only through a residual ELL get
    ACTIVE sites — the reference's full-state-observed surrogate semantics
    (`conjugate_gaussian_approximate_posterior.py:174-232`,
    `models/sde_gp.py` full_state_observed). Without this, residual
    information has no site row to live in and the physics is inert.
    """
    T, p = Y_data.shape
    dtype = Y_data.dtype
    if active is None:
        active = jnp.isfinite(Y_data)
    Y0 = jnp.where(active, 0.0, jnp.nan).astype(dtype)
    V0 = jnp.broadcast_to(init_var * jnp.eye(p, dtype=dtype), (T, p, p))
    return Sites(Y=Y0, V=V0)


def to_natural(sites: Sites):
    """(Ỹ, Ṽ) -> (λ1, λ2). NaN site means are treated as zero."""
    Vinv = mat_inv(sites.V)
    lam1 = jnp.einsum("tij,tj->ti", Vinv, jnp.nan_to_num(sites.Y))
    lam2 = -0.5 * Vinv
    return lam1, lam2


def from_natural(lam1, lam2, nan_mask=None) -> Sites:
    """(λ1, λ2) -> (Ỹ, Ṽ) with precision floored away from zero.

    Cholesky-based inversion (batched eigh is an order of magnitude slower on
    TPU at [T, p, p] scale): λ2 stays negative-semidefinite under CVI updates
    with PSD ∂²ELL terms, so prec = -2 λ2 + floor·I is PD; the floor also
    caps the implied site variance at 1/floor for never-updated sites.
    """
    prec = symmetrize(-2.0 * lam2)  # [T, p, p]
    p = prec.shape[-1]
    scale = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(prec, axis1=-2, axis2=-1)), -1), 1.0
    )
    eps = _MIN_PREC * scale
    prec = prec + eps[..., None, None] * jnp.eye(p, dtype=prec.dtype)
    V = mat_inv(prec, jitter=0.0)  # already floored — no extra jitter
    Y = jnp.einsum("tij,tj->ti", V, lam1)
    if nan_mask is not None:
        Y = jnp.where(nan_mask, jnp.nan, Y)
    return Sites(Y=Y, V=symmetrize(V))


def natgrad_update(
    sites: Sites,
    m: jnp.ndarray,  # [T, p] q(f) marginal means
    S: jnp.ndarray,  # [T, p, p] q(f) marginal covariance blocks
    ell_fn,  # (m, S) -> scalar sum ELL
    lr: float,
    grads=None,  # optional precomputed (g1, g2), e.g. Gauss-Newton g2
    naturals=None,  # optional precomputed to_natural(sites)
) -> Sites:
    """One CVI natural-gradient step on all sites jointly.

    ell_fn must be the *data* expected log-likelihood as a function of the
    q(f) block moments (differentiated here; ref `cvi_nat_grad.py:380`).
    `grads` overrides the autodiff (g1, g2) — used for the Gauss-Newton /
    Laplace-GN Hessian approximations (ref
    `natural_gradients/cvi_hessian_approximations.py:85-634`) whose g2 is
    negative-semidefinite by construction.
    `naturals` overrides `to_natural(sites)` — the single-pass CVI step
    already inverted the site blocks for the ELBO's site-ELL term and
    passes (λ1, λ2) here instead of re-inverting [T, p, p].
    """
    if grads is None:
        g1, g2 = jax.grad(ell_fn, argnums=(0, 1))(m, S)
    else:
        g1, g2 = grads
    g2 = symmetrize(g2)
    lam1, lam2 = naturals if naturals is not None else to_natural(sites)
    lam1_new = (1.0 - lr) * lam1 + lr * (
        g1 - 2.0 * jnp.einsum("tij,tj->ti", g2, m)
    )
    lam2_new = (1.0 - lr) * lam2 + lr * g2
    nan_mask = ~jnp.isfinite(sites.Y)
    return from_natural(lam1_new, lam2_new, nan_mask)

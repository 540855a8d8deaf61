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

__all__ = ["curl_free_kernel", "div_free_kernel_2d", "curl_free_gp", "helmholtz_gp"]


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
    X = jnp.asarray(np.atleast_2d(X), dtype)
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
    X = jnp.asarray(np.atleast_2d(X), dtype)
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

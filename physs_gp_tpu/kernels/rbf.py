"""RBF / squared-exponential kernel (ref: `stgp/kernels/rbf.py:9`).

Non-Markov; used as the spatial factor of separable spatio-temporal priors and
as the base kernel for derivative-operator (physics) kernels, where its
infinite smoothness matters.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.params import Param, positive_param
from ..utils.struct import field, module
from .base import _as_2d, StationaryKernel

__all__ = ["RBF"]


@module
class RBF(StationaryKernel):
    lengthscales: Param = field(default_factory=lambda: positive_param(1.0))
    variance: Param = field(default_factory=lambda: positive_param(1.0))

    def k_from_sqdist(self, d2):
        return jnp.exp(-0.5 * d2)

    def K_op(self, S, Z, kind):
        """Closed-form derivative cross-covariances (L_s k)(S, Z) applied in
        the FIRST argument: kind in {"identity", ("grad", i), "laplacian"}.

        Replaces nested-autodiff construction (ref `kernels/diff_op.py:12`)
        for the spatial-conditional PDE rows: one batched expression instead
        of vmapped per-pair jacobians/hessians — orders of magnitude fewer
        XLA ops (compile time) and exactly the analytic derivatives:
            grad_i:    dk/ds_i = -k * d_i / l_i^2
            laplacian: sum_i d2k/ds_i^2 = k * (sum_i d_i^2/l_i^4 - sum_i 1/l_i^2)
        with d = S - Z and ARD lengthscales l.
        """
        S, Z = _as_2d(S), _as_2d(Z)
        K = self.K(S, Z)  # [N, Ns]
        if kind == "identity":
            return K
        ls = jnp.broadcast_to(
            jnp.atleast_1d(self.lengthscales.value), (S.shape[1],)
        )
        D = S[:, None, :] - Z[None, :, :]  # [N, Ns, ds]
        if isinstance(kind, tuple) and kind[0] == "grad":
            i = kind[1]
            return -K * D[..., i] / ls[i] ** 2
        if kind == "laplacian":
            quad = jnp.sum(D * D / ls**4, axis=-1)
            return K * (quad - jnp.sum(1.0 / ls**2))
        if isinstance(kind, tuple) and kind[0] == "grad2":
            i = kind[1]
            return K * (D[..., i] ** 2 / ls[i] ** 4 - 1.0 / ls[i] ** 2)
        raise ValueError(f"unknown spatial operator kind: {kind!r}")


def rbf(lengthscales=1.0, variance=1.0) -> RBF:
    return RBF(
        lengthscales=positive_param(lengthscales), variance=positive_param(variance)
    )

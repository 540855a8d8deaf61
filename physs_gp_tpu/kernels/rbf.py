"""RBF / squared-exponential kernel (ref: `stgp/kernels/rbf.py:9`).

Non-Markov; used as the spatial factor of separable spatio-temporal priors and
as the base kernel for derivative-operator (physics) kernels, where its
infinite smoothness matters.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.params import Param, positive_param
from ..utils.struct import field, module
from .base import StationaryKernel

__all__ = ["RBF"]


@module
class RBF(StationaryKernel):
    lengthscales: Param = field(default_factory=lambda: positive_param(1.0))
    variance: Param = field(default_factory=lambda: positive_param(1.0))

    def k_from_sqdist(self, d2):
        return jnp.exp(-0.5 * d2)


def rbf(lengthscales=1.0, variance=1.0) -> RBF:
    return RBF(
        lengthscales=positive_param(lengthscales), variance=positive_param(variance)
    )

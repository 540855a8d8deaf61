"""Kernel base classes.

TPU-native counterpart of `stgp/kernels/kernel.py` (ref lines 21-477). Kernels
are immutable pytrees; `K`/`K_diag` are pure functions of (params, inputs).

Design notes vs the reference:
- Every kernel exposes a *scalar* form `k_scalar(x1, x2)` (vectors in, scalar
  out). Derivative-operator kernels (the physics layer) are built by nested
  `jax.jacfwd` over this scalar form, exactly as `kernels/diff_op.py` does in
  the reference — but here it is the documented contract, not an internal.
- Stationary kernels additionally implement the MXU-friendly Gram path:
  squared distances via one matmul (`X1 @ X2^T`), so large Gram matrices hit
  the systolic array instead of a vmap-of-vmap gather pattern.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..utils.params import Param, positive_param
from ..utils.struct import field, module, static

__all__ = [
    "Kernel",
    "StationaryKernel",
    "SumKernel",
    "ProductKernel",
    "WhiteNoise",
    "Bias",
    "LinearKernel",
    "scaled_sqdist",
]


def _as_2d(X: jnp.ndarray) -> jnp.ndarray:
    X = jnp.asarray(X)
    if X.ndim == 1:
        X = X[:, None]
    return X


def scaled_sqdist(X1: jnp.ndarray, X2: jnp.ndarray, lengthscales) -> jnp.ndarray:
    """Pairwise squared distance of lengthscale-scaled inputs, via matmul.

    [N, D], [M, D] -> [N, M]. The cross term is a single MXU matmul.
    """
    X1 = _as_2d(X1) / lengthscales
    X2 = _as_2d(X2) / lengthscales
    n1 = jnp.sum(X1 * X1, -1)
    n2 = jnp.sum(X2 * X2, -1)
    d2 = n1[:, None] + n2[None, :] - 2.0 * (X1 @ X2.T)
    return jnp.maximum(d2, 0.0)


class Kernel:
    """Abstract kernel. Subclasses are @module pytrees."""

    # ---- scalar contract (autodiff surface for the physics layer) ----
    def k_scalar(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    # ---- batched evaluation ----
    def K(self, X1: jnp.ndarray, X2: jnp.ndarray) -> jnp.ndarray:
        X1, X2 = _as_2d(X1), _as_2d(X2)
        return jax.vmap(lambda a: jax.vmap(lambda b: self.k_scalar(a, b))(X2))(X1)

    def K_diag(self, X: jnp.ndarray) -> jnp.ndarray:
        X = _as_2d(X)
        return jax.vmap(lambda a: self.k_scalar(a, a))(X)

    # ---- combinators ----
    def __add__(self, other: "Kernel") -> "SumKernel":
        return SumKernel(parts=_flatten(self, other, SumKernel))

    def __mul__(self, other: "Kernel") -> "ProductKernel":
        return ProductKernel(parts=_flatten(self, other, ProductKernel))


def _flatten(a: Kernel, b: Kernel, cls) -> list:
    parts = []
    for k in (a, b):
        parts.extend(k.parts if isinstance(k, cls) else [k])
    return parts


class StationaryKernel(Kernel):
    """ARD stationary kernel: k(x1,x2) = variance * k_r(|| (x1-x2)/ls ||).

    Subclasses implement `k_from_sqdist(d2)` returning the *unit-variance*
    correlation as a function of squared scaled distance.
    """

    # fields provided by @module subclasses: lengthscales: Param, variance: Param

    def k_from_sqdist(self, d2: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def k_scalar(self, x1, x2):
        diff = (jnp.atleast_1d(x1) - jnp.atleast_1d(x2)) / self.lengthscales.value
        d2 = jnp.sum(diff * diff)
        return self.variance.value * self.k_from_sqdist(d2)

    def K(self, X1, X2):
        d2 = scaled_sqdist(X1, X2, self.lengthscales.value)
        return self.variance.value * self.k_from_sqdist(d2)

    def K_diag(self, X):
        X = _as_2d(X)
        return jnp.full((X.shape[0],), 1.0) * self.variance.value


@module
class SumKernel(Kernel):
    parts: list = field(default_factory=list)

    def k_scalar(self, x1, x2):
        return sum(k.k_scalar(x1, x2) for k in self.parts)

    def K(self, X1, X2):
        return sum(k.K(X1, X2) for k in self.parts)

    def K_diag(self, X):
        return sum(k.K_diag(X) for k in self.parts)


@module
class ProductKernel(Kernel):
    parts: list = field(default_factory=list)

    def k_scalar(self, x1, x2):
        out = self.parts[0].k_scalar(x1, x2)
        for k in self.parts[1:]:
            out = out * k.k_scalar(x1, x2)
        return out

    def K(self, X1, X2):
        out = self.parts[0].K(X1, X2)
        for k in self.parts[1:]:
            out = out * k.K(X1, X2)
        return out

    def K_diag(self, X):
        out = self.parts[0].K_diag(X)
        for k in self.parts[1:]:
            out = out * k.K_diag(X)
        return out


@module
class WhiteNoise(Kernel):
    """(ref: `kernels/kernel.py:267` WhiteNoiseKernel)"""

    variance: Param = field(default_factory=lambda: positive_param(1.0))

    def k_scalar(self, x1, x2):
        same = jnp.all(x1 == x2)
        return jnp.where(same, self.variance.value, 0.0)

    def K(self, X1, X2):
        X1, X2 = _as_2d(X1), _as_2d(X2)
        eq = jnp.all(X1[:, None, :] == X2[None, :, :], -1)
        return jnp.where(eq, self.variance.value, 0.0)

    def K_diag(self, X):
        X = _as_2d(X)
        return jnp.full((X.shape[0],), 1.0) * self.variance.value


@module
class Bias(Kernel):
    """Constant kernel (ref: `kernels/bias.py`)."""

    variance: Param = field(default_factory=lambda: positive_param(1.0))

    def k_scalar(self, x1, x2):
        return self.variance.value

    def K(self, X1, X2):
        X1, X2 = _as_2d(X1), _as_2d(X2)
        return jnp.full((X1.shape[0], X2.shape[0]), 1.0) * self.variance.value

    def K_diag(self, X):
        return jnp.full((_as_2d(X).shape[0],), 1.0) * self.variance.value


@module
class LinearKernel(Kernel):
    """k(x1,x2) = variance * <x1, x2> (ref: `kernels/kernel.py:456` Linear)."""

    variance: Param = field(default_factory=lambda: positive_param(1.0))

    def k_scalar(self, x1, x2):
        return self.variance.value * jnp.dot(jnp.atleast_1d(x1), jnp.atleast_1d(x2))

    def K(self, X1, X2):
        X1, X2 = _as_2d(X1), _as_2d(X2)
        return self.variance.value * (X1 @ X2.T)

    def K_diag(self, X):
        X = _as_2d(X)
        return self.variance.value * jnp.sum(X * X, -1)

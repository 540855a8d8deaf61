"""Mean functions (ref `stgp/means/mean.py`).

A mean maps inputs [N, D] -> [N]; models subtract it from observations before
(zero-mean) inference and add it back on prediction. Derivative heads use
`deriv(X, order)` — autodiff of the mean, matching the reference's derivative
means (`means/mean.py:44-297`).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.params import Param, param
from ..utils.struct import field, module, static

__all__ = ["ZeroMean", "ConstantMean", "LinearMean", "FunctionMean"]


class Mean:
    def __call__(self, X):
        raise NotImplementedError

    def deriv(self, X, order: int = 1, dim: int = 0):
        """d^order mean / dx_dim^order, via autodiff."""
        f = lambda x: self._scalar(x)
        for _ in range(order):
            f = (lambda g: lambda x: jax.grad(g)(x)[dim])(f)
        X = jnp.atleast_2d(X)
        return jax.vmap(f)(X)

    def _scalar(self, x):
        return self(x[None])[0]


@module
class ZeroMean(Mean):
    def __call__(self, X):
        X = jnp.atleast_2d(X)
        return jnp.zeros(X.shape[0], X.dtype)


@module
class ConstantMean(Mean):
    c: Param = field(default_factory=lambda: param(0.0))

    def __call__(self, X):
        X = jnp.atleast_2d(X)
        return jnp.broadcast_to(self.c.value, (X.shape[0],))


@module
class LinearMean(Mean):
    w: Param
    b: Param = field(default_factory=lambda: param(0.0))

    def __call__(self, X):
        X = jnp.atleast_2d(X)
        return X @ self.w.value + self.b.value


@module
class FunctionMean(Mean):
    fn: Callable = static(default=None)

    def __call__(self, X):
        X = jnp.atleast_2d(X)
        return jax.vmap(self.fn)(X)

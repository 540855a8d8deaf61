"""Constrained trainable parameters as pytrees.

Replaces the reference's objax-based `Parameter` (`stgp/parameter.py:7`) and
`computation/parameter_transforms.py` with stateless bijector-wrapped leaves.
A `Param` stores the *unconstrained* value; `.value` applies the bijector
forward transform at trace time (XLA fuses it into the consumer). `fixed=True`
stops gradients, mirroring the reference's `Parameter.fix()` semantics without
mutating optimiser state.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .struct import module, static, replace

__all__ = [
    "Bijector",
    "Identity",
    "Positive",
    "Sigmoid",
    "positive",
    "identity",
    "Param",
    "param",
    "NegParam",
    "positive_param",
    "fill_triangular",
    "fill_triangular_inverse",
    "tril_param",
    "tril_value",
]

_SOFTPLUS_SHIFT = 1e-6  # lower bound keeping positive params away from 0


@module
class Identity:
    def forward(self, x):
        return x

    def inverse(self, y):
        return y


@module
class Positive:
    """softplus with a small shift: y = softplus(x) + shift."""

    shift: float = static(default=_SOFTPLUS_SHIFT)

    def forward(self, x):
        return jax.nn.softplus(x) + self.shift

    def inverse(self, y):
        # softplus^-1(y) = log(expm1(y)); numerically stable form.
        y = jnp.asarray(y) - self.shift
        return y + jnp.log(-jnp.expm1(-y))


@module
class Sigmoid:
    """y in (lo, hi)."""

    lo: float = static(default=0.0)
    hi: float = static(default=1.0)

    def forward(self, x):
        return self.lo + (self.hi - self.lo) * jax.nn.sigmoid(x)

    def inverse(self, y):
        p = (jnp.asarray(y) - self.lo) / (self.hi - self.lo)
        return jnp.log(p) - jnp.log1p(-p)


Bijector = Any
identity = Identity()
positive = Positive()


@module
class Param:
    """A (possibly constrained, possibly fixed) trainable leaf."""

    raw: jnp.ndarray
    bijector: Bijector = static(default=identity)
    fixed: bool = static(default=False)

    @property
    def value(self) -> jnp.ndarray:
        raw = jax.lax.stop_gradient(self.raw) if self.fixed else self.raw
        return self.bijector.forward(raw)

    def with_value(self, value) -> "Param":
        return replace(self, raw=self.bijector.inverse(jnp.asarray(value)))

    def fix(self) -> "Param":
        return replace(self, fixed=True)

    def release(self) -> "Param":
        return replace(self, fixed=False)


def param(value, dtype=None) -> Param:
    return Param(raw=jnp.asarray(value, dtype=dtype))


def positive_param(value, dtype=None, fixed: bool = False) -> Param:
    v = jnp.asarray(value, dtype=dtype)
    return Param(raw=positive.inverse(v), bijector=positive, fixed=fixed)


def _tril_size(n: int) -> int:
    return n * (n + 1) // 2


def fill_triangular(vec: jnp.ndarray, n: int) -> jnp.ndarray:
    """Pack a [..., n(n+1)/2] vector into a lower-triangular [..., n, n]."""
    rows, cols = jnp.tril_indices(n)
    out = jnp.zeros(vec.shape[:-1] + (n, n), vec.dtype)
    return out.at[..., rows, cols].set(vec)


def fill_triangular_inverse(mat: jnp.ndarray) -> jnp.ndarray:
    n = mat.shape[-1]
    rows, cols = jnp.tril_indices(n)
    return mat[..., rows, cols]


def tril_param(mat: jnp.ndarray) -> Param:
    """Parameterise a (batch of) lower-triangular matrices by their packed vec."""
    return Param(raw=fill_triangular_inverse(jnp.asarray(mat)))


def tril_value(p: Param, n: int) -> jnp.ndarray:
    return fill_triangular(p.value, n)


@module
class NegParam:
    """View of a (typically positive) Param as its negation.

    Lets a model expose a strictly-negative trainable coefficient (e.g. the
    -a Δf advection/diffusion terms, monotonicity's -ε) while the underlying
    Param trains in the positive bijector's well-conditioned space.
    """

    base: Param

    @property
    def value(self):
        return -self.base.value

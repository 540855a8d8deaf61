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

from ..utils.shapes import as_points as _as_points

from ..utils.params import Param, param
from ..utils.struct import field, module, static

__all__ = [
    "ZeroMean",
    "ConstantMean",
    "LinearMean",
    "FunctionMean",
    "head_mean_values",
]


class Mean:
    def __call__(self, X):
        raise NotImplementedError

    def deriv(self, X, order: int = 1, dim: int = 0):
        """d^order mean / dx_dim^order, via autodiff."""
        f = lambda x: self._scalar(x)
        for _ in range(order):
            f = (lambda g: lambda x: jax.grad(g)(x)[dim])(f)
        X = _as_points(X)
        return jax.vmap(f)(X)

    def _scalar(self, x):
        return self(x[None])[0]


@module
class ZeroMean(Mean):
    def __call__(self, X):
        X = _as_points(X)
        return jnp.zeros(X.shape[0], X.dtype)


@module
class ConstantMean(Mean):
    c: Param = field(default_factory=lambda: param(0.0))

    def __call__(self, X):
        X = _as_points(X)
        return jnp.broadcast_to(self.c.value, (X.shape[0],))


@module
class LinearMean(Mean):
    w: Param
    b: Param = field(default_factory=lambda: param(0.0))

    def __call__(self, X):
        X = _as_points(X)
        return X @ self.w.value + self.b.value


@module
class FunctionMean(Mean):
    fn: Callable = static(default=None)

    def __call__(self, X):
        X = _as_points(X)
        return jax.vmap(self.fn)(X)


def _one_head_mean(mean, head, t):
    """[T] or [T, n_h] prior-mean values of one observation head.

    Heads observe linear functionals L[f]; with prior mean μ the observed
    process has mean L[μ] (ref derivative means `means/mean.py:44-297`).
    Physics-residual heads (STOperatorHead) and spatial-operator heads get 0:
    residual targets are constraints on the zero-mean deviation — matching
    the reference experiments, which use zero means on residual outputs.
    """
    # local import: transforms imports kernels; avoid cycle at module scope
    from ..transforms.operators import (
        DerivativeHead,
        LinearOperatorHead,
        ScatteredSpatialHead,
        SpatialHead,
        ValueHead,
    )

    X_t = t[:, None]
    if isinstance(head, ValueHead):
        return mean(X_t)
    if isinstance(head, DerivativeHead):
        return mean.deriv(X_t, head.order)
    if isinstance(head, LinearOperatorHead):
        out = 0.0
        for k, c in enumerate(head.coeffs):
            cv = c.value if hasattr(c, "value") else c
            out = out + cv * mean.deriv(X_t, k)
        return out
    if isinstance(head, SpatialHead) and head.t_order == 0 and head.s_op is None:
        # mean over (t, s_j) rows: [T, N_h]
        return jax.vmap(
            lambda s: mean(jnp.concatenate([X_t, jnp.broadcast_to(
                s, (X_t.shape[0],) + s.shape)], axis=1)),
            out_axes=1,
        )(head.points)
    if (
        isinstance(head, ScatteredSpatialHead)
        and head.t_order == 0
        and head.s_op is None
    ):
        return jax.vmap(
            lambda tk, pts: mean(
                jnp.concatenate(
                    [jnp.broadcast_to(tk, (pts.shape[0], 1)), pts], axis=1
                )
            )
        )(t, head.points)  # [T, Ng]
    n = head.points.shape[-2] if hasattr(head, "points") else 1
    shape = (t.shape[0], n) if n > 1 else (t.shape[0],)
    return jnp.zeros(shape, t.dtype)


def head_mean_values(mean, t, observation=None, p: int = 1):
    """Prior-mean matrix μ [T, p] aligned with the model's observation heads.

    `mean` may be a single Mean (shared by plain value heads) or a list with
    one Mean per head/output column. With `observation=None` the model
    observes f directly on each of its p outputs.
    """
    t = jnp.ravel(t)
    if observation is None:
        if isinstance(mean, (list, tuple)):
            cols = [m(t[:, None]) for m in mean]
        else:
            cols = [mean(t[:, None])] * p
        return jnp.stack(cols, axis=1)
    heads = observation.heads
    means = mean if isinstance(mean, (list, tuple)) else [mean] * len(heads)
    cols = []
    for m, h in zip(means, heads):
        v = _one_head_mean(m, h, t)
        cols.append(v[:, None] if v.ndim == 1 else v)
    return jnp.concatenate(cols, axis=1)

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
    "OnDims",
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


def autodiff_deriv_fn(k_scalar, a: tuple, b: tuple):
    """∂^a_{x1} ∂^b_{x2} k by nested autodiff over the scalar contract
    (multi-indices a/b = input-dim tuples). Correct for kernels SMOOTH at
    x1 == x2 (RBF, periodic, …); |τ|-kernels (Matérn) must provide
    `k_deriv_fn` closed forms instead — their autodiff derivatives are
    WRONG at coincident points (the in-sqrt floor zeroes the chain)."""
    f = k_scalar
    for i in a:
        f = (lambda g, i=i: lambda x1, x2: jax.grad(g, argnums=0)(x1, x2)[i])(f)
    for j in b:
        f = (lambda g, j=j: lambda x1, x2: jax.grad(g, argnums=1)(x1, x2)[j])(f)
    return f


class Kernel:
    """Abstract kernel. Subclasses are @module pytrees."""

    # ---- scalar contract (autodiff surface for the physics layer) ----
    def k_scalar(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def k_deriv_fn(self, a: tuple, b: tuple):
        """Optional closed-form derivative cross-covariance: return a scalar
        function fn(x1, x2) = ∂^a_{x1} ∂^b_{x2} k, or None to use the
        nested-autodiff tower (`autodiff_deriv_fn`). Markov kernels provide
        this from their state-space form — exact at coincident points where
        autodiff of |τ|-kernels is not."""
        return None

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

    def k_deriv_fn(self, a, b):
        # derivatives distribute over sums; each part uses its own closed
        # form when it has one (a Matérn part stays exact at τ = 0)
        fns = [
            k.k_deriv_fn(a, b) or autodiff_deriv_fn(k.k_scalar, a, b)
            for k in self.parts
        ]
        return lambda x1, x2: sum(f(x1, x2) for f in fns)


@module
class OnDims(Kernel):
    """Route `base` onto a subset of input dims — the reference's
    active-dims / `input_index` mechanism (`kernels/diff_op.py:86`,
    `SpatioTemporalSeperableKernel` time/space split) as a composable
    wrapper: k(x1, x2) = base(x1[dims], x2[dims]). Separable products are
    then `OnDims(k_t, (0,)) * OnDims(k_s, (1, 2))`."""

    base: object
    dims: tuple = static(default=(0,))

    def _idx(self):
        import numpy as np

        return np.asarray(self.dims, dtype=int)

    def k_scalar(self, x1, x2):
        idx = self._idx()
        return self.base.k_scalar(
            jnp.atleast_1d(x1)[idx], jnp.atleast_1d(x2)[idx]
        )

    def K(self, X1, X2):
        idx = self._idx()
        return self.base.K(_as_2d(X1)[:, idx], _as_2d(X2)[:, idx])

    def K_diag(self, X):
        return self.base.K_diag(_as_2d(X)[:, self._idx()])

    def k_deriv_fn(self, a, b):
        """Global derivative dims map onto the base's local dims; a
        derivative wrt a dim this kernel ignores is identically zero."""
        if any(g not in self.dims for g in (*a, *b)):
            return lambda x1, x2: jnp.zeros((), _as_2d(x1).dtype)
        la = tuple(self.dims.index(g) for g in a)
        lb = tuple(self.dims.index(g) for g in b)
        inner = self.base.k_deriv_fn(la, lb) or autodiff_deriv_fn(
            self.base.k_scalar, la, lb
        )
        idx = self._idx()
        return lambda x1, x2: inner(
            jnp.atleast_1d(x1)[idx], jnp.atleast_1d(x2)[idx]
        )


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

    def k_deriv_fn(self, a, b):
        """Separable products (parts on DISJOINT `OnDims` subsets — the
        reference's SpatioTemporalSeperableKernel factorisation): each
        derivative index lands in exactly one factor, so the mixed product
        rule collapses to a product of per-factor derivatives. Falls back
        to the autodiff tower (return None) for overlapping-dims products."""
        if not (a or b):
            return None
        dims = [getattr(k, "dims", None) for k in self.parts]
        claimed = [g for d in dims for g in (d or ())]
        if (
            any(d is None for d in dims)
            or len(claimed) != len(set(claimed))  # overlapping factors
            or any(g not in claimed for g in (*a, *b))
        ):
            # cannot factorise. Falling back to autodiff is only safe when
            # every part is autodiff-safe at coincident points — a part that
            # OVERRIDES k_deriv_fn (Matérn & co) declares it is not.
            bad = [
                type(k).__name__
                for k in self.parts
                if type(k).k_deriv_fn is not Kernel.k_deriv_fn
            ]
            if bad:
                raise ValueError(
                    f"ProductKernel derivative: parts are not disjoint OnDims "
                    f"factors, and {bad} have closed-form derivative "
                    f"covariances (|tau| kernels are WRONG under the autodiff "
                    f"tower at coincident points). Wrap each factor as "
                    f"OnDims(kernel, dims) with disjoint dims."
                )
            return None
        fns = []
        for k, d in zip(self.parts, dims):
            pa = tuple(g for g in a if g in d)
            pb = tuple(g for g in b if g in d)
            fns.append(k.k_deriv_fn(pa, pb) or autodiff_deriv_fn(k.k_scalar, pa, pb))

        def fn(x1, x2):
            out = fns[0](x1, x2)
            for f in fns[1:]:
                out = out * f(x1, x2)
            return out

        return fn


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

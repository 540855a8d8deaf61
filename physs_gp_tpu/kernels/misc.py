"""Additional batch kernels: RQ, spectral mixture, arccosine, Gibbs, deep.

Counterpart of the reference's `kernels/{rq.py, spectral_mixture.py,
arccosine.py, gibbs.py, deep_kernels.py}`. All implement the scalar contract
(usable under derivative operators) plus the MXU-friendly Gram path where
the stationary structure allows.
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.params import Param, param, positive_param
from ..utils.struct import field, module, static
from .base import Kernel, StationaryKernel, _as_2d, scaled_sqdist

__all__ = ["RQ", "SpectralMixture", "ArcCosine", "Gibbs", "DeepKernel"]


@module
class RQ(StationaryKernel):
    """Rational quadratic: sigma^2 (1 + d2 / (2 alpha))^-alpha
    (ref `kernels/rq.py`)."""

    lengthscales: Param = field(default_factory=lambda: positive_param(1.0))
    variance: Param = field(default_factory=lambda: positive_param(1.0))
    alpha: Param = field(default_factory=lambda: positive_param(1.0))

    def k_from_sqdist(self, d2):
        a = self.alpha.value
        return (1.0 + d2 / (2.0 * a)) ** (-a)


@module
class SpectralMixture(Kernel):
    """Sum of Q spectral-mixture components (ref `spectral_mixture.py:12`):
    k(tau) = sum_q w_q prod_d exp(-2 pi^2 tau_d^2 v_qd) cos(2 pi tau_d mu_qd).
    """

    weights: Param  # [Q]
    means: Param  # [Q, D] component frequencies
    scales: Param  # [Q, D] component variances

    @classmethod
    def init(cls, Q: int, D: int = 1, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        return cls(
            weights=positive_param(jnp.ones(Q) / Q),
            means=Param(raw=jax.random.uniform(k1, (Q, D), minval=0.1, maxval=1.0)),
            scales=positive_param(jax.random.uniform(k2, (Q, D), minval=0.1, maxval=1.0)),
        )

    def k_scalar(self, x1, x2):
        tau = jnp.atleast_1d(x1) - jnp.atleast_1d(x2)  # [D]
        w = self.weights.value
        mu = self.means.value
        v = self.scales.value
        comp = jnp.exp(-2.0 * math.pi**2 * (tau[None, :] ** 2 * v)).prod(-1)
        comp = comp * jnp.cos(2.0 * math.pi * (tau[None, :] * mu).sum(-1))
        return jnp.sum(w * comp)


@module
class ArcCosine(Kernel):
    """Order-1 arc-cosine (infinite ReLU network) kernel
    (ref `arccosine.py:9,62`)."""

    variance: Param = field(default_factory=lambda: positive_param(1.0))
    weight_var: Param = field(default_factory=lambda: positive_param(1.0))
    bias_var: Param = field(default_factory=lambda: positive_param(1.0))

    def _dot(self, x1, x2):
        return self.weight_var.value * jnp.dot(x1, x2) + self.bias_var.value

    def k_scalar(self, x1, x2):
        x1, x2 = jnp.atleast_1d(x1), jnp.atleast_1d(x2)
        s11, s22, s12 = self._dot(x1, x1), self._dot(x2, x2), self._dot(x1, x2)
        denom = jnp.sqrt(s11 * s22)
        cos_t = jnp.clip(s12 / denom, -1.0, 1.0)
        theta = jnp.arccos(cos_t)
        J = jnp.sin(theta) + (math.pi - theta) * cos_t
        return self.variance.value / math.pi * denom * J


@module
class Gibbs(Kernel):
    """Non-stationary Gibbs kernel with input-dependent lengthscale
    l(x) (ref `gibbs.py:4`); l_fn maps [D] -> scalar > 0."""

    variance: Param = field(default_factory=lambda: positive_param(1.0))
    l_fn: Callable = static(default=None)

    def k_scalar(self, x1, x2):
        x1, x2 = jnp.atleast_1d(x1), jnp.atleast_1d(x2)
        l1, l2 = self.l_fn(x1), self.l_fn(x2)
        D = x1.shape[-1]
        pre = (2.0 * l1 * l2 / (l1**2 + l2**2)) ** (D / 2.0)
        d2 = jnp.sum((x1 - x2) ** 2) / (l1**2 + l2**2)
        return self.variance.value * pre * jnp.exp(-d2)


@module
class DeepKernel(Kernel):
    """Base kernel over a learned feature map (ref `deep_kernels.py:19`):
    k(x, x') = k_base(g(x), g(x')) with g a small MLP (params in `layers`).
    """

    base: object
    layers: list = field(default_factory=list)  # [(W Param, b Param), ...]

    @classmethod
    def init(cls, base, sizes, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        layers = []
        for din, dout in zip(sizes[:-1], sizes[1:]):
            key, k1 = jax.random.split(key)
            W = param(jax.random.normal(k1, (din, dout)) / jnp.sqrt(din))
            b = param(jnp.zeros(dout))
            layers.append([W, b])
        return cls(base=base, layers=layers)

    def _features(self, x):
        h = jnp.atleast_1d(x)
        for i, (W, b) in enumerate(self.layers):
            h = h @ W.value + b.value
            if i < len(self.layers) - 1:
                h = jnp.tanh(h)
        return h

    def k_scalar(self, x1, x2):
        return self.base.k_scalar(self._features(x1), self._features(x2))

    def K(self, X1, X2):
        F1 = jax.vmap(self._features)(_as_2d(X1))
        F2 = jax.vmap(self._features)(_as_2d(X2))
        return self.base.K(F1, F2)

    def K_diag(self, X):
        F = jax.vmap(self._features)(_as_2d(X))
        return self.base.K_diag(F)

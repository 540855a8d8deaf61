"""Bijector-warped observations with log-Jacobian corrections.

Counterpart of the reference's `TransformedData` (`data/data.py:224`) and the
elementwise flows in `transforms/basic.py:10-174`: observations are modelled
on a warped scale z = g(y) (e.g. log for positive data, Box-Cox), and
likelihood corrections carry the |dg/dy| Jacobian so lml / NLPD stay in the
ORIGINAL data space.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.struct import module, static

__all__ = [
    "LogTransform",
    "BoxCoxTransform",
    "AffineTransform",
    "ExpTransform",
    "SoftplusTransform",
    "SquareTransform",
    "ReverseFlow",
    "CompositeFlow",
    "TransformedData",
]


class Flow:
    """Elementwise invertible transform: forward(y) = z (modelled scale)."""

    def forward(self, y):
        raise NotImplementedError

    def inverse(self, z):
        raise NotImplementedError

    def log_det_jacobian(self, y):
        """log |d forward / dy| elementwise, via autodiff by default."""
        g = jax.grad(lambda v: jnp.sum(self.forward(v)))
        return jnp.log(jnp.abs(g(y)))


@module
class LogTransform(Flow):
    shift: float = static(default=0.0)

    def forward(self, y):
        return jnp.log(y + self.shift)

    def inverse(self, z):
        return jnp.exp(z) - self.shift

    def log_det_jacobian(self, y):
        return -jnp.log(y + self.shift)


@module
class AffineTransform(Flow):
    scale: float = static(default=1.0)
    loc: float = static(default=0.0)

    def forward(self, y):
        return (y - self.loc) / self.scale

    def inverse(self, z):
        return z * self.scale + self.loc

    def log_det_jacobian(self, y):
        return jnp.broadcast_to(-jnp.log(jnp.abs(self.scale)), jnp.shape(y))


@module
class BoxCoxTransform(Flow):
    lam: float = static(default=0.5)

    def forward(self, y):
        return (y**self.lam - 1.0) / self.lam

    def inverse(self, z):
        return (z * self.lam + 1.0) ** (1.0 / self.lam)

    def log_det_jacobian(self, y):
        return (self.lam - 1.0) * jnp.log(y)


@module
class ExpTransform(Flow):
    """Model z = exp(y) (ref `transforms/basic.py:63` Exp)."""

    def forward(self, y):
        return jnp.exp(y)

    def inverse(self, z):
        return jnp.log(z)

    def log_det_jacobian(self, y):
        return y


@module
class SoftplusTransform(Flow):
    """Model z = log(1 + e^y) (ref `transforms/basic.py:96` Softplus; its
    Softminus is `ReverseFlow(SoftplusTransform())`)."""

    def forward(self, y):
        return jax.nn.softplus(y)

    def inverse(self, z):
        # log(expm1(z)), stable for large z: z + log1p(-exp(-z))
        return z + jnp.log(-jnp.expm1(-z))

    def log_det_jacobian(self, y):
        return jax.nn.log_sigmoid(y)


@module
class SquareTransform(Flow):
    """Model z = y^2 on positive data (ref `transforms/basic.py:53` Square;
    inverse takes the positive branch, as the reference does)."""

    def forward(self, y):
        return y * y

    def inverse(self, z):
        return jnp.sqrt(z)

    def log_det_jacobian(self, y):
        return jnp.log(2.0 * jnp.abs(y))


@module
class ReverseFlow(Flow):
    """Swap a base flow's forward/inverse (ref `transforms/basic.py:41`);
    the log-Jacobian comes from the generic autodiff fallback."""

    base: object

    def forward(self, y):
        return self.base.inverse(y)

    def inverse(self, z):
        return self.base.forward(z)


@module
class CompositeFlow(Flow):
    """Chain of flows applied left-to-right on forward (ref
    `transforms/basic.py:10` CompositeTransform), with the exact chain-rule
    log-Jacobian (sum of each flow's at its input)."""

    flows: tuple

    def forward(self, y):
        for f in self.flows:
            y = f.forward(y)
        return y

    def inverse(self, z):
        for f in reversed(self.flows):
            z = f.inverse(z)
        return z

    def log_det_jacobian(self, y):
        total = jnp.zeros(jnp.shape(y), jnp.result_type(y))
        for f in self.flows:
            total = total + f.log_det_jacobian(y)
            y = f.forward(y)
        return total


@module
class TransformedData:
    """Warped view of observations + the lml correction.

    Usage: z = td.Z is the NaN-preserving warped target to fit the model on;
    `td.lml_correction()` is added to the model's log marginal likelihood to
    express it in the original data space (ref `data/data.py:224`).
    """

    Y: jnp.ndarray
    flow: object

    @property
    def Z(self) -> jnp.ndarray:
        ok = jnp.isfinite(self.Y)
        return jnp.where(ok, self.flow.forward(jnp.where(ok, self.Y, 1.0)),
                         jnp.nan)

    def lml_correction(self) -> jnp.ndarray:
        ok = jnp.isfinite(self.Y)
        ldj = self.flow.log_det_jacobian(jnp.where(ok, self.Y, 1.0))
        return jnp.sum(jnp.where(ok, ldj, 0.0))

    def to_data_space(self, z_mean, z_var, n_mc: int = 0, key=None):
        """Push warped Gaussian moments back: exact mean for log transform,
        else first-order (delta) approximation."""
        if isinstance(self.flow, LogTransform):
            mean = jnp.exp(z_mean + 0.5 * z_var) - self.flow.shift
            var = (jnp.exp(z_var) - 1.0) * jnp.exp(2 * z_mean + z_var)
            return mean, var
        # delta method
        g_inv = jax.vmap(jax.grad(lambda z: jnp.sum(self.flow.inverse(z))))
        mean = self.flow.inverse(z_mean)
        dz = g_inv(z_mean.reshape(-1, 1)).reshape(z_mean.shape)
        return mean, z_var * dz**2

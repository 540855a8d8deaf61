"""Gaussian likelihood family.

Counterpart of `stgp/likelihood/gaussian.py:35-299`. `Gaussian` is the scalar
iid-noise data likelihood; `BlockDiagonalGaussian` is the CVI pseudo-likelihood
holding per-time-block covariances (the surrogate sites), stored here as plain
batched tensors rather than Cholesky-packed objax TrainVars.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.params import Param, positive_param
from ..utils.struct import field, module, static

__all__ = ["Gaussian", "BlockDiagonalGaussian", "Likelihood"]


class Likelihood:
    """Marker base class."""


@module
class Gaussian(Likelihood):
    """y = f + eps, eps ~ N(0, variance) iid."""

    variance: Param = field(default_factory=lambda: positive_param(1.0))

    def R(self, T: int, p: int = 1) -> jnp.ndarray:
        """Per-step observation covariance blocks [T, p, p]."""
        eye = jnp.eye(p, dtype=self.variance.raw.dtype)
        return jnp.broadcast_to(self.variance.value * eye, (T, p, p))

    # --- moment interface (used by ELLs / predictions) ---
    def log_prob(self, y, f):
        v = self.variance.value
        return -0.5 * (jnp.log(2 * jnp.pi * v) + (y - f) ** 2 / v)

    def conditional_mean(self, f):
        return f

    def conditional_variance(self, f):
        return jnp.broadcast_to(self.variance.value, jnp.shape(f))


@module
class SharedVariance:
    """One scalar variance Param expanded across `n` heads — a TIED noise
    group for `IndependentGaussian` (`[positive_param(v)] * n` does NOT tie:
    pytree flattening makes each list slot an independent trainable leaf,
    so training silently de-ties them)."""

    p: object  # scalar Param
    n: int = static(default=1)

    @property
    def value(self) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.atleast_1d(self.p.value), (self.n,))

    def fix(self) -> "SharedVariance":
        return SharedVariance(p=self.p.fix(), n=self.n)


@module
class IndependentGaussian(Likelihood):
    """Independent Gaussian noise with a separate variance per output head.

    Used by physics-informed models: head 0 = data noise, further heads =
    collocation noise on derivative/operator pseudo-observations (usually a
    small fixed variance; ref `zoo/sde_diff.py` lik_arr + fixed collocation
    Gaussian). Heads may be fixed (`Param.fix()`) independently.
    """

    variances: list  # per-head scalar Params / SharedVariance groups

    @property
    def _v(self) -> jnp.ndarray:
        # concatenate (not stack): entries may be SharedVariance groups whose
        # value spans several heads off ONE trainable scalar
        return jnp.concatenate(
            [jnp.atleast_1d(p.value) for p in self.variances]
        )

    def R(self, T: int, p: int = 1) -> jnp.ndarray:
        v = self._v
        return jnp.broadcast_to(jnp.diag(v), (T, v.shape[0], v.shape[0]))

    def log_prob(self, y, f):
        v = self._v
        return -0.5 * (jnp.log(2 * jnp.pi * v) + (y - f) ** 2 / v)

    def expected_log_lik(self, y, m, v):
        """Closed-form E_{N(m,v)}[log N(y | f, var_h)] per head column;
        NaN observations contribute 0 (enables CVI over multi-head ST
        models with per-head noise — the AC-style training configuration)."""
        nv = self._v  # [p], broadcasts over [T, p]
        y0 = jnp.nan_to_num(y)
        val = -0.5 * (
            jnp.log(2 * jnp.pi * nv) + ((y0 - m) ** 2 + v) / nv
        )
        return jnp.where(jnp.isfinite(y), val, 0.0)

    def conditional_mean(self, f):
        return f

    def conditional_variance(self, f):
        return jnp.broadcast_to(self._v, jnp.shape(f))


@module
class BlockDiagonalGaussian(Likelihood):
    """N(Y_t | f_t, V_t) with V_t a full [p, p] block per time step.

    CVI pseudo-likelihood (ref: `likelihood/gaussian.py:139`). V is stored as
    raw symmetric blocks (the natural-gradient update writes PSD blocks
    directly, no Cholesky re-parameterisation needed inside the jitted step).
    """

    V: jnp.ndarray  # [T, p, p]

    def R(self, T: int, p: int = 1) -> jnp.ndarray:
        return self.V

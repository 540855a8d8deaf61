"""Heteroscedastic Gaussian likelihood: two latent functions (mean, log-noise).

Counterpart of `stgp/likelihood/het_gaussian.py:9` (HetGaussian): y ~ N(f1,
exp(f2)^2-style positive link on the second latent). Used with a 2-output
prior (two heads / two latent GPs); the variational expectation is closed
form under the log link:

    E_{q(f1) q(f2)}[log N(y | f1, e^{2 f2})]
  = -0.5 log 2pi - m2' - 0.5 ((y - m1)^2 + v1) E[e^{-2 f2}]
  with E[e^{-2 f2}] = exp(-2 m2 + 2 v2)   (log-normal moment).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..utils.struct import module, static
from .gaussian import Likelihood

__all__ = ["HetGaussian"]

_LOG2PI = math.log(2.0 * math.pi)


@module
class HetGaussian(Likelihood):
    """Heads: column 0 = mean latent f1, column 1 = log-std latent f2."""

    def log_prob(self, y, f):
        # f: [..., 2]
        f1, f2 = f[..., 0], f[..., 1]
        var = jnp.exp(2.0 * f2)
        return -0.5 * (_LOG2PI + 2.0 * f2 + (y - f1) ** 2 / var)

    def expected_log_lik_blocks(self, y, m, S, key=None):  # key unused (deterministic)
        """y [T] targets; m [T, 2], S [T, 2, 2] joint head moments.

        Mean-field in (f1, f2) is exact here only if S is diagonal; the
        cross term enters only through E[f2 (y-f1)^2] — we use the exact
        joint-Gaussian expectation.
        """
        m1, m2 = m[..., 0], m[..., 1]
        v1 = S[..., 0, 0]
        v2 = S[..., 1, 1]
        c12 = S[..., 0, 1]
        y0 = jnp.nan_to_num(y)
        # exact joint expectation (Gaussian shift identity
        # E[e^{su} g(u)] = e^{s^2 v/2} E[g(u + s v)], s = -2):
        # E[e^{-2 f2} (y - f1)^2] = e^{-2 m2 + 2 v2} ((y - m1 + 2 c12)^2 + v1)
        Einv = jnp.exp(-2.0 * m2 + 2.0 * v2)
        resid = (y0 - m1 + 2.0 * c12) ** 2 + v1
        val = -0.5 * (_LOG2PI + 2.0 * m2) - 0.5 * resid * Einv
        ok = jnp.isfinite(y)
        return jnp.where(ok, val, 0.0)

    def expected_log_lik(self, y, m, v):
        """Mean-field (diagonal) fallback: m, v are [..., 2] head moments."""
        m1, m2 = m[..., 0], m[..., 1]
        v1, v2 = v[..., 0], v[..., 1]
        y0 = jnp.nan_to_num(y)
        Einv = jnp.exp(-2.0 * m2 + 2.0 * v2)
        val = -0.5 * (_LOG2PI + 2.0 * m2) - 0.5 * ((y0 - m1) ** 2 + v1) * Einv
        ok = jnp.isfinite(y)
        return jnp.where(ok, val, 0.0)

    def conditional_mean(self, f):
        return f[..., 0]

    def conditional_variance(self, f):
        return jnp.exp(2.0 * f[..., 1])

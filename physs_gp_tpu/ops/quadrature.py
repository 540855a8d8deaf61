"""Gauss-Hermite quadrature and Monte-Carlo expectation approximators.

Counterpart of `stgp/computation/integrals/approximators.py:16-196` (MC and
Gauss-Hermite approximators for E_{N(m,v)}[log p(y|f)]). Nodes/weights are
trace-time constants (numpy), so the quadrature sum compiles to one fused
batched evaluation — no loops.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gauss_hermite_points", "expect_gh", "expect_gh_log", "expect_mc"]


@lru_cache(maxsize=None)
def gauss_hermite_points(n: int):
    """Nodes/weights for E_{N(0,1)}[g(x)] ≈ sum_i w_i g(x_i)."""
    x, w = np.polynomial.hermite.hermgauss(n)
    return x * np.sqrt(2.0), w / np.sqrt(np.pi)


def expect_gh(g, m: jnp.ndarray, v: jnp.ndarray, n: int = 20) -> jnp.ndarray:
    """E_{f ~ N(m, v)}[g(f)] elementwise over matching-shape (m, v).

    g must be vectorised (applied to arrays of shape [..., n]).
    """
    x, w = gauss_hermite_points(n)
    x = jnp.asarray(x, m.dtype)
    w = jnp.asarray(w, m.dtype)
    f = m[..., None] + jnp.sqrt(jnp.maximum(v, 0.0))[..., None] * x
    return jnp.sum(g(f) * w, axis=-1)


def expect_gh_log(log_g, m: jnp.ndarray, v: jnp.ndarray,
                  n: int = 20) -> jnp.ndarray:
    """log E_{f ~ N(m, v)}[exp(log_g(f))] via logsumexp — fp32-safe.

    Predictive densities ∫ p(y|f) q(f) df underflow fp32 (exp(-90) = 0)
    long before the LOG density loses meaning; quadrature in the log domain
    keeps NLPD finite on TPU (the reference runs fp64 and never hits this,
    `metrics/nlpd.py:44`).
    """
    x, w = gauss_hermite_points(n)
    x = jnp.asarray(x, m.dtype)
    logw = jnp.asarray(np.log(w), m.dtype)
    f = m[..., None] + jnp.sqrt(jnp.maximum(v, 0.0))[..., None] * x
    return jax.scipy.special.logsumexp(log_g(f) + logw, axis=-1)


def expect_mc(g, m, v, key, n: int = 64) -> jnp.ndarray:
    """Monte-Carlo fallback for expectations without useful quadrature."""
    eps = jax.random.normal(key, m.shape + (n,), m.dtype)
    f = m[..., None] + jnp.sqrt(jnp.maximum(v, 0.0))[..., None] * eps
    return jnp.mean(g(f), axis=-1)

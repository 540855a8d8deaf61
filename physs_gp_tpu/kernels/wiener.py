"""Wiener-family (non-stationary) Markov kernels.

Counterpart of `stgp/kernels/wiener.py:17-120` (`Wiener`, `WienerVelocity`,
`IntegratedWiener`). Non-stationary: there is no P_inf, so `to_ss().Pinf`
holds the INITIAL state covariance P0 (a parameter) and the discretised
noise comes from the exact closed-form integrals, never from the stationary
identity.

    Wiener          x' = w,           A = 1,            Q = q dt
    WienerVelocity  (f, f'): f'' = w, A = [[1,dt],[0,1]],
                    Q = q [[dt^3/3, dt^2/2], [dt^2/2, dt]]
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..utils.params import Param, positive_param
from ..utils.struct import field, module, static
from .base import Kernel
from .markov import MarkovKernel, StateSpace

__all__ = ["Wiener", "WienerVelocity", "IntegratedWiener"]


@module
class Wiener(MarkovKernel):
    """k(t, t') = variance * min(t, t') (+ initial variance P0)."""

    variance: Param = field(default_factory=lambda: positive_param(1.0))
    P0: Param = field(default_factory=lambda: positive_param(1e-6))

    def k_scalar(self, x1, x2):
        t1 = jnp.sum(jnp.atleast_1d(x1))
        t2 = jnp.sum(jnp.atleast_1d(x2))
        return self.variance.value * jnp.minimum(t1, t2) + self.P0.value

    def to_ss(self) -> StateSpace:
        q = self.variance.value
        dtype = q.dtype
        return StateSpace(
            F=jnp.zeros((1, 1), dtype),
            L=jnp.ones((1, 1), dtype),
            Qc=q.reshape(1, 1),
            H=jnp.ones((1, 1), dtype),
            Pinf=self.P0.value.reshape(1, 1),
            minf=jnp.zeros(1, dtype),
        )

    def transition(self, dt):
        dt = jnp.asarray(dt)
        return jnp.ones(dt.shape + (1, 1), dt.dtype)

    def noise_cov(self, dt):
        dt = jnp.asarray(dt)
        return (self.variance.value * dt)[..., None, None]


@module
class WienerVelocity(MarkovKernel):
    """Integrated Wiener (constant-velocity) process; state (f, f')."""

    variance: Param = field(default_factory=lambda: positive_param(1.0))
    P0: Param = field(default_factory=lambda: positive_param(1e-6))

    def k_scalar(self, x1, x2):
        t1 = jnp.sum(jnp.atleast_1d(x1))
        t2 = jnp.sum(jnp.atleast_1d(x2))
        tmin = jnp.minimum(t1, t2)
        return (
            self.variance.value
            * (tmin**3 / 3.0 + jnp.abs(t1 - t2) * tmin**2 / 2.0)
            + self.P0.value
        )

    def to_ss(self) -> StateSpace:
        q = self.variance.value
        dtype = q.dtype
        F = jnp.array([[0.0, 1.0], [0.0, 0.0]], dtype)
        L = jnp.array([[0.0], [1.0]], dtype)
        return StateSpace(
            F=F,
            L=L,
            Qc=q.reshape(1, 1),
            H=jnp.array([[1.0, 0.0]], dtype),
            Pinf=self.P0.value * jnp.eye(2, dtype=dtype),
            minf=jnp.zeros(2, dtype),
        )

    def transition(self, dt):
        dt = jnp.asarray(dt)
        eye = jnp.eye(2, dtype=dt.dtype)
        out = jnp.broadcast_to(eye, dt.shape + (2, 2))
        return out.at[..., 0, 1].set(dt)

    def noise_cov(self, dt):
        dt = jnp.asarray(dt)
        q = self.variance.value
        Q = jnp.stack(
            [
                jnp.stack([dt**3 / 3.0, dt**2 / 2.0], -1),
                jnp.stack([dt**2 / 2.0, dt], -1),
            ],
            -2,
        )
        return q * Q


@module
class IntegratedWiener(MarkovKernel):
    """q-times integrated Wiener process; state (f, f', ..., f^(q)).

    Counterpart of the reference's `IntegratedWiener` (`kernels/wiener.py:
    38-120`), which hard-codes gpml coefficient tables for q=2,3. Here the
    exact discretisation is generated for ANY order from the closed forms of
    the LTI SDE x^(q+1) = w(t):

        A(dt)[i, j] = dt^(j-i) / (j-i)!                       (j >= i)
        Q(dt)[i, j] = q_c dt^(2q+1-i-j) / ((2q+1-i-j)(q-i)!(q-j)!)

    and the prior covariance of the observed head from the Green's-function
    integral k(s,t) = q_c ∫_0^min(s,t) (s-u)^q (t-u)^q du / (q!)^2, expanded
    termwise (exact polynomial, no quadrature). q=0 is `Wiener`, q=1 is
    `WienerVelocity`.
    """

    variance: Param = field(default_factory=lambda: positive_param(1.0))
    P0: Param = field(default_factory=lambda: positive_param(1e-6))
    q: int = static(default=2)

    def k_scalar(self, x1, x2):
        t1 = jnp.sum(jnp.atleast_1d(x1))
        t2 = jnp.sum(jnp.atleast_1d(x2))
        m = jnp.minimum(t1, t2)
        q = self.q
        acc = 0.0
        # ∫_0^m (t1-u)^q (t2-u)^q du =
        #   Σ_{i,j} C(q,i) C(q,j) (-1)^{i+j} t1^{q-i} t2^{q-j} m^{i+j+1}/(i+j+1)
        for i in range(q + 1):
            for j in range(q + 1):
                c = (
                    math.comb(q, i) * math.comb(q, j) * (-1.0) ** (i + j)
                    / (i + j + 1)
                )
                acc = acc + c * t1 ** (q - i) * t2 ** (q - j) * m ** (i + j + 1)
        return (
            self.variance.value * acc / (math.factorial(q) ** 2)
            + self.P0.value
        )

    def to_ss(self) -> StateSpace:
        qc = self.variance.value
        dtype = qc.dtype
        d = self.q + 1
        F = jnp.eye(d, k=1, dtype=dtype)
        L = jnp.zeros((d, 1), dtype).at[-1, 0].set(1.0)
        H = jnp.zeros((1, d), dtype).at[0, 0].set(1.0)
        return StateSpace(
            F=F,
            L=L,
            Qc=qc.reshape(1, 1),
            H=H,
            Pinf=self.P0.value * jnp.eye(d, dtype=dtype),
            minf=jnp.zeros(d, dtype),
        )

    def transition(self, dt):
        dt = jnp.asarray(dt)
        d = self.q + 1
        rows = []
        for i in range(d):
            cols = []
            for j in range(d):
                if j < i:
                    cols.append(jnp.zeros_like(dt))
                else:
                    cols.append(dt ** (j - i) / math.factorial(j - i))
            rows.append(jnp.stack(cols, -1))
        return jnp.stack(rows, -2)

    def noise_cov(self, dt):
        dt = jnp.asarray(dt)
        q = self.q
        d = q + 1
        rows = []
        for i in range(d):
            cols = []
            for j in range(d):
                e = 2 * q + 1 - i - j
                cols.append(
                    dt ** e
                    / (e * math.factorial(q - i) * math.factorial(q - j))
                )
            rows.append(jnp.stack(cols, -1))
        return self.variance.value * jnp.stack(rows, -2)

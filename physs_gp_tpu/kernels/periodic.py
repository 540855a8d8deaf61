"""Periodic kernel + truncated-harmonic state-space approximation.

TPU-native counterpart of `stgp/kernels/periodic.py:156-255` (`Periodic`,
`ApproxSDEPeriodic`) and `computation/custom/custom_bessel_ive.py`: the
canonical periodic kernel

    k(tau) = sigma^2 exp(-2 sin^2(w0 tau / 2) / l^2)

expands as a cosine series sum_j q_j^2 cos(j w0 tau) (Solin & Sarkka 2014)
whose state space is J+1 independent 2-D rotation blocks — a NOISELESS
(energy-preserving) system: A_j(dt) is a rotation, Q = 0 exactly.

The series weights need modified Bessel functions I_j(1/l^2); jax ships only
i0/i1, so I_j is evaluated by the integral representation
I_j(x) = (1/pi) ∫_0^pi e^{x cos t} cos(j t) dt with fixed trapezoid nodes —
stable, differentiable, fuses to one small matmul (the reference hand-rolls
a custom ive instead).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops.matrix import block_diag
from ..utils.params import Param, positive_param
from ..utils.struct import field, module, static
from .base import Kernel
from .markov import MarkovKernel, StateSpace

__all__ = ["Periodic"]


def _bessel_i(orders, x, n_nodes: int = 64):
    """I_j(x) for j in orders, via trapezoid quadrature (x scalar)."""
    theta = jnp.linspace(0.0, math.pi, n_nodes)
    w = jnp.full((n_nodes,), math.pi / (n_nodes - 1)).at[0].mul(0.5).at[-1].mul(0.5)
    integrand = jnp.exp(x * jnp.cos(theta))  # [n]
    cosjt = jnp.cos(jnp.asarray(orders)[:, None] * theta[None, :])  # [J, n]
    return (cosjt * integrand * w).sum(-1) / math.pi


@module
class Periodic(MarkovKernel):
    """Exact periodic kernel; Markov interface = J-harmonic approximation."""

    lengthscales: Param = field(default_factory=lambda: positive_param(1.0))
    variance: Param = field(default_factory=lambda: positive_param(1.0))
    period: Param = field(default_factory=lambda: positive_param(1.0))
    n_harmonics: int = static(default=6)

    # ---- batch (exact) ----
    def k_scalar(self, x1, x2):
        tau = jnp.sum(jnp.atleast_1d(x1) - jnp.atleast_1d(x2))
        s = jnp.sin(math.pi * tau / self.period.value) / self.lengthscales.value
        return self.variance.value * jnp.exp(-2.0 * s * s)

    # ---- state space (harmonic approximation) ----
    @property
    def is_noiseless(self) -> bool:
        return True

    def _weights(self):
        """q_j^2 for j = 0..J (cosine-series expansion coefficients)."""
        linv2 = 1.0 / self.lengthscales.value**2
        J = self.n_harmonics
        # exp(-1/l^2) * I_j(1/l^2) computed together for stability
        Ij = _bessel_i(np.arange(J + 1), linv2)
        q2 = 2.0 * self.variance.value * jnp.exp(-linv2) * Ij
        return q2.at[0].mul(0.5)

    def to_ss(self) -> StateSpace:
        J = self.n_harmonics
        w0 = 2.0 * math.pi / self.period.value
        q2 = self._weights()
        dtype = q2.dtype
        blocks_F = []
        for j in range(J + 1):
            wj = j * w0
            blocks_F.append(jnp.array([[0.0, -1.0], [1.0, 0.0]], dtype) * wj)
        F = block_diag(*blocks_F)
        d = 2 * (J + 1)
        Pinf = jnp.kron(jnp.diag(q2), jnp.eye(2, dtype=dtype))
        H = jnp.tile(jnp.array([[1.0, 0.0]], dtype), (1, J + 1))
        L = jnp.eye(d, dtype=dtype)
        Qc = jnp.zeros((d, d), dtype)
        return StateSpace(F=F, L=L, Qc=Qc, H=H, Pinf=Pinf, minf=jnp.zeros(d, dtype))

    def transition(self, dt: jnp.ndarray) -> jnp.ndarray:
        """Exact rotations: A_j(dt) = [[cos, -sin], [sin, cos]](j w0 dt)."""
        J = self.n_harmonics
        w0 = 2.0 * math.pi / self.period.value
        dt = jnp.asarray(dt)
        dtype = jnp.result_type(dt, w0)
        ang = dt[..., None] * (jnp.arange(J + 1, dtype=dtype) * w0)  # [..., J+1]
        c, s = jnp.cos(ang), jnp.sin(ang)
        rot = jnp.stack(
            [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2
        )  # [..., J+1, 2, 2]
        d = 2 * (J + 1)
        out = jnp.zeros(dt.shape + (d, d), dtype)
        for j in range(J + 1):
            out = out.at[..., 2 * j : 2 * j + 2, 2 * j : 2 * j + 2].set(
                rot[..., j, :, :]
            )
        return out

    def noise_cov(self, dt: jnp.ndarray) -> jnp.ndarray:
        """Exactly zero — rotations preserve the stationary covariance."""
        d = 2 * (self.n_harmonics + 1)
        dt = jnp.asarray(dt)
        dtype = jnp.result_type(dt, self.variance.value)
        return jnp.zeros(dt.shape + (d, d), dtype)

"""Physics as linear observation operators over the Markov state.

TPU-native reformulation of the reference's physics stack. The reference
builds a joint prior over (f, ∂f, ∂²f, ...) with autodiff derivative kernels
(`transforms/pdes.py:16` DifferentialOperatorJoint, `kernels/diff_op.py`) and
then observes PDE residuals as pseudo-observations through the filter
(`computation/filters/kalman_filter.py:341-427`) or the ELL.

Key structural fact this module exploits: a Matérn(p+1/2) Markov state *is*
(f, f', ..., f^(p)) — time derivatives are already state coordinates, and any
LINEAR differential operator in time is therefore a constant row vector over
the state. Physics constraints (damped oscillators, heat/advection-diffusion
time terms, monotonicity heads) become extra rows of the observation matrix H
with their own noise — no EKF, no derivative-kernel algebra, and both the
sequential and PARALLEL scans stay exact.

(Nonlinear residuals — Allen-Cahn's f³, pendulum's sin f — enter through the
CVI expected-log-likelihood instead; see `likelihoods/composite.py`.)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..kernels.base import SumKernel
from ..kernels.matern import Matern
from ..utils.params import Param
from ..utils.struct import field, module, static

__all__ = [
    "derivative_row",
    "ValueHead",
    "DerivativeHead",
    "LinearOperatorHead",
    "StateObservation",
]


def derivative_row(kernel, order: int) -> jnp.ndarray:
    """Row vector w s.t. f^(order)(t) = w @ state(t). Composes over sums."""
    if isinstance(kernel, SumKernel):
        return jnp.concatenate([derivative_row(k, order) for k in kernel.parts])
    if isinstance(kernel, Matern):
        d = kernel.p + 1
        if order >= d:
            raise ValueError(
                f"Matérn(p={kernel.p}) state holds derivatives up to order "
                f"{kernel.p}; requested {order}. Use a smoother kernel."
            )
        # balanced state (kernels/matern.py): f^(k) = lam^k * x̃_k
        lam = kernel._lam
        dtype = kernel.lengthscales.raw.dtype
        return jnp.zeros((d,), dtype).at[order].set(
            jnp.asarray(lam, dtype) ** order
        )
    # generic Markov kernel: assume canonical (f, f', ...) state up to dim
    ss = kernel.to_ss()
    d = ss.state_dim
    if order >= d:
        raise ValueError(f"state dim {d} has no order-{order} derivative")
    return jnp.zeros((d,), ss.F.dtype).at[order].set(1.0)


class Head:
    """Marker base for observation heads."""


@module
class ValueHead(Head):
    """Observe f itself."""

    def row(self, kernel) -> jnp.ndarray:
        return derivative_row(kernel, 0)


@module
class DerivativeHead(Head):
    """Observe f^(order) — e.g. monotonicity heads observe f' (ref:
    monotonic_timeseries experiment, `zoo/sde_diff.py` time_diff)."""

    order: int = static(default=1)

    def row(self, kernel) -> jnp.ndarray:
        return derivative_row(kernel, self.order)


@module
class LinearOperatorHead(Head):
    """Observe L[f] = sum_k c_k f^(k) — a linear ODE residual.

    E.g. damped oscillator: L[f] = f'' + c f' + k f observed as 0 at
    collocation points (ref: `transforms/pdes.py` DampedPendulum linear case,
    experiments/pendulum). Coefficients may be trainable Params (unknown
    physics parameters are learned jointly).
    """

    coeffs: list = field(default_factory=list)  # entry k: coeff of f^(k)

    def row(self, kernel) -> jnp.ndarray:
        rows = []
        for k, c in enumerate(self.coeffs):
            cv = c.value if isinstance(c, Param) else c
            rows.append(cv * derivative_row(kernel, k))
        return sum(rows)


@module
class StateObservation:
    """Observation matrix builder: one row per head, H [n_heads, d_state].

    Plugs into StateSpaceGP/CVIGP via their `observation` field, replacing the
    kernel's default H = "observe f"."""

    heads: list = field(default_factory=list)

    def H(self, kernel) -> jnp.ndarray:
        return jnp.stack([h.row(kernel) for h in self.heads])

    @property
    def n_heads(self) -> int:
        return len(self.heads)

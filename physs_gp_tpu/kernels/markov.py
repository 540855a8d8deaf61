"""Markov (state-space) kernel interface.

A Markov kernel k(t, t') on the line is equivalently an LTI SDE
    dx = F x dt + L dW,   f(t) = H x(t),   x(inf) ~ N(0, P_inf)
and discretises exactly over a gap dt as
    x_{k+1} = A(dt) x_k + q_k,   q_k ~ N(0, Q(dt)),
    A(dt) = expm(F dt),          Q(dt) = P_inf - A P_inf A^T   (stationary).

TPU-native counterpart of the reference's `kernels/kernel.py:200-265`
(`MarkovKernel`, `to_ss`, `expm`), `kernels/ss_utils.py:7-42`. Differences:
- `StateSpace` is an explicit pytree carried through the filter, not methods
  scattered over kernel objects.
- `transition(dt)` is *batched over dt* by construction ([T] -> [T, d, d]),
  so building all per-step transition matrices for the parallel scan is a
  handful of fused einsums, not a vmap over a Pade `expm`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.matrix import block_diag, kron, lyapunov_solve, symmetrize
from ..utils.struct import module, static
from .base import Kernel, ProductKernel, SumKernel

__all__ = ["StateSpace", "MarkovKernel", "StackedMarkov", "to_ss", "transition_matrix", "stationary_noise"]


@module
class StateSpace:
    """LTI-SDE representation of a Markov prior."""

    F: jnp.ndarray  # [d, d] drift
    L: jnp.ndarray  # [d, w] noise input
    Qc: jnp.ndarray  # [w, w] white-noise spectral density
    H: jnp.ndarray  # [o, d] observation/emission
    Pinf: jnp.ndarray  # [d, d] stationary covariance
    minf: jnp.ndarray  # [d] stationary mean

    @property
    def state_dim(self) -> int:
        return self.F.shape[-1]


class MarkovKernel(Kernel):
    """Mixin: kernels with an exact state-space representation."""

    def to_ss(self) -> StateSpace:
        raise NotImplementedError

    @property
    def state_dim(self) -> int:
        return self.to_ss().state_dim

    def transition(self, dt: jnp.ndarray) -> jnp.ndarray:
        """A(dt) = expm(F dt), batched: dt [...] -> [..., d, d].

        Generic fallback via Pade expm; closed-form subclasses override.
        """
        F = self.to_ss().F
        dt = jnp.asarray(dt)
        flat = dt.reshape(-1)
        A = jax.vmap(lambda s: jax.scipy.linalg.expm(F * s))(flat)
        return A.reshape(dt.shape + F.shape)

    def stationary_noise(self, A: jnp.ndarray) -> jnp.ndarray:
        """Q(dt) = Pinf - A Pinf A^T given A = A(dt) [..., d, d]."""
        return stationary_noise(A, self.to_ss().Pinf)


def stationary_noise(A: jnp.ndarray, Pinf: jnp.ndarray) -> jnp.ndarray:
    APA = jnp.einsum("...ij,...jk,...lk->...il", A, Pinf, A)
    return symmetrize(Pinf - APA)


def _batched_block_diag(blocks: list) -> jnp.ndarray:
    """Block-diag of [..., di, di] blocks along the last two axes."""
    n = sum(b.shape[-1] for b in blocks)
    batch = jnp.broadcast_shapes(*[b.shape[:-2] for b in blocks])
    out = jnp.zeros(batch + (n, n), blocks[0].dtype)
    i = 0
    for b in blocks:
        k = b.shape[-1]
        out = out.at[..., i : i + k, i : i + k].set(b)
        i += k
    return out


def transition_matrix(kernel, dt: jnp.ndarray) -> jnp.ndarray:
    """Batched A(dt) for any kernel supporting the Markov interface,
    including Sum/Product combinators of Markov kernels."""
    if isinstance(kernel, SumKernel):
        As = [transition_matrix(k, dt) for k in kernel.parts]
        return _batched_block_diag(As)
    if isinstance(kernel, ProductKernel):
        As = [transition_matrix(k, dt) for k in kernel.parts]
        out = As[0]
        for A in As[1:]:
            out = kron(out, A)
        return out
    return kernel.transition(dt)


def noise_matrix(kernel, dt: jnp.ndarray) -> jnp.ndarray:
    """Batched discretised process noise Q(dt) [..., d, d].

    Prefers a kernel's cancellation-free `noise_cov` closed form (e.g. the
    Matérn gammainc integral) — essential in fp32 on TPU for small dt — and
    falls back to the stationary identity Q = Pinf - A Pinf A^T otherwise.
    Sum kernels compose exactly block-diagonally.
    """
    if isinstance(kernel, SumKernel):
        return _batched_block_diag([noise_matrix(k, dt) for k in kernel.parts])
    if isinstance(kernel, ProductKernel):
        # exact cancellation-free composition when all but one factor is
        # noiseless (energy-preserving, e.g. the quasi-periodic kernel
        # Periodic x Matérn): rotations satisfy A P A^T = P, so
        # Q_prod = kron(..., Pinf_noiseless, ..., Q_noisy, ...).
        noisy = [k for k in kernel.parts if not getattr(k, "is_noiseless", False)]
        if len(noisy) == 0:
            ss = to_ss(kernel)
            dt = jnp.asarray(dt)
            d = ss.state_dim
            return jnp.zeros(dt.shape + (d, d), ss.Pinf.dtype)
        if len(noisy) == 1:
            out = None
            for k in kernel.parts:
                blk = (
                    to_ss(k).Pinf
                    if getattr(k, "is_noiseless", False)
                    else noise_matrix(k, dt)
                )
                out = blk if out is None else kron(out, blk)
            return out
        ss = to_ss(kernel)
        return stationary_noise(transition_matrix(kernel, dt), ss.Pinf)
    if hasattr(kernel, "noise_cov"):
        return kernel.noise_cov(dt)
    ss = to_ss(kernel)
    return stationary_noise(transition_matrix(kernel, dt), ss.Pinf)


def to_ss(kernel) -> StateSpace:
    """StateSpace of a kernel, composing Sum (block-diag) / Product (Kronecker)
    the same way the reference's combinators do (`kernels/kernel.py:134-199`)."""
    if isinstance(kernel, SumKernel):
        parts = [to_ss(k) for k in kernel.parts]
        return StateSpace(
            F=block_diag(*[p.F for p in parts]),
            L=block_diag(*[p.L for p in parts]),
            Qc=block_diag(*[p.Qc for p in parts]),
            H=jnp.concatenate([p.H for p in parts], axis=-1),
            Pinf=block_diag(*[p.Pinf for p in parts]),
            minf=jnp.concatenate([p.minf for p in parts], axis=-1),
        )
    if isinstance(kernel, ProductKernel):
        parts = [to_ss(k) for k in kernel.parts]
        out = parts[0]
        for p in parts[1:]:
            # Kronecker-composed process: covariance is the Kronecker product,
            # which is exact for the stationary distribution & transitions.
            out = StateSpace(
                F=kron(out.F, jnp.eye(p.F.shape[-1], dtype=p.F.dtype))
                + kron(jnp.eye(out.F.shape[-1], dtype=out.F.dtype), p.F),
                L=kron(out.L, p.L),
                Qc=kron(out.Qc, p.Qc),
                H=kron(out.H, p.H),
                Pinf=kron(out.Pinf, p.Pinf),
                minf=jnp.kron(out.minf, p.minf),
            )
        return out
    return kernel.to_ss()


def solve_pinf(F: jnp.ndarray, L: jnp.ndarray, Qc: jnp.ndarray) -> jnp.ndarray:
    """Stationary covariance from the Lyapunov equation."""
    Qfull = L @ Qc @ L.T
    return lyapunov_solve(F, Qfull)


@module
class StackedMarkov(MarkovKernel):
    """Q INDEPENDENT latent Markov GPs observed as Q separate heads.

    Counterpart of the reference's `Independent` prior transform over latent
    GPs (`transforms/transform.py` Independent, used by e.g. the covariance
    regression priors `transforms/covariance.py:21`): states compose
    block-diagonally like SumKernel, but H is BLOCK-DIAGONAL (one row per
    latent) instead of the sum of rows — the filters see a [Q, D] observation
    matrix and models get Q output heads.
    """

    parts: list

    def to_ss(self) -> StateSpace:
        ps = [to_ss(k) for k in self.parts]
        return StateSpace(
            F=block_diag(*[p.F for p in ps]),
            L=block_diag(*[p.L for p in ps]),
            Qc=block_diag(*[p.Qc for p in ps]),
            H=block_diag(*[p.H for p in ps]),
            Pinf=block_diag(*[p.Pinf for p in ps]),
            minf=jnp.concatenate([p.minf for p in ps], axis=-1),
        )

    def transition(self, dt: jnp.ndarray) -> jnp.ndarray:
        return _batched_block_diag(
            [transition_matrix(k, dt) for k in self.parts]
        )

    def noise_cov(self, dt: jnp.ndarray) -> jnp.ndarray:
        return _batched_block_diag([noise_matrix(k, dt) for k in self.parts])

    def to_lgssm(self, t: jnp.ndarray):
        """Block-diagonal composition of the parts' discretised systems.

        Needed when parts own their lifting (`SpatioTemporalKernel.to_lgssm`'s
        Kronecker lift): multi-latent spatio-temporal priors — the
        reference's Independent-over-latents construction used by its
        Helmholtz recipes (`zoo/phi_ml.py:146,267`) — stack this way. For
        plain Markov parts this is identical to the `to_ss` path.
        """
        from ..ops.lgssm import LGSSM, build_lgssm

        parts = [build_lgssm(k, t) for k in self.parts]
        return LGSSM(
            A=_batched_block_diag([p.A for p in parts]),
            Q=_batched_block_diag([p.Q for p in parts]),
            H=block_diag(*[p.H for p in parts]),
            m0=jnp.concatenate([p.m0 for p in parts], axis=-1),
            P0=block_diag(*[p.P0 for p in parts]),
        )

    @property
    def state_dim(self) -> int:
        return sum(k.state_dim for k in self.parts)

    @property
    def n_outputs(self) -> int:
        return len(self.parts)

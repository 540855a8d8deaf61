"""Linear-Gaussian state-space model assembly from Markov kernels.

Bridges the kernel layer (closed-form `transition`/`StateSpace`) and the
filter layer (batched [T, d, d] tensors). Counterpart of the per-step
`A = prior.expm(dt); Q = Pinf - A Pinf A^T` computed *inside* the scan body in
the reference (`kalman_filter.py:215`, `kernels/kernel.py:207`) — here all T
transitions are materialised in one fused batched pass before the scan, which
is the TPU-friendly schedule for both the sequential and parallel filters.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = [
    "LGSSM",
    "build_lgssm",
    "project_mean",
    "project_var",
    "project_cov",
    "project_cov_factor",
]


class LGSSM(NamedTuple):
    A: jnp.ndarray  # [T, d, d]
    Q: jnp.ndarray  # [T, d, d]
    H: jnp.ndarray  # [p, d]
    m0: jnp.ndarray  # [d]
    P0: jnp.ndarray  # [d, d]


def build_lgssm(kernel, t: jnp.ndarray) -> LGSSM:
    """Discretise a Markov kernel over time points t [T] (sorted).

    dt_0 = 0, so A[0] = I, Q[0] = 0 and the filter's first prediction is the
    stationary prior — matching the reference's steady-state init
    (`kalman_filter.py:440`). Runs under full fp32 matmul precision (see
    `ops.matrix.highest_precision`).
    """
    # local imports: kernels depends on ops.matrix, avoid a package cycle
    from ..kernels.markov import noise_matrix, to_ss, transition_matrix
    from .matrix import highest_precision

    if hasattr(kernel, "to_lgssm"):
        # composite kernels (e.g. SpatioTemporalKernel) own their lifting
        return highest_precision(kernel.to_lgssm)(t)
    return highest_precision(_build_lgssm_impl)(
        kernel, t, noise_matrix, to_ss, transition_matrix
    )


def _build_lgssm_impl(kernel, t, noise_matrix, to_ss, transition_matrix):
    t = jnp.ravel(t)
    ss = to_ss(kernel)
    dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)])
    A = transition_matrix(kernel, dt)  # [T, d, d]
    Q = noise_matrix(kernel, dt)
    return LGSSM(A=A, Q=Q, H=ss.H, m0=ss.minf, P0=ss.Pinf)


# ---------------------------------------------------------------------------
# State → observation-space projections that accept STATIC [p, d] or
# TIME-VARYING [T, p, d] observation matrices (scattered / moving-sensor
# data produces the latter; ref `data/data.py:727` TemporallyGroupedData).
# ---------------------------------------------------------------------------


def project_mean(H: jnp.ndarray, ms: jnp.ndarray) -> jnp.ndarray:
    """[T, p] head means from smoothed state means ms [T, d]."""
    if H.ndim == 2:
        return ms @ H.T
    return jnp.einsum("tpd,td->tp", H, ms)


def _Ps_Ht(H: jnp.ndarray, Ps: jnp.ndarray) -> jnp.ndarray:
    """Y[t,i,q] = sum_j Ps[t,i,j] H[q,j] as ONE [T*d, d] @ [d, p] matmul.

    The naive einsum compiles to XLA's t-batched tiny-dot path on TPU
    (~0.43 TFLOP/s at d=32 — measured 189 ms for the config-5 projection
    bucket); collapsing the batch into the rows keeps the MXU tiled."""
    T, d, _ = Ps.shape
    return (Ps.reshape(T * d, d) @ H.T).reshape(T, d, H.shape[0])


def project_var(H: jnp.ndarray, Ps: jnp.ndarray) -> jnp.ndarray:
    """[T, p] head variances (diagonal) from state covariances Ps [T, d, d]."""
    if H.ndim == 2:
        Y = _Ps_Ht(H, Ps)  # [T, d, p]
        return jnp.sum(Y * H.T[None], axis=1)
    return jnp.einsum("tpi,tij,tpj->tp", H, Ps, H)


def project_cov_factor(H: jnp.ndarray, Ls: jnp.ndarray) -> jnp.ndarray:
    """[T, p, p] head covariances (H L)(H L)^T from smoothed covariance
    FACTORS Ls [T, d, d].

    PSD by construction: the fp32 rounding error of M M^T is relative to the
    PROJECTED scale, while H P H^T carries absolute error at the state scale
    — once posterior head variances shrink below ~1e-4 (tight collocation
    sites) that error exceeds the matrix itself and no jitter policy can
    rescue the Cholesky (observed on TPU: S indefinite by 6% of its own
    norm). The sqrt filters exist exactly for this regime (CLAUDE.md rule 3).
    """
    if H.ndim == 2:
        T, d, _ = Ls.shape
        p = H.shape[0]
        # M[t] = H @ Ls[t] as one [p, d] @ [d, T*d] matmul (MXU-tiled)
        M = (H @ jnp.moveaxis(Ls, 0, 1).reshape(d, T * d)).reshape(p, T, d)
        M = jnp.moveaxis(M, 0, 1)  # [T, p, d]
    else:
        M = jnp.einsum("tpi,tij->tpj", H, Ls)
    return jnp.einsum("tij,tkj->tik", M, M)


def project_cov(H: jnp.ndarray, Ps: jnp.ndarray) -> jnp.ndarray:
    """[T, p, p] full head covariances from state covariances Ps [T, d, d]."""
    if H.ndim == 2:
        T, d, _ = Ps.shape
        p = H.shape[0]
        Y = _Ps_Ht(H, Ps)  # [T, d, p]
        # out[t,p,q] = sum_i H[p,i] Y[t,i,q]: one [p, d] @ [d, T*p] matmul
        out = (H @ jnp.moveaxis(Y, 0, 1).reshape(d, T * p)).reshape(p, T, p)
        return jnp.moveaxis(out, 0, 1)
    return jnp.einsum("tpi,tij,tqj->tpq", H, Ps, H)

"""Sequential Kalman filtering / RTS smoothing over precomputed step tensors.

TPU-native counterpart of `stgp/computation/filters/kalman_filter.py` (filter:
ref lines 145-548) and `rts_smoother.py:49-226`. Differences from the
reference design:

- The filter consumes *precomputed batched tensors* A [T,d,d], Q [T,d,d]
  (built in one fused einsum from the kernel's closed-form transition) instead
  of calling kernel methods inside the scan body. The scan body is pure
  batched linear algebra with static shapes.
- Missing data: NaNs in y become a {0,1} observation mask; masked rows of H
  and an identity filler on the innovation covariance keep every step
  fixed-shape (see `ops/gaussian.mask_covariance`). This reproduces the
  reference's NaN-masked updates (`kalman_filter.py:145`,
  `computation/gaussian.py:73`) without data-dependent shapes.
- Convention: A[0]/Q[0] should be identity/zero (dt_0 = 0), so step 0's
  "prediction" is the stationary prior (m0, P0) itself.
"""
from __future__ import annotations

import math

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussian import mask_covariance
from .matrix import (
    cholesky_solve,
    highest_precision,
    log_det_from_chol,
    safe_cholesky,
    symmetrize,
)

__all__ = ["FilterResult", "SmootherResult", "kalman_filter", "rts_smoother",
           "filter_smoother", "masked_update", "observation_mask"]

_LOG2PI = math.log(2.0 * math.pi)


class FilterResult(NamedTuple):
    ms: jnp.ndarray  # [T, d]   filtered means
    Ps: jnp.ndarray  # [T, d, d] filtered covariances
    lml: jnp.ndarray  # scalar   log marginal likelihood
    lmls: jnp.ndarray  # [T]     per-step lml contributions
    # one-step-ahead predicted covariance (or sqrt factor, in the sqrt
    # filters) at t|t-1 — a byproduct of the parallel filters' post-hoc lml
    # pass that the parallel smoothers reuse (their P_pred is this shifted
    # by one: P_pred_smoother[t] = Pp[t+1]). None from sequential filters.
    Pp: jnp.ndarray | None = None


class SmootherResult(NamedTuple):
    ms: jnp.ndarray  # [T, d]
    Ps: jnp.ndarray  # [T, d, d]
    Gs: jnp.ndarray  # [T, d, d] smoother gains (G_T = 0); for cross-covs
    # [T, d, d] covariance FACTORS (Ls Ls^T = Ps), set by the sqrt runners:
    # head projections use (H L)(H L)^T, PSD by construction in fp32 where
    # H P H^T is indefinite at the state-error scale (TPU MC-ELL NaNs)
    Ls: jnp.ndarray = None


def observation_mask(y: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """{1,0} mask from NaN pattern; y: [T, p]."""
    return jnp.isfinite(y).astype(dtype or y.dtype)


def masked_update(m_pred, P_pred, H, R, y, mask):
    """One masked Kalman update (Joseph-form covariance).

    m_pred: [d], P_pred: [d, d], H: [p, d], R: [p, p], y: [p] (NaNs allowed
    where mask == 0), mask: [p] in {0., 1.}. Returns (m, P, step_lml).
    """
    dtype = P_pred.dtype
    d = m_pred.shape[-1]
    y0 = jnp.where(mask > 0, jnp.nan_to_num(y), 0.0)
    Hm = mask[..., :, None] * H
    v = y0 - Hm @ m_pred
    HP = Hm @ P_pred
    S = mask_covariance(HP @ Hm.T + R, mask)
    Ls = safe_cholesky(S)
    # K = P H^T S^-1  (columns for missing dims are exactly zero)
    K = cholesky_solve(Ls, HP).T
    m = m_pred + K @ v
    ImKH = jnp.eye(d, dtype=dtype) - K @ Hm
    Rm = mask_covariance(R, mask)
    P = symmetrize(ImKH @ P_pred @ ImKH.T + K @ Rm @ K.T)
    n_obs = jnp.sum(mask)
    alpha = jax.scipy.linalg.solve_triangular(Ls, v[..., None], lower=True)[..., 0]
    lml = -0.5 * (jnp.sum(alpha * alpha) + log_det_from_chol(Ls) + n_obs * _LOG2PI)
    return m, P, lml


@highest_precision
def kalman_filter(A, Q, H, R, y, m0, P0, mask=None) -> FilterResult:
    """Sequential Kalman filter.

    A, Q: [T, d, d]; H: [p, d] or [T, p, d]; R: [T, p, p]; y: [T, p];
    m0: [d]; P0: [d, d]. NaNs in y are treated as missing.
    """
    T = y.shape[0]
    if mask is None:
        mask = observation_mask(y, P0.dtype)
    H_steps = jnp.broadcast_to(H, (T,) + H.shape[-2:]) if H.ndim == 2 else H

    def step(carry, inp):
        m_prev, P_prev = carry
        A_k, Q_k, H_k, R_k, y_k, mask_k = inp
        m_pred = A_k @ m_prev
        P_pred = symmetrize(A_k @ P_prev @ A_k.T + Q_k)
        m, P, lml_k = masked_update(m_pred, P_pred, H_k, R_k, y_k, mask_k)
        return (m, P), (m, P, lml_k)

    (_, _), (ms, Ps, lmls) = jax.lax.scan(
        step, (m0, P0), (A, Q, H_steps, R, y, mask)
    )
    return FilterResult(ms=ms, Ps=Ps, lml=jnp.sum(lmls), lmls=lmls)


@highest_precision
def rts_smoother(A, Q, filtered: FilterResult) -> SmootherResult:
    """Sequential RTS smoother (flip-forward `lax.scan`).

    A, Q: [T, d, d] — A[k] transitions k-1 -> k (A[0] unused).
    """
    ms, Ps = filtered.ms, filtered.Ps
    d = ms.shape[-1]

    def step(carry, inp):
        m_next_s, P_next_s = carry
        m_f, P_f, A_next, Q_next = inp
        m_pred = A_next @ m_f
        P_pred = symmetrize(A_next @ P_f @ A_next.T + Q_next)
        Lp = safe_cholesky(P_pred)
        # G = P_f A^T P_pred^-1
        G = cholesky_solve(Lp, A_next @ P_f).T
        m_s = m_f + G @ (m_next_s - m_pred)
        P_s = symmetrize(P_f + G @ (P_next_s - P_pred) @ G.T)
        return (m_s, P_s), (m_s, P_s, G)

    # flip + forward scan + flip (reverse=True lax.scan is ~27x slower on
    # TPU than the flipped forward equivalent; bit-identical results)
    flipped = jax.tree_util.tree_map(
        lambda x: x[::-1], (ms[:-1], Ps[:-1], A[1:], Q[1:])
    )
    (_, _), (ms_s, Ps_s, Gs) = jax.lax.scan(step, (ms[-1], Ps[-1]), flipped)
    ms_s, Ps_s, Gs = jax.tree_util.tree_map(
        lambda x: x[::-1], (ms_s, Ps_s, Gs)
    )
    ms_out = jnp.concatenate([ms_s, ms[-1:]], axis=0)
    Ps_out = jnp.concatenate([Ps_s, Ps[-1:]], axis=0)
    Gs_out = jnp.concatenate([Gs, jnp.zeros((1, d, d), Gs.dtype)], axis=0)
    return SmootherResult(ms=ms_out, Ps=Ps_out, Gs=Gs_out)


def filter_smoother(A, Q, H, R, y, m0, P0, mask=None):
    f = kalman_filter(A, Q, H, R, y, m0, P0, mask)
    s = rts_smoother(A, Q, f)
    return f, s

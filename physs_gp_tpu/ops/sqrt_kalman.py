"""Square-root Kalman filtering/smoothing (QR-based, fp32-robust).

TPU-native counterpart of the reference's SVD square-root filter
(`computation/filters/square_root_kalman_filter.py:67-210`) — but QR/array
form rather than SVD: covariances are carried as lower-triangular square
roots, every propagation is a `tria` (QR of the transposed pre-array), and no
subtraction of PSD matrices ever happens, so factors stay exactly PSD in
fp32. This is the default robust path on TPU where fp32 covariance-form
recursions with tight observation noise go indefinite (the reference falls
back to fp64 solves instead — not an option on TPU).

Conventions: tria(B [d, m]) = lower-triangular L [d, d] with L L^T = B B^T
(columns zero-padded when m < d). Masked missing data uses the same
fixed-shape (masked H rows + identity filler) algebra as the dense filters.
"""
from __future__ import annotations

import functools
import math

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussian import mask_covariance
from .kalman import FilterResult, SmootherResult, observation_mask
from .matrix import highest_precision, symmetrize

__all__ = ["tria", "tria_sum", "psd_sqrt", "sqrt_kalman_filter",
           "sqrt_rts_smoother"]

_LOG2PI = math.log(2.0 * math.pi)


def tria(B: jnp.ndarray, assume_full_rank: bool = False) -> jnp.ndarray:
    """Lower-triangular L [.., d, d] with L L^T ≈ B B^T, B [.., d, m].

    Rank-deficient pre-arrays (padded factors, exactly-zero elements) give
    NaN in the QR *gradient* (it solves against R's diagonal), so the
    BACKWARD pass recomputes through a pre-array with a tiny RELATIVE
    identity block appended (`_tria_core_gradreg`). The forward pass runs
    the plain LQ on B itself — the Householder kernel is exact for any rank
    (zero tails take an identity reflector) — so the hot path never pays
    the d extra regularisation columns, and the forward/backward values
    differ by O(eps^2) = 1e-12 relative, far below fp32 resolution.

    `assume_full_rank=True` additionally skips the exact-zero bypass and
    the gradient regularisation — for pre-arrays with a guaranteed
    full-row-rank block (e.g. [G, I] Woodbury factors, [HU, R^1/2] with
    positive noise), where the plain QR gradient is already smooth.
    """
    if assume_full_rank:
        return _tria_core(B)
    d, m = B.shape[-2], B.shape[-1]
    if m < d:
        # the QR needs >= d columns to emit a [d, d] factor; zero columns
        # change nothing (L L^T = B B^T exactly)
        B = jnp.concatenate(
            [B, jnp.zeros(B.shape[:-1] + (d - m,), B.dtype)], axis=-1
        )
        m = d
    fp32 = jnp.dtype(B.dtype).itemsize < 8
    # floor INSIDE the sqrt: d(sqrt)/dB is infinite at B = 0 otherwise.
    # The floor must not underflow in the working dtype (1e-60 -> 0 in fp32
    # silently reintroduces the NaN gradient).
    floor = 1e-24 if fp32 else 1e-60
    scale = jnp.sqrt(jnp.sum(B * B, axis=(-1, -2), keepdims=True) / d + floor)
    # exactly-zero pre-arrays (zeroed first-element factors propagate as
    # exact zeros through combines): bypass the QR entirely — its gradient
    # is NaN for rank-0 input regardless of regularisation (double-where).
    is_zero = scale <= 2.0 * jnp.sqrt(jnp.asarray(floor, B.dtype))
    B_safe = jnp.where(
        is_zero,
        jnp.broadcast_to(jnp.eye(d, m, dtype=B.dtype), B.shape),
        B,
    )
    return jnp.where(is_zero, 0.0, _tria_core_gradreg(B_safe))


def _tria_canonical_xla(B_safe):
    """Canonical (diag >= 0) triangular factor via XLA's batched QR."""
    q, r = jnp.linalg.qr(jnp.swapaxes(B_safe, -1, -2), mode="reduced")
    L = jnp.swapaxes(r, -1, -2)
    sign = jnp.sign(jnp.diagonal(L, axis1=-2, axis2=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    return L * sign[..., None, :]


def _tria_core_primal(B_safe):
    from .pallas.batched_qr import batch_tria, use_pallas_tria

    if use_pallas_tria(B_safe.shape):
        # lane-batched Householder LQ: ~20x XLA's batched QR at d=32
        # (the sqrt filters' dominant cost)
        return batch_tria(B_safe)
    return _tria_canonical_xla(B_safe)


@jax.custom_vjp
def _tria_core(B_safe):
    return _tria_core_primal(B_safe)


def _tria_core_fwd(B_safe):
    return _tria_core_primal(B_safe), B_safe


def _tria_core_bwd(B_safe, ct):
    # recompute through the XLA QR (same canonical factor, so the cotangent
    # maps are identical); the sqrt backward is only hot during
    # hyperparameter training
    _, vjp = jax.vjp(_tria_canonical_xla, B_safe)
    return vjp(ct)


_tria_core.defvjp(_tria_core_fwd, _tria_core_bwd)


@jax.custom_vjp
def _tria_core_gradreg(B_safe):
    """LQ with the gradient taken through the REGULARISED pre-array.

    Forward: plain (Pallas-routed) LQ of B_safe — no reg columns, so the
    hot combine trias run at m instead of m + d. Backward: recompute the
    VJP through the XLA QR of [B, eps·scale(B)·I], exactly the composition
    the forward used to evaluate before round 4 — bounded gradients for
    (near-)rank-deficient pre-arrays, O(eps²) inconsistency with the
    forward value (below fp32 resolution)."""
    return _tria_core_primal(B_safe)


def _tria_core_gradreg_fwd(B_safe):
    return _tria_core_primal(B_safe), B_safe


def _tria_core_gradreg_bwd(B_safe, ct):
    d = B_safe.shape[-2]
    fp32 = jnp.dtype(B_safe.dtype).itemsize < 8
    eps = 1e-6 if fp32 else 1e-9
    floor = 1e-24 if fp32 else 1e-60

    def reg_tria(b):
        scale = jnp.sqrt(
            jnp.sum(b * b, axis=(-1, -2), keepdims=True) / d + floor
        )
        reg = eps * scale * jnp.broadcast_to(
            jnp.eye(d, dtype=b.dtype), b.shape[:-1] + (d,)
        )
        return _tria_canonical_xla(jnp.concatenate([b, reg], axis=-1))

    _, vjp = jax.vjp(reg_tria, B_safe)
    return vjp(ct)


_tria_core_gradreg.defvjp(_tria_core_gradreg_fwd, _tria_core_gradreg_bwd)


def _eye_like(X: jnp.ndarray) -> jnp.ndarray:
    d = X.shape[-2]
    return jnp.broadcast_to(jnp.eye(d, dtype=X.dtype), X.shape[:-1] + (d,))


def _tria_sum_xla(X, Y, plus_eye: bool):
    """Reference composition for tria_sum: tria of the concatenated
    pre-array (regularised QR — differentiable, backward-stable)."""
    parts = [X]
    if Y is not None:
        parts.append(Y)
    if plus_eye:
        parts.append(_eye_like(X))
    return tria(jnp.concatenate(parts, axis=-1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _chol_gram_core(X, Y, plus_eye):
    from .pallas.batched_chol import batch_chol_gram

    return batch_chol_gram(X, Y, plus_eye=plus_eye)


def _chol_gram_fwd(X, Y, plus_eye):
    return _chol_gram_core(X, Y, plus_eye), (X, Y)


def _chol_gram_bwd(plus_eye, res, ct):
    # recompute through the XLA QR composition (same canonical factor, so
    # the cotangent maps agree); QR stays finite for rank-deficient inputs
    # where a Cholesky-path gradient would divide by ~zero pivots
    X, Y = res
    if Y is None:
        _, vjp = jax.vjp(lambda x: _tria_sum_xla(x, None, plus_eye), X)
        return vjp(ct) + (None,)
    _, vjp = jax.vjp(lambda x, y: _tria_sum_xla(x, y, plus_eye), X, Y)
    return vjp(ct)


_chol_gram_core.defvjp(_chol_gram_fwd, _chol_gram_bwd)


def tria_sum(X: jnp.ndarray, Y: jnp.ndarray | None = None,
             plus_eye: bool = False) -> jnp.ndarray:
    """Lower-triangular L with L Lᵀ ≈ X Xᵀ (+ Y Yᵀ) (+ I when plus_eye).

    Semantically `tria(concat([X, Y, I]))`, but every term is a PSD SUM (no
    downdating), so on TPU it routes to the fused lane-batched Gram+Cholesky
    kernel (`ops.pallas.batched_chol`): ~half the flops of the Householder
    LQ on the concatenated pre-array, no concatenate, one launch. This is
    the hot primitive of the parallel sqrt combine (4 calls per combine).
    Falls back to `tria` off-TPU / at narrow batches.
    """
    from .pallas.batched_chol import use_pallas_chol

    if not (use_pallas_chol(X.shape)
            and (Y is None or Y.shape[:-1] == X.shape[:-1])):
        return _tria_sum_xla(X, Y, plus_eye)
    if plus_eye:  # Gram + I: spectrum >= 1, never degenerate
        return _chol_gram_core(X, Y, plus_eye)
    # exactly-zero pre-arrays (zeroed first-element factors) — same double-
    # where bypass as `tria`: output 0 with a well-defined zero gradient
    fp32 = jnp.dtype(X.dtype).itemsize < 8
    floor = 1e-24 if fp32 else 1e-60
    d = X.shape[-2]
    s2 = jnp.sum(X * X, axis=(-1, -2), keepdims=True)
    if Y is not None:
        s2 = s2 + jnp.sum(Y * Y, axis=(-1, -2), keepdims=True)
    s2 = s2 / d + floor
    is_zero = s2 <= 2.0 * floor
    Xs = jnp.where(is_zero, _eye_like(X)[..., : X.shape[-1]], X)
    Ys = None if Y is None else jnp.where(is_zero, 0.0, Y)
    return jnp.where(is_zero, 0.0, _chol_gram_core(Xs, Ys, plus_eye))


def psd_sqrt(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalue-clipped symmetric square root (handles exactly-singular
    matrices like Q(dt=0) = 0 that Cholesky cannot)."""
    w, V = jnp.linalg.eigh(symmetrize(A))
    w = jnp.sqrt(jnp.clip(w, 0.0, None))
    return jnp.einsum("...ij,...j->...ij", V, w)


def _solve_tri(L, B, lower=True):
    return jax.scipy.linalg.solve_triangular(L, B, lower=lower)


def _masked_parts(H, R, y, mask):
    Hm = mask[..., :, None] * H
    Rm = mask_covariance(R, mask)
    y0 = jnp.where(mask > 0, jnp.nan_to_num(y), 0.0)
    return Hm, Rm, y0


def _sqrt_update(m_pred, Up, Hm, Rm_sqrt, y0, mask):
    """Square-root measurement update via one block tria.

    pre-array [[Hm Up, Rm^1/2], [Up, 0]] -> [[S^1/2, 0], [K S^1/2, U]]
    """
    d = m_pred.shape[-1]
    p = y0.shape[-1]
    dtype = Up.dtype
    HU = Hm @ Up
    pre = jnp.block(
        [
            [HU, Rm_sqrt],
            [Up, jnp.zeros((d, p), dtype)],
        ]
    )
    T = tria(pre)
    S_sqrt = T[:p, :p]
    KS = T[p:, :p]
    U = T[p:, p:]
    v = y0 - Hm @ m_pred
    m = m_pred + KS @ _solve_tri(S_sqrt, v)
    n_obs = jnp.sum(mask)
    alpha = _solve_tri(S_sqrt, v)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diag(S_sqrt))))
    lml = -0.5 * (jnp.sum(alpha * alpha) + logdet + n_obs * _LOG2PI)
    return m, U, lml


@highest_precision
def sqrt_kalman_filter(A, Q_sqrt, H, R_sqrt, y, m0, P0_sqrt, mask=None, R=None):
    """Sequential square-root filter.

    A [T,d,d]; Q_sqrt [T,d,d] (psd_sqrt of Q); H [p,d]; R_sqrt [T,p,p]
    (Cholesky of R); y [T,p]. Returns FilterResult where Ps are SQUARE ROOTS
    (lower-triangular factors), not covariances.
    """
    T = y.shape[0]
    if mask is None:
        mask = observation_mask(y, P0_sqrt.dtype)
    H_steps = jnp.broadcast_to(H, (T,) + H.shape[-2:]) if H.ndim == 2 else H

    def step(carry, inp):
        m_prev, U_prev = carry
        A_k, Qs_k, H_k, Rs_k, y_k, mask_k = inp
        m_pred = A_k @ m_prev
        Up = tria(jnp.concatenate([A_k @ U_prev, Qs_k], axis=-1))
        Hm = mask_k[:, None] * H_k
        # masked R sqrt: zero masked rows/cols, unit diagonal filler
        Rs_m = mask_k[:, None] * Rs_k * mask_k[None, :] + jnp.diag(1.0 - mask_k)
        y0 = jnp.where(mask_k > 0, jnp.nan_to_num(y_k), 0.0)
        m, U, lml_k = _sqrt_update(m_pred, Up, Hm, Rs_m, y0, mask_k)
        return (m, U), (m, U, lml_k)

    (_, _), (ms, Us, lmls) = jax.lax.scan(
        step, (m0, P0_sqrt), (A, Q_sqrt, H_steps, R_sqrt, y, mask)
    )
    return FilterResult(ms=ms, Ps=Us, lml=jnp.sum(lmls), lmls=lmls)


@highest_precision
def sqrt_rts_smoother(A, Q_sqrt, filtered: FilterResult) -> SmootherResult:
    """Square-root RTS smoother; filtered.Ps are sqrt factors. Returns
    SmootherResult with Ps as SQUARE ROOTS."""
    ms, Us = filtered.ms, filtered.Ps
    d = ms.shape[-1]
    dtype = Us.dtype

    def step(carry, inp):
        m_next_s, D_next = carry
        m_f, U_f, A_next, Qs_next = inp
        # pre-array [[A U_f, Qs], [U_f, 0]] -> [[Pp^1/2,0],[G Pp^1/2, Y22]]
        pre = jnp.block(
            [
                [A_next @ U_f, Qs_next],
                [U_f, jnp.zeros((d, d), dtype)],
            ]
        )
        Tm = tria(pre)
        Pp_sqrt = Tm[:d, :d]
        GP = Tm[d:, :d]
        Y22 = Tm[d:, d:]
        # GP = G Pp^1/2  =>  G = GP (Pp^1/2)^-1 ; right-solve via transpose:
        G = jax.scipy.linalg.solve_triangular(
            Pp_sqrt.T, GP.T, lower=False
        ).T
        m_pred = A_next @ m_f
        m_s = m_f + G @ (m_next_s - m_pred)
        D = tria(jnp.concatenate([Y22, G @ D_next], axis=-1))
        return (m_s, D), (m_s, D, G)

    # flip + forward scan + flip (reverse=True is ~27x slower on TPU)
    flipped = jax.tree_util.tree_map(
        lambda x: x[::-1], (ms[:-1], Us[:-1], A[1:], Q_sqrt[1:])
    )
    (_, _), (ms_s, Ds, Gs) = jax.lax.scan(step, (ms[-1], Us[-1]), flipped)
    ms_s, Ds, Gs = jax.tree_util.tree_map(lambda x: x[::-1], (ms_s, Ds, Gs))
    ms_out = jnp.concatenate([ms_s, ms[-1:]], axis=0)
    Ds_out = jnp.concatenate([Ds, Us[-1:]], axis=0)
    Gs_out = jnp.concatenate([Gs, jnp.zeros((1, d, d), dtype)], axis=0)
    return SmootherResult(ms=ms_out, Ps=Ds_out, Gs=Gs_out)

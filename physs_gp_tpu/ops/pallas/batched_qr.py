"""Lane-batched triangularisation (tria/LQ) kernel.

`tria(B)` — the lower-triangular L with L Lᵀ = B Bᵀ — is THE primitive of the
square-root filters (every combine runs 2-3 of them). XLA lowers the batched
QR at [T, 2d, d] to its generic blocked loop: measured ~20 µs/matrix at
d = 32, making the sqrt config-5 path 15x slower than the covariance form.
This kernel runs one Householder-LQ per 128-lane block entirely in VMEM:
d elimination steps of masked row/column ops, no Q ever formed.

Math (per matrix): LQ factorisation B = L Q with Q orthonormal rows; then
B Bᵀ = L Lᵀ. Equivalent to the Rᵀ of a QR of Bᵀ. Diagonal canonicalised
non-negative, matching `ops.sqrt_kalman.tria`'s sign convention — the
custom VJP recomputes through the XLA QR implementation, which produces the
same canonical factor.

No reference analogue (the reference's sqrt filter uses sequential SVD);
TPU-specific design.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["batch_tria", "use_pallas_tria"]

_LANES = 128


def use_pallas_tria(shape, d_max: int = 48, m_max: int = 128) -> bool:
    """B [N, d, m]: TPU, real batch, block fits VMEM."""
    from .batched_linalg import _on_tpu_backend

    return (
        _on_tpu_backend()
        and len(shape) == 3
        and shape[-2] <= d_max
        and shape[-1] <= m_max
        and shape[0] >= _LANES  # one full lane block (Sklansky levels = 128)
    )


def _lq_kernel(B_ref, L_ref, *, d: int, m: int):
    """Householder LQ of B [d, m, 128] per lane; writes L [d, d, 128].

    Step k eliminates row k's tail (columns > k) with a RIGHT Householder
    reflector supported on columns >= k, then applies it to rows > k.
    Masks replace dynamic slices (static shapes for the vector units).
    """
    B = B_ref[:]
    jj = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)  # column index [m, 1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)  # row index
    for k in range(d):
        col_mask = (jj >= k).astype(B.dtype)  # [m, 1]
        x = B[k, :, :] * col_mask  # [m, 128] row k, cols >= k
        xk = B[k, k, :]  # [128]
        norm2 = jnp.sum(x * x, axis=0)  # [128]
        norm = jnp.sqrt(norm2)
        sgn = jnp.where(xk < 0, -1.0, 1.0).astype(B.dtype)
        alpha = -sgn * norm  # L[k, k] = -alpha * sgn ... see below
        # v = x - alpha e_k  (supported on cols >= k)
        ek = (jj == k).astype(B.dtype)  # [m, 1]
        v = x - alpha[None, :] * ek
        vtv = jnp.sum(v * v, axis=0)  # [128] = 2 norm (norm + |xk|)
        # guard: zero tail => reflector is identity (beta = 0)
        beta = jnp.where(vtv > 0, 2.0 / jnp.where(vtv > 0, vtv, 1.0), 0.0)
        # w = B v over rows > k (row k handled in closed form below)
        w = jnp.sum(B * v[None, :, :], axis=1)  # [d, 128]
        row_mask = (ii > k).astype(B.dtype)  # [d, 1, 1]
        upd = beta[None, None, :] * w[:, None, :] * v[None, :, :]
        B = B - upd * row_mask
        # row k after reflection: alpha at col k, zero beyond
        newrow = alpha[None, :] * ek + B[k, :, :] * (jj < k).astype(B.dtype)
        B = B * (1.0 - (ii == k).astype(B.dtype)) + (
            (ii == k).astype(B.dtype) * newrow[None, :, :]
        )
    Lfull = B[:, :d, :]  # [d, d, 128]
    # canonical factor: scale COLUMN j by sign of its diagonal (L -> L D,
    # D = diag(+-1), leaves L L^T unchanged), zero the upper triangle
    diag = jnp.stack([Lfull[k, k, :] for k in range(d)], axis=0)  # [d, 128]
    sign = jnp.where(diag < 0, -1.0, 1.0).astype(B.dtype)  # [d_col, 128]
    jjd = jax.lax.broadcasted_iota(jnp.int32, (1, d, 1), 1)
    iid = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
    L_ref[:] = Lfull * sign[None, :, :] * (jjd <= iid).astype(B.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def batch_tria(B: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """L [N, d, d] with L Lᵀ = B Bᵀ for B [N, d, m], canonical diag >= 0."""
    from .batched_linalg import _pad_lanes

    N, d, m = B.shape
    Bt, B0 = _pad_lanes(B, fill_eye=True)
    Bp = Bt.shape[-1]
    grid = (Bp // _LANES,)
    out = pl.pallas_call(
        functools.partial(_lq_kernel, d=d, m=m),
        out_shape=jax.ShapeDtypeStruct((d, d, Bp), B.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, m, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Bt)
    return jnp.transpose(out, (2, 0, 1))[:B0]

"""Lane-batched fused Gram + Cholesky kernel: L with L Lᵀ = X Xᵀ + Y Yᵀ (+ I).

The square-root combine's four `tria` calls are all Cholesky factors of PSD
SUMS — chol(X Xᵀ + Y Yᵀ) with no downdating — so the Householder LQ of the
concatenated pre-array (which, after `tria`'s gradient-regularisation block,
runs on [B, d, 3d]) can be replaced by a Gram accumulation (outer-product
k-loop) plus a right-looking Cholesky, all in one VMEM-resident kernel:
~3d³ multiply-adds vs the LQ's ~6d³, no concatenate, one launch.

Numerics: Gram diagonals are cancellation-free sums of squares, and the
only subtraction is the Cholesky trailing update whose error is bounded by
eps_mach·max-diag; pivots are floored at `eps_rel`·(the row's ORIGINAL
diagonal) so roundoff-negative pivots of semi-definite inputs yield a valid
semi-definite factor instead of NaN — the same contract as `tria` for
rank-deficient pre-arrays (factors here are only ever multiplied, never
solved against).

IMPORTANT numerical scope: forming the Gram squares the eigenvalue spread,
so fp32 chol-of-Gram only resolves spreads up to ~1/eps_mach ≈ 1e7, vs the
LQ's ~1e14. Use this ONLY for covariance-side factors (state covariances,
Joseph-form updates — spread bounded by the kernel's conditioning), NEVER
for information-side factors (Z/J, innovation S with tight noise), whose
spread is ~scale/noise² and exceeds 1e7 in exactly the tight-noise regime
the sqrt path exists for. Those stay on the Householder LQ (`tria`).

No reference analogue (the reference's sqrt filter is sequential SVD,
`computation/filters/square_root_kalman_filter.py:67-210`); TPU design.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["batch_chol_gram", "batch_cholesky", "use_pallas_chol"]

_LANES = 128


def use_pallas_chol(shape, d_max: int = 48, m_max: int = 128) -> bool:
    """X [N, d, m]: TPU backend, lane-worthy batch, block fits VMEM."""
    from .batched_linalg import _on_tpu_backend

    return (
        _on_tpu_backend()
        and len(shape) == 3
        and shape[-2] <= d_max
        and shape[-1] <= m_max
        and shape[0] >= _LANES  # one full lane block (Sklansky levels = 128)
    )


def _chol_gram_kernel(*refs, d: int, mx: int, my: int, plus_eye: bool,
                      eps_rel: float):
    """L = chol(X Xᵀ [+ Y Yᵀ] [+ I]) per lane; X [d, mx, 128] etc."""
    if my:
        X_ref, Y_ref, L_ref = refs
    else:
        X_ref, L_ref = refs
    X = X_ref[:]
    dt = X.dtype
    A = jnp.zeros((d, d, _LANES), dt)
    for k in range(mx):
        c = X[:, k, :]  # [d, 128]
        A = A + c[:, None, :] * c[None, :, :]
    if my:
        Y = Y_ref[:]
        for k in range(my):
            c = Y[:, k, :]
            A = A + c[:, None, :] * c[None, :, :]
    ii = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, d, 1), 1)
    eyem = (ii == jj).astype(dt)  # [d, d, 1]
    if plus_eye:
        A = A + eyem
    # pivot floor: a few ULPs of the row's ORIGINAL diagonal (cancellation in
    # the trailing update is bounded by eps_mach * A_kk_orig, so this is the
    # scale-invariant per-direction noise floor; a global mean would crush
    # small-but-legit directions of matrices with wide diagonal range)
    # + absolute floor so all-zero lanes (padding, zeroed factors) stay finite
    d0 = jnp.sum(A * eyem, axis=1)  # [d, 128] original diagonal
    iic = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)  # [d, 1]
    L = jnp.zeros((d, d, _LANES), dt)
    for k in range(d):
        akk = A[k, k, :]  # [128]
        piv = jnp.maximum(akk, eps_rel * d0[k, :] + 1e-30)
        lkk = jnp.sqrt(piv)
        inv = 1.0 / lkk
        below = (iic > k).astype(dt)  # [d, 1]
        colv = A[:, k, :] * inv[None, :] * below  # [d, 128] strict below-diag
        colfull = colv + lkk[None, :] * (iic == k).astype(dt)
        ek = (jj == k).astype(dt)  # [1, d, 1]
        L = L + colfull[:, None, :] * ek
        A = A - colv[:, None, :] * colv[None, :, :]
    L_ref[:] = L


def _chol_kernel(A_ref, L_ref, *, d: int, eps_rel: float):
    """L = chol(A) per lane for EXPLICIT PSD A [d, d, 128] (no Gram step).

    Same right-looking loop and per-row pivot floor as `_chol_gram_kernel`;
    for jittered trusted-PSD inputs (`safe_cholesky`/`safe_cholesky_rel`)
    where XLA's batched Cholesky runs its ~4 us/matrix blocked loop.
    NOTE: never NaNs — do not use where NaN detection is the error signal
    (`robust_cholesky`'s escalation probes stay on the XLA path).
    """
    A = A_ref[:]
    dt = A.dtype
    ii = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, d, 1), 1)
    eyem = (ii == jj).astype(dt)
    d0 = jnp.sum(A * eyem, axis=1)  # [d, 128]
    iic = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    L = jnp.zeros((d, d, _LANES), dt)
    for k in range(d):
        akk = A[k, k, :]
        piv = jnp.maximum(akk, eps_rel * d0[k, :] + 1e-30)
        lkk = jnp.sqrt(piv)
        inv = 1.0 / lkk
        below = (iic > k).astype(dt)
        colv = A[:, k, :] * inv[None, :] * below
        colfull = colv + lkk[None, :] * (iic == k).astype(dt)
        ek = (jj == k).astype(dt)
        L = L + colfull[:, None, :] * ek
        A = A - colv[:, None, :] * colv[None, :, :]
    L_ref[:] = L


@functools.partial(jax.jit, static_argnames=("eps_rel", "interpret"))
def batch_cholesky(A: jnp.ndarray, eps_rel: float | None = None,
                   interpret: bool = False) -> jnp.ndarray:
    """L [N, d, d] with L Lᵀ ≈ A for explicit PSD A [N, d, d]."""
    from .batched_linalg import _pad_lanes

    N, d, _ = A.shape
    if eps_rel is None:
        eps_rel = 5e-7 if jnp.dtype(A.dtype).itemsize < 8 else 1e-14
    At, B0 = _pad_lanes(A, fill_eye=True)
    Bp = At.shape[-1]
    out = pl.pallas_call(
        functools.partial(_chol_kernel, d=d, eps_rel=float(eps_rel)),
        out_shape=jax.ShapeDtypeStruct((d, d, Bp), A.dtype),
        grid=(Bp // _LANES,),
        in_specs=[
            pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(At)
    return jnp.transpose(out, (2, 0, 1))[:B0]


@functools.partial(
    jax.jit, static_argnames=("plus_eye", "eps_rel", "interpret")
)
def batch_chol_gram(X: jnp.ndarray, Y: jnp.ndarray | None = None,
                    plus_eye: bool = False, eps_rel: float | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """L [N, d, d] lower-tri with L Lᵀ ≈ X Xᵀ (+ Y Yᵀ) (+ I); X [N, d, mx]."""
    from .batched_linalg import _pad_lanes

    N, d, mx = X.shape
    my = 0 if Y is None else Y.shape[-1]
    if eps_rel is None:
        eps_rel = 5e-7 if jnp.dtype(X.dtype).itemsize < 8 else 1e-14
    Xt, B0 = _pad_lanes(X, fill_eye=False)
    Bp = Xt.shape[-1]
    grid = (Bp // _LANES,)
    args = [Xt]
    in_specs = [
        pl.BlockSpec((d, mx, _LANES), lambda b: (0, 0, b),
                     memory_space=pltpu.VMEM),
    ]
    if my:
        Yt, _ = _pad_lanes(Y, fill_eye=False)
        args.append(Yt)
        in_specs.append(
            pl.BlockSpec((d, my, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(_chol_gram_kernel, d=d, mx=mx, my=my,
                          plus_eye=plus_eye, eps_rel=float(eps_rel)),
        out_shape=jax.ShapeDtypeStruct((d, d, Bp), X.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return jnp.transpose(out, (2, 0, 1))[:B0]

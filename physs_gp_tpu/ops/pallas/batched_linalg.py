"""Pallas TPU kernels for batch-lane small-matrix linear algebra.

The parallel-scan filtering operator is dominated by linear algebra on
BATCHES of small (d x d, d ~ 2..40) matrices: [B, d, d] batched LU solves and
matmuls. XLA executes these with the matrix dims on the (sublane, lane) axes,
wasting most of the 8x128 VPU lanes and all of the 128x128 MXU — measured
~46 GFLOP/s (about 1000x off peak) for [10k, 32, 32] matmuls, and batched LU
is 4x worse still. This is exactly the "fusion gap" the build plan earmarks
for Pallas (BASELINE.json north star: "batched Pallas kernels ... batched
small-matrix chol/solve in the filtering operator").

The kernels here transpose to a BATCH-ON-LANES layout [d, d, B] and process
128 matrices per grid step, so every VPU op does useful work on all lanes:

- `batch_solve(M, R)`: Gauss-Jordan elimination WITHOUT pivoting, vectorised
  over the lane batch (the combine matrices I + C J are identity-dominated;
  pivoting is unnecessary there, and `jnp.linalg.solve` remains the fallback
  for general use).
- `batch_matmul(A, B)`: k-loop of broadcasted outer products.

Both fall back to plain XLA on non-TPU backends (and in interpret mode for
tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "batch_solve",
    "batch_bmm",
    "batch_solve_logdet",
    "batch_matmul",
    "use_pallas_linalg",
]

_LANES = 128


def _on_tpu_backend() -> bool:
    """True when traces will execute on the TPU plugin — honours an active
    `jax.default_device(cpu)` override (the CPU lowering of pallas_call
    raises unless interpret=True)."""
    try:
        dev = jax.config.jax_default_device
        if dev is not None and getattr(dev, "platform", None) == "cpu":
            return False
        return jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        return False


def use_pallas_linalg(shape, d_max: int = 40) -> bool:
    """Heuristic gate: TPU backend, 3-D batch, small d, worthwhile batch."""
    return (
        _on_tpu_backend()
        and len(shape) == 3
        and shape[-1] <= d_max
        and shape[0] >= _LANES  # one full lane block (Sklansky levels = 128)
    )


def _gj_solve_kernel(M_ref, R_ref, X_ref, *, d: int, r: int):
    """Gauss-Jordan solve of M X = R for 128 lane-batched systems.

    M_ref: [d, d, 128], R_ref: [d, r, 128], X_ref: [d, r, 128].
    No pivoting: intended for identity-dominated systems (I + C J).
    """
    M = M_ref[:]
    R = R_ref[:]
    # one-hot row selectors built in-kernel (constants can't be captured,
    # scatter/.at can't be lowered): iota over the leading axis
    ii = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
    for k in range(d):
        oh = (ii == k).astype(M.dtype)  # [d, 1, 1]
        piv = M[k, k, :]  # [128]
        inv = 1.0 / piv
        row_m = M[k, :, :] * inv[None, :]  # [d, 128]
        row_r = R[k, :, :] * inv[None, :]  # [r, 128]
        col = M[:, k, :] * (1.0 - oh[:, :, 0])  # [d, 128], k-th entry zeroed
        M = M - col[:, None, :] * row_m[None, :, :]
        R = R - col[:, None, :] * row_r[None, :, :]
        # set row k to the normalised row
        M = M * (1.0 - oh) + oh * row_m[None, :, :]
        R = R * (1.0 - oh) + oh * row_r[None, :, :]
    X_ref[:] = R


def _gj_solve_logdet_kernel(M_ref, R_ref, X_ref, ld_ref, *, d: int, r: int):
    """Gauss-Jordan solve + log|det M| for 128 lane-batched PD systems.

    Same elimination as `_gj_solve_kernel`, accumulating sum_k log(pivot_k)
    (pivots of an SPD matrix under GJ are positive — the |.| guards fp32
    round-off only). One pass replaces XLA's batched-cholesky + two
    triangular solves + log-diag reduction for masked Gaussian logpdfs."""
    M = M_ref[:]
    R = R_ref[:]
    ii = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
    ld = jnp.zeros_like(M[0, 0, :])  # [128]
    for k in range(d):
        oh = (ii == k).astype(M.dtype)
        piv = M[k, k, :]
        ld = ld + jnp.log(jnp.abs(piv))
        inv = 1.0 / piv
        row_m = M[k, :, :] * inv[None, :]
        row_r = R[k, :, :] * inv[None, :]
        col = M[:, k, :] * (1.0 - oh[:, :, 0])
        M = M - col[:, None, :] * row_m[None, :, :]
        R = R - col[:, None, :] * row_r[None, :, :]
        M = M * (1.0 - oh) + oh * row_m[None, :, :]
        R = R * (1.0 - oh) + oh * row_r[None, :, :]
    X_ref[:] = R
    ld_ref[:] = ld[None, :]


def _mm_kernel(A_ref, B_ref, C_ref, *, d: int):
    """C = A @ B per lane: A, B, C: [d, d, 128]."""
    A = A_ref[:]
    B = B_ref[:]
    C = jnp.zeros_like(A)
    for k in range(d):
        C = C + A[:, k, :][:, None, :] * B[k, :, :][None, :, :]
    C_ref[:] = C


def _mm_kernel_g(A_ref, B_ref, C_ref, *, d: int, ta: bool, tb: bool):
    """C = op(A) @ op(B) per lane (op = transpose when ta/tb); transposes are
    FREE in the lane layout — just different index roles in the k-loop."""
    A = A_ref[:]
    B = B_ref[:]
    C = jnp.zeros((A.shape[1] if ta else A.shape[0],
                   B.shape[0] if tb else B.shape[1],
                   A.shape[2]), A.dtype)
    for k in range(d):
        a_k = A[k, :, :] if ta else A[:, k, :]  # [m, 128]
        b_k = B[:, k, :] if tb else B[k, :, :]  # [n, 128]
        C = C + a_k[:, None, :] * b_k[None, :, :]
    C_ref[:] = C


def _pad_lanes(x_bdd: jnp.ndarray, fill_eye: bool):
    """[B, m, n] -> [m, n, B_pad] lane-major with padding."""
    B = x_bdd.shape[0]
    pad = (-B) % _LANES
    if pad:
        if fill_eye:
            m = x_bdd.shape[-2]
            n = x_bdd.shape[-1]
            eye = jnp.zeros((pad, m, n), x_bdd.dtype)
            eye = eye.at[
                :, jnp.arange(min(m, n)), jnp.arange(min(m, n))
            ].set(1.0)
            x_bdd = jnp.concatenate([x_bdd, eye])
        else:
            x_bdd = jnp.concatenate(
                [x_bdd, jnp.zeros((pad,) + x_bdd.shape[1:], x_bdd.dtype)]
            )
    return jnp.transpose(x_bdd, (1, 2, 0)), B


@functools.partial(jax.jit, static_argnames=("interpret",))
def batch_solve(M: jnp.ndarray, R: jnp.ndarray, interpret: bool = False):
    """Solve M[b] X[b] = R[b] for all b. M: [B, d, d], R: [B, d, r]."""
    Bz, d, _ = M.shape
    r = R.shape[-1]
    Mt, B0 = _pad_lanes(M, fill_eye=True)
    Rt, _ = _pad_lanes(R, fill_eye=False)
    Bp = Mt.shape[-1]
    grid = (Bp // _LANES,)
    out = pl.pallas_call(
        functools.partial(_gj_solve_kernel, d=d, r=r),
        out_shape=jax.ShapeDtypeStruct((d, r, Bp), M.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, r, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, r, _LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Mt, Rt)
    return jnp.transpose(out, (2, 0, 1))[:B0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def batch_solve_logdet(M: jnp.ndarray, R: jnp.ndarray, interpret: bool = False):
    """Solve M[b] X[b] = R[b] and return (X, log|det M[b]|).

    M: [B, d, d] SPD (possibly mask-degenerate with unit diagonal rows —
    those contribute 0 to the logdet), R: [B, d, r]."""
    Bz, d, _ = M.shape
    r = R.shape[-1]
    Mt, B0 = _pad_lanes(M, fill_eye=True)
    Rt, _ = _pad_lanes(R, fill_eye=False)
    Bp = Mt.shape[-1]
    grid = (Bp // _LANES,)
    X, ld = pl.pallas_call(
        functools.partial(_gj_solve_logdet_kernel, d=d, r=r),
        out_shape=(
            jax.ShapeDtypeStruct((d, r, Bp), M.dtype),
            jax.ShapeDtypeStruct((1, Bp), M.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, r, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, r, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(Mt, Rt)
    return jnp.transpose(X, (2, 0, 1))[:B0], ld[0, :B0]


@functools.partial(jax.jit, static_argnames=("ta", "tb", "interpret"))
def batch_bmm(A: jnp.ndarray, B: jnp.ndarray, ta: bool = False,
              tb: bool = False, interpret: bool = False):
    """C[b] = op(A[b]) @ op(B[b]), op = transpose when ta/tb.

    A: [N, ka, ma], B: [N, kb, mb] with the contracted dims matching; the
    in-kernel transposes cost nothing (index roles in the lane layout), so
    callers avoid materialising `swapaxes` copies entirely."""
    d = A.shape[-1] if ta else A.shape[-2]  # output rows m
    k = A.shape[-2] if ta else A.shape[-1]  # contracted
    e = B.shape[-2] if tb else B.shape[-1]  # output cols n
    At, B0 = _pad_lanes(A, fill_eye=False)
    Bt, _ = _pad_lanes(B, fill_eye=False)
    Bp = At.shape[-1]
    grid = (Bp // _LANES,)
    out = pl.pallas_call(
        functools.partial(_mm_kernel_g, d=k, ta=ta, tb=tb),
        out_shape=jax.ShapeDtypeStruct((d, e, Bp), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(A.shape[1:] + (_LANES,), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(B.shape[1:] + (_LANES,), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, e, _LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(At, Bt)
    return jnp.transpose(out, (2, 0, 1))[:B0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def batch_matmul(A: jnp.ndarray, B: jnp.ndarray, interpret: bool = False):
    """C[b] = A[b] @ B[b]; A, B: [B, d, d]."""
    Bz, d, _ = A.shape
    At, B0 = _pad_lanes(A, fill_eye=False)
    Bt, _ = _pad_lanes(B, fill_eye=False)
    Bp = At.shape[-1]
    grid = (Bp // _LANES,)
    out = pl.pallas_call(
        functools.partial(_mm_kernel, d=d),
        out_shape=jax.ShapeDtypeStruct((d, d, Bp), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(At, Bt)
    return jnp.transpose(out, (2, 0, 1))[:B0]

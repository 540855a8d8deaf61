"""Fused Pallas kernel for the parallel-filter associative combine.

The covariance-form combine does ~10 batched [B, d, d] matmuls plus one
batched solve per level of the associative scan. For small d (spatio-temporal
states, d ~ 16..40) XLA executes each as a separate lane-wasteful kernel;
this module fuses the ENTIRE combine into one Pallas kernel in batch-on-lanes
layout [d, d, 128]: every intermediate stays in VMEM, every VPU op works on
all 128 lanes, and the (I + C J)^-1 solve is the same in-kernel Gauss-Jordan
as `batched_linalg` (identity-dominated system, no pivoting needed).

Combine (Särkkä & García-Fernández eq. 10; ei earlier, ej later):
    U   = (I + C_i J_j)^-1
    A   = A_j U A_i
    b   = b_j + A_j U (b_i + C_i eta_j)
    C   = A_j U C_i A_j^T + C_j
    W   = U A_i
    eta = eta_i + W^T (eta_j - J_j b_i)
    J   = J_i + W^T J_j A_i
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_filtering_combine",
    "fused_smoothing_combine",
    "use_fused_combine",
]

_LANES = 128

# Flipped to True by tests to run the kernels via the Pallas interpreter on
# CPU (numerical equivalence vs the einsum combine without TPU hardware).
_INTERPRET = False


def use_fused_combine(shape, d_min: int = 8, d_max: int = 36) -> bool:
    """Opt-in (PHYSS_FUSED_COMBINE=1): measured at d=32, T=100k the XLA
    einsum combine with the Pallas lane-batched INVERSE (`gen_solve`) runs
    92.8k steps/s vs 83.9k for this fully-fused kernel — once the inverse is
    off the XLA critical path, the MXU einsums beat the VPU lane-matmuls, so
    full fusion is a net loss. Kept (with CPU interpret tests) as the
    building block for shapes where VPU fusion wins.

    PHYSS_FUSED_NARROW=<B>: fuse only combines at batch <= B — the blocked
    scans' intra/Sklansky stages run hundreds of sequential combines at
    width 128-512 where per-op dispatch overhead (not FLOPs) dominates, so
    one kernel per combine may win there while the one full-width
    distribute combine stays on the measured-faster XLA+Pallas-inverse
    path. Experimental knob, default off."""
    import os

    from .batched_linalg import _on_tpu_backend

    ok = (
        _on_tpu_backend()
        and len(shape) == 3
        and d_min <= shape[-1] <= d_max
        and shape[0] >= _LANES
    )
    if os.environ.get("PHYSS_FUSED_COMBINE", "0") == "1":
        return ok
    narrow = int(os.environ.get("PHYSS_FUSED_NARROW", "0"))
    return ok and narrow > 0 and shape[0] <= narrow


def _mm(A, B, d):
    """C[i,j,l] = sum_k A[i,k,l] B[k,j,l] via k-loop of broadcasts."""
    C = A[:, 0, :][:, None, :] * B[0, :, :][None, :, :]
    for k in range(1, d):
        C = C + A[:, k, :][:, None, :] * B[k, :, :][None, :, :]
    return C


def _mmT(A, B, d):
    """C[i,j,l] = sum_k A[k,i,l] B[k,j,l]  (A^T B)."""
    C = A[0, :, :][:, None, :] * B[0, :, :][None, :, :]
    for k in range(1, d):
        C = C + A[k, :, :][:, None, :] * B[k, :, :][None, :, :]
    return C


def _mmBT(A, B, d):
    """C[i,j,l] = sum_k A[i,k,l] B[j,k,l]  (A B^T)."""
    C = A[:, 0, :][:, None, :] * B[:, 0, :][None, :, :]
    for k in range(1, d):
        C = C + A[:, k, :][:, None, :] * B[:, k, :][None, :, :]
    return C


def _mv(A, x, d):
    """y[i,l] = sum_k A[i,k,l] x[k,l]."""
    y = A[:, 0, :] * x[0, :][None, :]
    for k in range(1, d):
        y = y + A[:, k, :] * x[k, :][None, :]
    return y


def _mvT(A, x, d):
    """y[i,l] = sum_k A[k,i,l] x[k,l]  (A^T x)."""
    y = A[0, :, :] * x[0, :][None, :]
    for k in range(1, d):
        y = y + A[k, :, :] * x[k, :][None, :]
    return y


def _gj_inverse(M, d):
    """Gauss-Jordan inverse of identity-dominated M [d, d, 128]."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
    X = jnp.broadcast_to((ii == jax.lax.broadcasted_iota(
        jnp.int32, (1, d, 1), 1)).astype(M.dtype), M.shape) + jnp.zeros_like(M)
    for k in range(d):
        oh = (ii == k).astype(M.dtype)  # [d,1,1]
        inv = 1.0 / M[k, k, :]
        row_m = M[k, :, :] * inv[None, :]
        row_x = X[k, :, :] * inv[None, :]
        col = M[:, k, :] * (1.0 - oh[:, :, 0])
        M = M - col[:, None, :] * row_m[None, :, :]
        X = X - col[:, None, :] * row_x[None, :, :]
        M = M * (1.0 - oh) + oh * row_m[None, :, :]
        X = X * (1.0 - oh) + oh * row_x[None, :, :]
    return X


def _combine_kernel(
    Ai_ref, bi_ref, Ci_ref, Ji_ref, etai_ref,
    Aj_ref, bj_ref, Cj_ref, Jj_ref, etaj_ref,
    A_out, b_out, C_out, J_out, eta_out, *, d: int,
):
    Ai, Ci, Ji = Ai_ref[:], Ci_ref[:], Ji_ref[:]
    Aj, Cj, Jj = Aj_ref[:], Cj_ref[:], Jj_ref[:]
    bi, etai = bi_ref[:], etai_ref[:]
    bj, etaj = bj_ref[:], etaj_ref[:]

    ii = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, d, 1), 1)
    eye = (ii == jj).astype(Ai.dtype) + jnp.zeros_like(Ai[:, :, :1])

    ICJ = eye + _mm(Ci, Jj, d)
    U = _gj_inverse(ICJ, d)
    AjU = _mm(Aj, U, d)
    A_out[:] = _mm(AjU, Ai, d)
    u = bi + _mv(Ci, etaj, d)
    b_out[:] = bj + _mv(AjU, u, d)
    AUC = _mm(AjU, Ci, d)
    C = _mmBT(AUC, Aj, d) + Cj
    C_out[:] = 0.5 * (C + jnp.swapaxes(C, 0, 1))
    W = _mm(U, Ai, d)
    w = etaj - _mv(Jj, bi, d)
    eta_out[:] = etai + _mvT(W, w, d)
    JA = _mm(Jj, Ai, d)
    J = Ji + _mmT(W, JA, d)
    J_out[:] = 0.5 * (J + jnp.swapaxes(J, 0, 1))


def _smoothing_kernel(
    Ej_ref, gj_ref, Lj_ref, Ei_ref, gi_ref, Li_ref,
    E_out, g_out, L_out, *, d: int,
):
    """Fused smoothing combine (ej later-suffix, ei earlier):
    E = Ei Ej, g = Ei gj + gi, L = Ei Lj Ei^T + Li."""
    Ej, Lj, gj = Ej_ref[:], Lj_ref[:], gj_ref[:]
    Ei, Li, gi = Ei_ref[:], Li_ref[:], gi_ref[:]
    E_out[:] = _mm(Ei, Ej, d)
    g_out[:] = gi + _mv(Ei, gj, d)
    L = Li + _mmBT(_mm(Ei, Lj, d), Ei, d)
    L_out[:] = 0.5 * (L + jnp.swapaxes(L, 0, 1))


@jax.custom_vjp
def fused_smoothing_combine(ej, ei):
    """Fused Pallas smoothing combine; backward recomputes via einsums."""
    return _fused_smoothing_combine_impl(ej, ei)


def _fused_smooth_fwd(ej, ei):
    return _fused_smoothing_combine_impl(ej, ei), (ej, ei)


def _fused_smooth_bwd(res, ct):
    ej, ei = res
    from ..parallel_kalman import _smoothing_operator_xla

    _, vjp = jax.vjp(_smoothing_operator_xla, ej, ei)
    return vjp(ct)


fused_smoothing_combine.defvjp(_fused_smooth_fwd, _fused_smooth_bwd)


def _fused_smoothing_combine_impl(ej, ei):
    B0, d, _ = ej.E.shape
    pad = (-B0) % _LANES
    Bp = B0 + pad
    dtype = ej.E.dtype
    Ej, Lj, Ei, Li = [
        _to_lanes(x, B0, pad, True) for x in (ej.E, ej.L, ei.E, ei.L)
    ]
    gj, gi = [_to_lanes(x, B0, pad, False) for x in (ej.g, ei.g)]
    grid = (Bp // _LANES,)
    mspec = pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((d, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
    E, g, L = pl.pallas_call(
        functools.partial(_smoothing_kernel, d=d),
        out_shape=(
            jax.ShapeDtypeStruct((d, d, Bp), dtype),
            jax.ShapeDtypeStruct((d, Bp), dtype),
            jax.ShapeDtypeStruct((d, d, Bp), dtype),
        ),
        grid=grid,
        in_specs=[mspec, vspec, mspec, mspec, vspec, mspec],
        out_specs=(mspec, vspec, mspec),
        interpret=_INTERPRET,
    )(Ej, gj, Lj, Ei, gi, Li)
    out_m = lambda x: jnp.transpose(x, (2, 0, 1))[:B0]
    out_v = lambda x: jnp.transpose(x, (1, 0))[:B0]
    return type(ej)(E=out_m(E), g=out_v(g), L=out_m(L))


def _to_lanes(x, B0, pad, is_matrix):
    if pad:
        fill = jnp.zeros((pad,) + x.shape[1:], x.dtype)
        if is_matrix:
            n = x.shape[-1]
            fill = fill + jnp.eye(n, dtype=x.dtype)  # identity padding
        x = jnp.concatenate([x, fill])
    if is_matrix:
        return jnp.transpose(x, (1, 2, 0))
    return jnp.transpose(x, (1, 0))


@jax.custom_vjp
def fused_filtering_combine(ei, ej):
    """Combine two batches of filtering elements in one fused kernel.

    ei/ej: NamedTuples with fields A,b,C,J,eta shaped [B,d,d]/[B,d].
    Backward pass recomputes through the einsum combine (Pallas kernels have
    no automatic transpose; the combine's VJP is rarely hot — only
    hyperparameter training differentiates through the filter)."""
    return _fused_filtering_combine_impl(ei, ej)


def _fused_combine_fwd(ei, ej):
    return _fused_filtering_combine_impl(ei, ej), (ei, ej)


def _fused_combine_bwd(res, ct):
    ei, ej = res
    from ..parallel_kalman import _filtering_operator_xla

    _, vjp = jax.vjp(_filtering_operator_xla, ei, ej)
    return vjp(ct)


fused_filtering_combine.defvjp(_fused_combine_fwd, _fused_combine_bwd)


def _fused_filtering_combine_impl(ei, ej):
    B0, d, _ = ei.A.shape
    pad = (-B0) % _LANES
    Bp = B0 + pad
    dtype = ei.A.dtype

    Ai, Ci, Ji, Aj, Cj, Jj = [
        _to_lanes(x, B0, pad, True) for x in (ei.A, ei.C, ei.J, ej.A, ej.C, ej.J)
    ]
    bi, etai, bj, etaj = [
        _to_lanes(x, B0, pad, False) for x in (ei.b, ei.eta, ej.b, ej.eta)
    ]

    grid = (Bp // _LANES,)
    mspec = pl.BlockSpec((d, d, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((d, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
    A, b, C, J, eta = pl.pallas_call(
        functools.partial(_combine_kernel, d=d),
        out_shape=(
            jax.ShapeDtypeStruct((d, d, Bp), dtype),
            jax.ShapeDtypeStruct((d, Bp), dtype),
            jax.ShapeDtypeStruct((d, d, Bp), dtype),
            jax.ShapeDtypeStruct((d, d, Bp), dtype),
            jax.ShapeDtypeStruct((d, Bp), dtype),
        ),
        grid=grid,
        in_specs=[mspec, vspec, mspec, mspec, vspec,
                  mspec, vspec, mspec, mspec, vspec],
        out_specs=(mspec, vspec, mspec, mspec, vspec),
        interpret=_INTERPRET,
    )(Ai, bi, Ci, Ji, etai, Aj, bj, Cj, Jj, etaj)
    out_m = lambda x: jnp.transpose(x, (2, 0, 1))[:B0]
    out_v = lambda x: jnp.transpose(x, (1, 0))[:B0]
    return type(ei)(A=out_m(A), b=out_v(b), C=out_m(C), J=out_m(J),
                    eta=out_v(eta))
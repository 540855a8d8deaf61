"""MXU-blocked batched small-matrix multiply.

XLA:TPU lowers batched [B, d, d] x [B, d, d] dots at d ~ 32 to a path
measured at 0.43 TFLOP/s / ~27 GB/s effective (152 ns per matrix) — two
orders of magnitude off both compute and bandwidth roofline. This kernel
streams per-matrix blocks through VMEM and issues one MXU dot per matrix:
bandwidth-bound at ~12 KB/matrix, an order of magnitude faster in practice.

Used by the parallel-scan combines and element builders (the hot path of the
whole framework) through `ops.matrix.bmm`; transposed variants avoid
materialising swapaxes copies.

No reference analogue (TPU-specific design); the math it accelerates is the
associative filter/smoother combine of Särkkä & García-Fernández (reference
`computation/filters/parallel_kalman_filter.py`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mxu_bmm", "use_mxu_bmm"]

# matrices processed per grid step: amortises DMA setup, keeps VMEM use at
# 3 * BT * d * 128 * 4B (= 3 MB at BT=64, d=32 after lane padding)
_BT = 64


def use_mxu_bmm(B: int, d: int) -> bool:
    from .batched_linalg import _on_tpu_backend

    return _on_tpu_backend() and 8 <= d <= 128 and B >= _BT


def _bmm_kernel(A_ref, B_ref, C_ref, *, bt: int, ta: bool, tb: bool):
    def body(i, _):
        a = A_ref[i]
        b = B_ref[i]
        if ta:
            a = a.T
        if tb:
            b = b.T
        C_ref[i] = jnp.dot(a, b, preferred_element_type=C_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bt, body, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("ta", "tb", "interpret"))
def mxu_bmm(A, B, ta: bool = False, tb: bool = False, interpret: bool = False):
    """C[b] = op(A[b]) @ op(B[b]) with op = transpose when ta/tb.

    A: [N, d, d], B: [N, d, e] (e == d when tb). Pads N to a multiple of the
    block; the padded matrices multiply garbage into rows that are sliced
    away (no NaN risk: pads are zeros).
    """
    N, d, _ = A.shape
    e = B.shape[-2] if tb else B.shape[-1]
    pad = (-N) % _BT
    if pad:
        A = jnp.concatenate(
            [A, jnp.zeros((pad,) + A.shape[1:], A.dtype)], axis=0
        )
        B = jnp.concatenate(
            [B, jnp.zeros((pad,) + B.shape[1:], B.dtype)], axis=0
        )
    Np = A.shape[0]
    grid = (Np // _BT,)
    out = pl.pallas_call(
        functools.partial(_bmm_kernel, bt=_BT, ta=ta, tb=tb),
        out_shape=jax.ShapeDtypeStruct((Np, d, e), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BT,) + A.shape[1:], lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT,) + B.shape[1:], lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BT, d, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A, B)
    return out[:N]

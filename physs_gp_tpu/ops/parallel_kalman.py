"""Temporal-parallel Kalman filtering/smoothing via `lax.associative_scan`.

TPU-native counterpart of the reference's
`computation/filters/parallel_kalman_filter.py` (elements :35-175, operator
:179-220, scan :295) and `parallel_rts_smoother.py:26-103`, implementing
Särkkä & García-Fernández (2021) temporal parallelisation: per-step filtering
elements (A, b, C, J, eta) combined by an associative operator, giving O(T)
work at O(log T) depth. This is the paper's core scaling claim and the
BASELINE.json driver metric.

TPU-first details:
- Elements for all T steps are built by one batched einsum pass (no vmap over
  python closures); the combine is pure batched matmul + LU solve, which XLA
  maps onto the MXU.
- Missing data enters element construction through masked H rows (fixed
  shapes; a fully-missing step degenerates to pure prediction automatically).
- Covariances are re-symmetrized in the combine (the reference PSD-forces;
  symmetric-part projection is cheaper and sufficient in practice, with the
  sqrt filter as the robust fallback).
- `chunked` mode: an outer `lax.scan` over time chunks of an inner
  associative scan bounds peak memory to O(chunk * d^2) while keeping the
  log-depth speedup within chunks — needed for 100k-step spatio-temporal
  states on a 16 GB chip.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussian import mask_covariance, masked_mvn_logpdf
from .kalman import FilterResult, SmootherResult, observation_mask
from .matrix import (
    bmm,
    cholesky_solve,
    highest_precision,
    psd_solve,
    safe_cholesky,
    symmetrize,
)

__all__ = ["parallel_kalman_filter", "parallel_rts_smoother"]


class _FilterElems(NamedTuple):
    A: jnp.ndarray  # [T, d, d]
    b: jnp.ndarray  # [T, d]
    C: jnp.ndarray  # [T, d, d]
    J: jnp.ndarray  # [T, d, d]
    eta: jnp.ndarray  # [T, d]


def _build_filter_elements(A, Q, H, R, y, mask, m0, P0) -> _FilterElems:
    """Vectorised construction of all T filtering elements.

    First element folds in the prior (m0, P0): its predictive covariance is
    A_0 P0 A_0^T + Q_0 (A_0 = I, Q_0 = 0 by convention -> exactly the prior).
    """
    T, d = y.shape[0], m0.shape[-1]
    dtype = P0.dtype
    y0 = jnp.where(mask > 0, jnp.nan_to_num(y), 0.0)
    Hm = mask[..., :, None] * H  # [T, p, d]

    # Predictive covariance contribution of each step taken alone.
    # Generic steps: P_pred_local = Q_k. First step: A_0 P0 A_0^T + Q_0.
    P_loc = Q.at[0].add(A[0] @ P0 @ A[0].T)
    m_loc = jnp.zeros((T, d), dtype).at[0].set(A[0] @ m0)

    HP = bmm(Hm, P_loc)  # [T, p, d]
    S = mask_covariance(bmm(HP, Hm, tb=True) + R, mask)
    vres = y0 - jnp.einsum("tpj,tj->tp", Hm, m_loc)  # [T, p]
    # ONE batched SPD solve for all three right-hand sides (Pallas GJ on TPU;
    # XLA's chol + 3 triangular solves is the hottest single cost otherwise):
    rhs = jnp.concatenate([HP, vres[..., None], Hm], axis=-1)  # [T, p, 2d+1]
    sol = psd_solve(S, rhs)
    SinvHP = sol[..., :d]  # S^-1 H P
    Sinv_v = sol[..., d]  # S^-1 vres
    SinvH = sol[..., d + 1 :]  # S^-1 H
    ImKH = jnp.eye(d, dtype=dtype) - bmm(SinvHP, Hm, ta=True)  # I - K H

    A_out = bmm(ImKH, A)
    b_out = m_loc + jnp.einsum("tpi,tp->ti", SinvHP, vres)  # K vres
    C_out = symmetrize(bmm(ImKH, P_loc))

    # eta = A^T H^T S^-1 (y - H m_loc);  J = A^T H^T S^-1 H A
    HtSinv_v = jnp.einsum("tpj,tp->tj", Hm, Sinv_v)
    eta = jnp.einsum("tji,tj->ti", A, HtSinv_v)
    HtSinvH = bmm(Hm, SinvH, ta=True)
    J = symmetrize(bmm(bmm(A, HtSinvH, ta=True), A))

    # First element: A=0, eta=0, J=0; b/C already hold the updated prior.
    A_out = A_out.at[0].set(jnp.zeros((d, d), dtype))
    eta = eta.at[0].set(jnp.zeros((d,), dtype))
    J = J.at[0].set(jnp.zeros((d, d), dtype))
    return _FilterElems(A=A_out, b=b_out, C=C_out, J=J, eta=eta)


def _inv2(M):
    """Closed-form batched 2x2 inverse (adjugate) — the temporal-model fast
    path; batched LU at [B, 2, 2] is pure overhead."""
    a = M[..., 0, 0]
    b = M[..., 0, 1]
    c = M[..., 1, 0]
    dd = M[..., 1, 1]
    det = a * dd - b * c
    inv = jnp.stack(
        [jnp.stack([dd, -b], -1), jnp.stack([-c, a], -1)], -2
    )
    return inv / det[..., None, None]


def _batched_inverse(M):
    """inv(M) for [.., d, d]: adjugate for d=2, Pallas lane-batched
    Gauss-Jordan for small d on TPU (4x XLA's batched LU), LU otherwise —
    differentiable via gen_solve's custom VJP."""
    d = M.shape[-1]
    if d == 2:
        return _inv2(M)
    from .matrix import gen_solve

    eye_b = jnp.broadcast_to(jnp.eye(d, dtype=M.dtype), M.shape)
    return gen_solve(M, eye_b)



def _sklansky_scan(op, elems):
    """Inclusive scan whose EVERY combine runs at a constant n/2-wide batch.

    `jax.lax.associative_scan`'s recursive schedule halves the combine batch
    each level, so for small n (the 256 block totals of
    `blocked_inclusive_scan`) every level sits below the Pallas lane gate
    and falls onto XLA's slow small-batch QR/LU paths — measured ~40 ms per
    sqrt inner scan, a large share of the remaining sqrt-path time.
    Sklansky's schedule does more work (n/2 * log2 n combines vs ~2n) but
    issues ONE op() call per level at batch n/2, which stays on the
    lane-batched kernels. Gather/scatter indices are static numpy arrays.
    Requires power-of-two n (caller checks)."""
    import numpy as np

    leaves = jax.tree_util.tree_leaves(elems)
    n = leaves[0].shape[0]
    idx = np.arange(n)
    for lev in range(n.bit_length() - 1):
        sel = idx[(idx & (1 << lev)) != 0]
        anchor = (sel >> lev << lev) - 1
        a = jax.tree_util.tree_map(lambda x: x[anchor], elems)
        b = jax.tree_util.tree_map(lambda x: x[sel], elems)
        c = op(a, b)
        elems = jax.tree_util.tree_map(
            lambda x, cc: x.at[sel].set(cc), elems, c
        )
    return elems


def blocked_inclusive_scan(op, elems, ident, final_op=None, init=None):
    """Inclusive scan keeping EVERY combine at a Pallas-friendly batch width.

    The lane-batched Pallas linalg gates on batch >= 256
    (`pallas.batched_linalg.use_pallas_linalg`), so `associative_scan`'s
    levels below 256 elements fall back to XLA's slow small-batch dot path.
    This scan never goes narrow:

        [n] -> pad with identities -> [B=256 blocks, L] (time contiguous in
        a block) -> sequential lax.scan over L (B-wide combines)
        -> associative_scan over the B block totals (tiny, slow path ok)
        -> one distribute combine at full width.

    Work: ~2n + O(B log B) combines (vs ~1.5n) but ALL wide. `ident` is a
    TWO-sided identity element of `op` (no batch dims; tail padding sits on
    the right of the totals); exactness: associativity makes any bracketing
    equal in exact arithmetic, fp32 orderings differ at roundoff like any
    other scan schedule.

    `init`: optional single element folded in from the left — equivalent to
    `op(init, scan(elems))` but absorbed into the block-totals pass (one
    B-wide combine) instead of an extra full-width one; this is the chunked
    smoothers' inter-chunk carry.
    `final_op(prefix, intra) -> pytree`: optional REDUCED combine for the
    one distribute pass — the only combine whose full output feeds
    downstream consumers, so emitting just the fields they use (e.g. the
    filtered moments (b, C)) skips the dead outputs' batched matmuls. Must
    agree with `op` on the emitted fields.

    Returns `(out, total)`: the inclusive prefixes (through `final_op` when
    given) and the FULL combine of init + all n elements (the natural
    inter-chunk carry).
    """
    import os

    n_blocks = int(os.environ.get("PHYSS_SCAN_BLOCKS", "256"))
    leaves = jax.tree_util.tree_leaves(elems)
    n = leaves[0].shape[0]
    L = -(-n // n_blocks)
    pad = L * n_blocks - n

    def bcast(x, batch):
        return jnp.broadcast_to(x, batch + x.shape)

    if pad:
        elems = jax.tree_util.tree_map(
            lambda x, i: jnp.concatenate([x, bcast(i, (pad,))]), elems, ident
        )
    blocked = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x.reshape((n_blocks, L) + x.shape[1:]), 1, 0),
        elems,
    )
    ident_b = jax.tree_util.tree_map(lambda x: bcast(x, (n_blocks,)), ident)

    def body(carry, x):
        out = op(carry, x)
        return out, out

    _, intra = jax.lax.scan(body, ident_b, blocked)  # [L, B, ...]
    block_tot = jax.tree_util.tree_map(lambda x: x[-1], intra)
    if n_blocks & (n_blocks - 1) == 0:
        tot_scan = _sklansky_scan(op, block_tot)  # constant-width combines
    else:
        tot_scan = jax.lax.associative_scan(op, block_tot)
    if init is not None:
        tot_scan = op(
            jax.tree_util.tree_map(lambda x: bcast(x, (n_blocks,)), init),
            tot_scan,
        )
        first = jax.tree_util.tree_map(lambda x: x[None], init)
    else:
        first = jax.tree_util.tree_map(lambda x: x[:1], ident_b)
    total = jax.tree_util.tree_map(lambda x: x[-1], tot_scan)
    prefix = jax.tree_util.tree_map(
        lambda f, ts: jnp.concatenate([f, ts[:-1]]), first, tot_scan
    )
    flat_intra = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x, 0, 1).reshape((n_blocks * L,) + x.shape[2:]),
        intra,
    )
    flat_prefix = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, L, axis=0), prefix
    )
    out = (final_op or op)(flat_prefix, flat_intra)
    return jax.tree_util.tree_map(lambda x: x[:n], out), total


def _inner_scan(op, elems, ident=None):
    """Inclusive combine for ONE chunk of elements (full-element output).

    PHYSS_INNER_SCAN (read at trace time) selects the schedule:
      blocked (TPU default)  blocked_inclusive_scan — every combine at a
                       batch width on the Pallas fast path. Config-5 A/B
                       (round 3): 703 ms vs 1131 ms step (1.61x), elbo
                       matching to 3e-6 relative — associative_scan's
                       sub-256-element levels fall back to XLA's slow
                       small-batch dots, which dominated the scans.
      assoc (CPU default)    jax.lax.associative_scan
      prefix           Hillis-Steele `prefix_combine` — measured a NET LOSS
                       on the config-5 step (1081 vs 1050 ms, round 3): each
                       doubling level re-concatenates full element copies
                       (O(T log T) HBM traffic); kept as an experiment knob
    """
    out, _ = _inner_scan_ex(op, elems, ident)
    return out


def _inner_scan_ex(op, elems, ident=None, final_op=None, project=None,
                   init=None):
    """`_inner_scan` with the distribute-stage reductions; returns
    `(out, total)`.

    `final_op`/`init` as in `blocked_inclusive_scan`. `project` maps FULL
    scanned elements to `final_op`'s output structure — applied on the
    non-blocked schedules so every mode returns the same pytree shape.
    """
    import os

    from .pallas.batched_linalg import _on_tpu_backend

    mode = os.environ.get("PHYSS_INNER_SCAN")
    if mode is None:
        # blocked stays the TPU default at EVERY d (round-4 IN-GRAPH sweep,
        # profile_temporal5.py, d=2 T=100k: blocked 3.2 ms/pass at 1024
        # blocks vs assoc 6.2-6.5 ms — even where all combines are
        # closed-form XLA, assoc's ~2 full-width HBM passes per level lose
        # to blocked's lane-wide sequential iterations; single-dispatch
        # sweeps are relay-floor-bound (~8 ms no-op) and cannot rank these).
        mode = "blocked" if (_on_tpu_backend() and ident is not None) else "assoc"
    # legacy knob: PHYSS_PREFIX_COMBINE=1 forces the prefix schedule and
    # takes precedence over the blocked TPU default (the measurements in
    # the docstring were taken through it)
    prefix = (
        mode == "prefix" or os.environ.get("PHYSS_PREFIX_COMBINE", "0") == "1"
    )
    if not prefix and mode == "blocked" and ident is not None:
        return blocked_inclusive_scan(
            op, elems, ident, final_op=final_op, init=init
        )
    if prefix:
        n = jax.tree_util.tree_leaves(elems)[0].shape[0]
        full = prefix_combine(op, elems, n)
    else:
        full = jax.lax.associative_scan(op, elems)
    if init is not None:
        full = op(jax.tree_util.tree_map(lambda x: x[None], init), full)
    total = jax.tree_util.tree_map(lambda x: x[-1], full)
    if project is not None:
        full = project(full)
    return full, total


def _ident_filter_elem(d, dtype):
    return _FilterElems(
        A=jnp.eye(d, dtype=dtype),
        b=jnp.zeros((d,), dtype),
        C=jnp.zeros((d, d), dtype),
        J=jnp.zeros((d, d), dtype),
        eta=jnp.zeros((d,), dtype),
    )


def _ident_smoother_elem(d, dtype):
    return _SmootherElems(
        E=jnp.eye(d, dtype=dtype),
        g=jnp.zeros((d,), dtype),
        L=jnp.zeros((d, d), dtype),
    )


def _filtering_operator(ei: _FilterElems, ej: _FilterElems) -> _FilterElems:
    """Associative combine of filtering elements (Särkkä & G-F eq. 10).

    On TPU at mid-size d the whole combine runs as ONE fused Pallas kernel in
    batch-on-lanes layout (every intermediate in VMEM, all 128 lanes busy);
    its backward pass recomputes through this einsum implementation.

    One batched inverse per combine: (I + J_j C_i)^-1 = ((I + C_i J_j)^-1)^T
    for symmetric C, J, so the second inverse is the transpose of the first —
    the batched inverse is the dominant cost of the whole parallel filter on
    TPU (~4x a batched matmul at d ~ 32), so this halves the combine.
    """
    from .pallas.fused_combine import fused_filtering_combine, use_fused_combine

    if (
        ei.A.ndim == 3
        and ei.A.shape == ej.A.shape
        and use_fused_combine(ei.A.shape)
    ):
        return fused_filtering_combine(ei, ej)
    return _filtering_operator_xla(ei, ej)


def _filtering_moments(ei: _FilterElems, ej: _FilterElems):
    """Shared core of the filtering combine: the Woodbury inverse and the
    moment outputs (b, C), plus the intermediates (U, AjU) the full
    operator's A/eta/J outputs build on — ONE implementation so the reduced
    distribute combine cannot desynchronize from the scan operator."""
    # bmm: lane-batched Pallas matmul (95 ns/matrix vs XLA's 152 at d=32,
    # in-kernel transposes free); falls back to einsum off-TPU / broadcasting
    d = ei.A.shape[-1]
    eye = jnp.eye(d, dtype=ei.A.dtype)
    ICJ = eye + bmm(ei.C, ej.J)
    U = _batched_inverse(ICJ)  # inv(I + C_i J_j)
    AjU = bmm(ej.A, U)
    b = jnp.einsum(
        "...ij,...j->...i",
        AjU,
        ei.b + jnp.einsum("...ij,...j->...i", ei.C, ej.eta),
    ) + ej.b
    C = symmetrize(bmm(bmm(AjU, ei.C), ej.A, tb=True) + ej.C)
    return U, AjU, b, C


def _filtering_operator_xla(ei: _FilterElems, ej: _FilterElems) -> _FilterElems:
    U, AjU, b, C = _filtering_moments(ei, ej)
    A = bmm(AjU, ei.A)
    # V = inv(I + J_j C_i) = U^T; with W = U A_i:
    #   eta = A_i^T V w + eta_i = W^T w + eta_i
    #   J   = A_i^T V J_j A_i + J_i = W^T J_j A_i + J_i
    W = bmm(U, ei.A)
    w = ej.eta - jnp.einsum("...ij,...j->...i", ej.J, ei.b)
    eta = jnp.einsum("...ji,...j->...i", W, w) + ei.eta
    J = symmetrize(bmm(W, bmm(ej.J, ei.A), ta=True) + ei.J)
    return _FilterElems(A=A, b=b, C=C, J=J, eta=eta)


def _filtering_final(ei: _FilterElems, ej: _FilterElems):
    """Distribute-stage combine emitting only the filtered moments (b, C).

    The blocked scan's one full-width distribute pass is the only combine
    whose output feeds downstream consumers, and they use just (b, C) — the
    A/eta/J outputs are dead there, and skipping them drops 4 of the full
    combine's 8 batched matmuls (the combines are ~the whole filter cost at
    T = 100k, profile_c5f round 3)."""
    _, _, b, C = _filtering_moments(ei, ej)
    return b, C


def _project_filter_moments(e: _FilterElems):
    return e.b, e.C


# ---------------------------------------------------------------------------
# d = 2 flat (structure-of-arrays) fast path
#
# At state dim 2 every combine is closed-form scalar algebra, but the
# array-of-structures [B, 2, 2] layout wastes the TPU tile (trailing dims
# 2x2 pad toward the 8x128 tile) and splinters each combine into many tiny
# kernels. Packing each element into ONE [.., 14] row (A row-major | b |
# C sym | J sym | eta) turns the whole combine into a single fused
# elementwise kernel over lane-dense arrays — the d=2 analogue of the
# Pallas batch-on-lanes layout, with XLA doing the fusion. Symmetric C/J
# store 3 components each. Measured round 4 (temporal d=2 Matern-Poisson
# CVI, T=100k): see docs/PERFORMANCE.md.
# ---------------------------------------------------------------------------


def _flat2_from_filter_elems(e: _FilterElems) -> jnp.ndarray:
    """[.., 14] = [A00 A01 A10 A11 | b0 b1 | C00 C01 C11 | J00 J01 J11 |
    eta0 eta1]."""
    A, b, C, J, eta = e
    return jnp.concatenate(
        [
            A.reshape(A.shape[:-2] + (4,)),
            b,
            jnp.stack([C[..., 0, 0], C[..., 0, 1], C[..., 1, 1]], -1),
            jnp.stack([J[..., 0, 0], J[..., 0, 1], J[..., 1, 1]], -1),
            eta,
        ],
        axis=-1,
    )


def _ident_flat2_filter(dtype):
    return jnp.asarray([1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype)


def _flat2_moments(x, y):
    """Closed-form (b, C) outputs of the d=2 combine plus the (U, AjU)
    scalars the full operator reuses — x earlier (i), y later (j)."""
    ci00, ci01, ci11 = x[..., 6], x[..., 7], x[..., 8]
    jj00, jj01, jj11 = y[..., 9], y[..., 10], y[..., 11]
    # M = I + C_i J_j ; U = M^-1 (adjugate)
    m00 = 1.0 + ci00 * jj00 + ci01 * jj01
    m01 = ci00 * jj01 + ci01 * jj11
    m10 = ci01 * jj00 + ci11 * jj01
    m11 = 1.0 + ci01 * jj01 + ci11 * jj11
    r = 1.0 / (m00 * m11 - m01 * m10)
    u00, u01, u10, u11 = m11 * r, -m01 * r, -m10 * r, m00 * r
    aj00, aj01, aj10, aj11 = y[..., 0], y[..., 1], y[..., 2], y[..., 3]
    p00 = aj00 * u00 + aj01 * u10
    p01 = aj00 * u01 + aj01 * u11
    p10 = aj10 * u00 + aj11 * u10
    p11 = aj10 * u01 + aj11 * u11
    # b = AjU (b_i + C_i eta_j) + b_j
    ej0, ej1 = y[..., 12], y[..., 13]
    t0 = x[..., 4] + ci00 * ej0 + ci01 * ej1
    t1 = x[..., 5] + ci01 * ej0 + ci11 * ej1
    b0 = p00 * t0 + p01 * t1 + y[..., 4]
    b1 = p10 * t0 + p11 * t1 + y[..., 5]
    # C = sym(AjU C_i Aj^T) + C_j
    x00 = p00 * ci00 + p01 * ci01
    x01 = p00 * ci01 + p01 * ci11
    x10 = p10 * ci00 + p11 * ci01
    x11 = p10 * ci01 + p11 * ci11
    y00 = x00 * aj00 + x01 * aj01
    y01 = x00 * aj10 + x01 * aj11
    y10 = x10 * aj00 + x11 * aj01
    y11 = x10 * aj10 + x11 * aj11
    c00 = y00 + y[..., 6]
    c01 = 0.5 * (y01 + y10) + y[..., 7]
    c11 = y11 + y[..., 8]
    return (u00, u01, u10, u11), (p00, p01, p10, p11), (b0, b1), (c00, c01, c11)


def _flat2_filtering_operator(x, y):
    U, P, (b0, b1), (c00, c01, c11) = _flat2_moments(x, y)
    u00, u01, u10, u11 = U
    p00, p01, p10, p11 = P
    ai00, ai01, ai10, ai11 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    # A = AjU A_i
    A00 = p00 * ai00 + p01 * ai10
    A01 = p00 * ai01 + p01 * ai11
    A10 = p10 * ai00 + p11 * ai10
    A11 = p10 * ai01 + p11 * ai11
    # W = U A_i ; w = eta_j - J_j b_i ; eta = W^T w + eta_i
    w00 = u00 * ai00 + u01 * ai10
    w01 = u00 * ai01 + u01 * ai11
    w10 = u10 * ai00 + u11 * ai10
    w11 = u10 * ai01 + u11 * ai11
    jj00, jj01, jj11 = y[..., 9], y[..., 10], y[..., 11]
    bi0, bi1 = x[..., 4], x[..., 5]
    wv0 = y[..., 12] - (jj00 * bi0 + jj01 * bi1)
    wv1 = y[..., 13] - (jj01 * bi0 + jj11 * bi1)
    E0 = w00 * wv0 + w10 * wv1 + x[..., 12]
    E1 = w01 * wv0 + w11 * wv1 + x[..., 13]
    # J = sym(W^T (J_j A_i)) + J_i
    q00 = jj00 * ai00 + jj01 * ai10
    q01 = jj00 * ai01 + jj01 * ai11
    q10 = jj01 * ai00 + jj11 * ai10
    q11 = jj01 * ai01 + jj11 * ai11
    J00 = w00 * q00 + w10 * q10
    J01 = w00 * q01 + w10 * q11
    J10 = w01 * q00 + w11 * q10
    J11 = w01 * q01 + w11 * q11
    return jnp.stack(
        [
            A00, A01, A10, A11,
            b0, b1,
            c00, c01, c11,
            J00 + x[..., 9], 0.5 * (J01 + J10) + x[..., 10],
            J11 + x[..., 11],
            E0, E1,
        ],
        axis=-1,
    )


def _unflat2_moments(b0, b1, c00, c01, c11):
    b = jnp.stack([b0, b1], -1)
    C = jnp.stack(
        [jnp.stack([c00, c01], -1), jnp.stack([c01, c11], -1)], -2
    )
    return b, C


def _flat2_filtering_final(x, y):
    """Distribute-stage combine emitting only (b, C) — unflattened for the
    downstream consumers; skips the A/eta/J output algebra entirely."""
    _, _, (b0, b1), (c00, c01, c11) = _flat2_moments(x, y)
    return _unflat2_moments(b0, b1, c00, c01, c11)


def _flat2_project_filter(x):
    return _unflat2_moments(
        x[..., 4], x[..., 5], x[..., 6], x[..., 7], x[..., 8]
    )


def _flat2_from_smoother_elems(e: "_SmootherElems") -> jnp.ndarray:
    """[.., 9] = [E00 E01 E10 E11 | g0 g1 | L00 L01 L11]."""
    E, g, L = e
    return jnp.concatenate(
        [
            E.reshape(E.shape[:-2] + (4,)),
            g,
            jnp.stack([L[..., 0, 0], L[..., 0, 1], L[..., 1, 1]], -1),
        ],
        axis=-1,
    )


def _ident_flat2_smoother(dtype):
    return jnp.asarray([1, 0, 0, 1, 0, 0, 0, 0, 0], dtype)


def _flat2_smoothing_moments(a, b):
    """(g, L sym) of the reverse-scan combine: a = ej (flipped-domain
    prefix, the real-time suffix), b = ei (earlier)."""
    ei00, ei01, ei10, ei11 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    gj0, gj1 = a[..., 4], a[..., 5]
    g0 = ei00 * gj0 + ei01 * gj1 + b[..., 4]
    g1 = ei10 * gj0 + ei11 * gj1 + b[..., 5]
    lj00, lj01, lj11 = a[..., 6], a[..., 7], a[..., 8]
    x00 = ei00 * lj00 + ei01 * lj01
    x01 = ei00 * lj01 + ei01 * lj11
    x10 = ei10 * lj00 + ei11 * lj01
    x11 = ei10 * lj01 + ei11 * lj11
    y00 = x00 * ei00 + x01 * ei01
    y01 = x00 * ei10 + x01 * ei11
    y10 = x10 * ei00 + x11 * ei01
    y11 = x10 * ei10 + x11 * ei11
    l00 = y00 + b[..., 6]
    l01 = 0.5 * (y01 + y10) + b[..., 7]
    l11 = y11 + b[..., 8]
    return (g0, g1), (l00, l01, l11)


def _flat2_smoothing_operator(a, b):
    (g0, g1), (l00, l01, l11) = _flat2_smoothing_moments(a, b)
    ei00, ei01, ei10, ei11 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    ej00, ej01, ej10, ej11 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    e00 = ei00 * ej00 + ei01 * ej10
    e01 = ei00 * ej01 + ei01 * ej11
    e10 = ei10 * ej00 + ei11 * ej10
    e11 = ei10 * ej01 + ei11 * ej11
    return jnp.stack(
        [e00, e01, e10, e11, g0, g1, l00, l01, l11], axis=-1
    )


def _flat2_smoothing_final(a, b):
    (g0, g1), (l00, l01, l11) = _flat2_smoothing_moments(a, b)
    g = jnp.stack([g0, g1], -1)
    L = jnp.stack(
        [jnp.stack([l00, l01], -1), jnp.stack([l01, l11], -1)], -2
    )
    return g, L


def _flat2_project_smoother(x):
    g = jnp.stack([x[..., 4], x[..., 5]], -1)
    L = jnp.stack(
        [
            jnp.stack([x[..., 6], x[..., 7]], -1),
            jnp.stack([x[..., 7], x[..., 8]], -1),
        ],
        -2,
    )
    return g, L


def _per_step_lml(A, Q, H, R, y, mask, ms, m0, P0, Ps):
    """Post-hoc vmapped per-step lml from one-step-ahead predictive moments
    (ref: `parallel_kalman_filter.py:303-334`). Also returns the predicted
    covariances P_pred[t] = P_{t|t-1} for the smoother to reuse."""
    # roll-not-slice: concat([x0[None], xs[:-1]]) is an offset-by-one slice
    # feeding batched matmuls — the 16x XLA-TPU fusion pathology (CLAUDE.md
    # rule 9); jnp.roll keeps full-length aligned layouts
    m_prev = jnp.roll(ms, 1, axis=0).at[0].set(m0)
    P_prev = jnp.roll(Ps, 1, axis=0).at[0].set(P0)
    m_pred = jnp.einsum("tij,tj->ti", A, m_prev)
    P_pred = bmm(bmm(A, P_prev), A, tb=True) + Q
    Hm = mask[..., :, None] * H
    mu = jnp.einsum("tpj,tj->tp", Hm, m_pred)
    S = bmm(bmm(Hm, P_pred), Hm, tb=True) + R
    return masked_mvn_logpdf(y, mu, S, mask), P_pred


@highest_precision
def parallel_kalman_filter(
    A, Q, H, R, y, m0, P0, mask=None, chunk_size: int | None = None
) -> FilterResult:
    """Parallel-scan Kalman filter. Same contract as `kalman.kalman_filter`.

    `chunk_size`: if set, runs an outer sequential scan over chunks of inner
    associative scans (exact — associativity makes the split lossless),
    bounding peak memory for very long series.
    """
    T = y.shape[0]
    d = m0.shape[-1]
    if mask is None:
        mask = observation_mask(y, P0.dtype)
    H_steps = jnp.broadcast_to(H, (T,) + H.shape[-2:]) if H.ndim == 2 else H

    if chunk_size is None or chunk_size >= T:
        elems = _build_filter_elements(A, Q, H_steps, R, y, mask, m0, P0)
        if d == 2:
            flat = _flat2_from_filter_elems(elems)
            scanned = jax.lax.associative_scan(
                _flat2_filtering_operator, flat
            )
            ms, Ps = _flat2_project_filter(scanned)
        else:
            scanned = jax.lax.associative_scan(_filtering_operator, elems)
            ms, Ps = scanned.b, scanned.C
    else:
        # Chunked mode: the inter-chunk carry is the FILTERED STATE (m, P) —
        # a sufficient statistic by Markovianity — not a combined element.
        # This (a) resets fp32 error accumulation at every chunk boundary
        # (element products across tens of thousands of steps go indefinite;
        # filtered states do not), (b) builds elements per chunk inside the
        # scan body, bounding peak memory to O(chunk * d^2), and (c) keeps
        # the XLA graph size constant in T.
        assert T % chunk_size == 0, "T must be divisible by chunk_size"
        n_chunks = T // chunk_size
        chunked = jax.tree_util.tree_map(
            lambda x: x.reshape((n_chunks, chunk_size) + x.shape[1:]),
            (A, Q, H_steps, R, y, mask),
        )

        def chunk_step(carry, inputs):
            m_prev, P_prev = carry
            A_c, Q_c, H_c, R_c, y_c, mask_c = inputs
            elems = _build_filter_elements(
                A_c, Q_c, H_c, R_c, y_c, mask_c, m_prev, P_prev
            )
            if d == 2:
                (ms_c, Ps_c), _ = _inner_scan_ex(
                    _flat2_filtering_operator,
                    _flat2_from_filter_elems(elems),
                    ident=_ident_flat2_filter(elems.A.dtype),
                    final_op=_flat2_filtering_final,
                    project=_flat2_project_filter,
                )
            else:
                (ms_c, Ps_c), _ = _inner_scan_ex(
                    _filtering_operator, elems,
                    ident=_ident_filter_elem(
                        elems.A.shape[-1], elems.A.dtype
                    ),
                    final_op=_filtering_final,
                    project=_project_filter_moments,
                )
            Ps_c = symmetrize(Ps_c)
            return (ms_c[-1], Ps_c[-1]), (ms_c, Ps_c)

        _, (ms, Ps) = jax.lax.scan(chunk_step, (m0, P0), chunked)
        ms = ms.reshape((T,) + ms.shape[2:])
        Ps = Ps.reshape((T,) + Ps.shape[2:])

    Ps = symmetrize(Ps)
    lmls, Pp = _per_step_lml(A, Q, H_steps, R, y, mask, ms, m0, P0, Ps)
    return FilterResult(ms=ms, Ps=Ps, lml=jnp.sum(lmls), lmls=lmls, Pp=Pp)


class _SmootherElems(NamedTuple):
    E: jnp.ndarray  # [T, d, d]
    g: jnp.ndarray  # [T, d]
    L: jnp.ndarray  # [T, d, d]


def _smoothing_operator(ej: _SmootherElems, ei: _SmootherElems) -> _SmootherElems:
    """Combine for the reverse scan: result(i ∘ j) with i earlier than j.

    Fused Pallas kernel on TPU for mid-size d (see _filtering_operator)."""
    from .pallas.fused_combine import fused_smoothing_combine, use_fused_combine

    if (
        ej.E.ndim == 3
        and ej.E.shape == ei.E.shape
        and use_fused_combine(ej.E.shape)
    ):
        return fused_smoothing_combine(ej, ei)
    return _smoothing_operator_xla(ej, ei)


def _smoothing_operator_xla(ej: _SmootherElems, ei: _SmootherElems) -> _SmootherElems:
    g, L = _smoothing_final(ej, ei)
    E = bmm(ei.E, ej.E)
    return _SmootherElems(E=E, g=g, L=L)


def _smoothing_final(ej: _SmootherElems, ei: _SmootherElems):
    """Distribute-stage combine emitting only the smoothed moments (g, L)
    — the chained-gain output E is dead past the last combine."""
    g = jnp.einsum("...ij,...j->...i", ei.E, ej.g) + ei.g
    L = symmetrize(bmm(bmm(ei.E, ej.L), ei.E, tb=True) + ei.L)
    return g, L


def _project_smoother_moments(e: _SmootherElems):
    return e.g, e.L


@highest_precision
def parallel_rts_smoother(
    A, Q, filtered: FilterResult, chunk_size: int | None = None
) -> SmootherResult:
    """Parallel-scan RTS smoother (ref: `parallel_rts_smoother.py:26-103`).

    `chunk_size` runs a reverse outer `lax.scan` over chunks of inner
    associative scans (exact, like the filter's chunked mode). Besides
    bounding memory, this keeps the traced graph size constant in T — at
    T ~ 100k an unchunked scan costs tens of minutes of XLA compile time,
    a chunked one compiles in seconds.
    """
    ms, Ps = filtered.ms, filtered.Ps
    T, d = ms.shape
    dtype = Ps.dtype

    # Elements for k < T-1 use (A_{k+1}, Q_{k+1}). Shift via jnp.roll at FULL
    # length T, then overwrite the k = T-1 boundary — NEVER via A[1:]/Ps[:-1]
    # offset slices: an offset-by-one leading slice fused into the downstream
    # batched solve hits a pathological XLA-TPU path (measured 940 ms vs
    # 57 ms at T=4k, d=32 — 16x — when composed with the in-graph filter).
    # roll[-1] pairs A[0] = I, Q[0] = 0 with Ps[-1] (the dt_0 = 0 build
    # convention), so the junk element stays well-conditioned before fixup.
    A_next = jnp.roll(A, -1, axis=0)
    m_pred = jnp.einsum("tij,tj->ti", A_next, ms)
    AP = bmm(A_next, Ps)
    if filtered.Pp is not None:
        # the filter's lml pass already built P_{t+1|t} = A_{t+1} P_t A^T +
        # Q_{t+1} (= its Pp[t+1]); roll instead of recomputing (2 T-wide
        # bmm). roll[-1] lands Pp[0] — PSD junk, overwritten by the fixup.
        P_pred = jnp.roll(filtered.Pp, -1, axis=0)
    else:
        Q_next = jnp.roll(Q, -1, axis=0)
        P_pred = bmm(AP, A_next, tb=True) + Q_next
    E = jnp.swapaxes(psd_solve(P_pred, AP), -1, -2)
    g = ms - jnp.einsum("tij,tj->ti", E, m_pred)
    EP = bmm(E, P_pred)
    L = symmetrize(Ps - bmm(EP, E, tb=True))

    E = E.at[-1].set(jnp.zeros((d, d), dtype))
    g = g.at[-1].set(ms[-1])
    L = L.at[-1].set(Ps[-1])
    elems = _SmootherElems(E=E, g=g, L=L)

    # Run the suffix combine as FLIP + FORWARD scans + FLIP. reverse=True
    # scans hit a pathological slow path on TPU (measured 27x slower than
    # the flipped forward equivalent, bit-identical results): two O(T)
    # contiguous copies buy fully-forward iteration everywhere. Operator
    # argument order is unchanged — in the flipped domain the "prefix" is
    # the real-time suffix, which is exactly _smoothing_operator's ej.
    if d == 2:
        flipped = _flat2_from_smoother_elems(elems)[::-1]
    else:
        flipped = jax.tree_util.tree_map(lambda x: x[::-1], elems)
    if chunk_size is None or chunk_size >= T:
        if d == 2:
            scanned = jax.lax.associative_scan(
                _flat2_smoothing_operator, flipped
            )
            gs, Ls = _flat2_project_smoother(scanned)
        else:
            scanned = jax.lax.associative_scan(_smoothing_operator, flipped)
            gs, Ls = scanned.g, scanned.L
    else:
        assert T % chunk_size == 0, "T must be divisible by chunk_size"
        n_chunks = T // chunk_size
        chunked = jax.tree_util.tree_map(
            lambda x: x.reshape((n_chunks, chunk_size) + x.shape[1:]), flipped
        )

        def chunk_step(carry, chunk_elems):
            # inter-chunk carry folds into the scan's block-totals pass
            # (`init=`), replacing the former extra full-width combine
            if d == 2:
                (g_c, L_c), last = _inner_scan_ex(
                    _flat2_smoothing_operator, chunk_elems,
                    ident=_ident_flat2_smoother(chunk_elems.dtype),
                    final_op=_flat2_smoothing_final,
                    project=_flat2_project_smoother,
                    init=carry,
                )
            else:
                (g_c, L_c), last = _inner_scan_ex(
                    _smoothing_operator, chunk_elems,
                    ident=_ident_smoother_elem(
                        chunk_elems.E.shape[-1], chunk_elems.E.dtype
                    ),
                    final_op=_smoothing_final,
                    project=_project_smoother_moments,
                    init=carry,
                )
            return last, (g_c, L_c)

        if d == 2:
            init = _ident_flat2_smoother(dtype)
        else:
            init = _SmootherElems(
                E=jnp.eye(d, dtype=dtype),
                g=jnp.zeros((d,), dtype),
                L=jnp.zeros((d, d), dtype),
            )
        _, (gs, Ls) = jax.lax.scan(chunk_step, init, chunked)
        gs = gs.reshape((T,) + gs.shape[2:])
        Ls = Ls.reshape((T,) + Ls.shape[2:])
    gs = gs[::-1]
    Ls = Ls[::-1]
    # lag-one gains: E already carries [E_0..E_{T-2}, 0] after the fixup
    return SmootherResult(ms=gs, Ps=symmetrize(Ls), Gs=E)

def prefix_combine(op, elems, length: int):
    """Inclusive prefix combine (Hillis-Steele recursive doubling).

    EXPERIMENTAL alternative to `jax.lax.associative_scan`: uses only
    contiguous slices (no even/odd restructuring), measured ~5x faster in
    isolated chunk benchmarks at d=32 — but the full T=100k graph built with
    it crashes the TPU worker on the current runtime ("kernel fault"), so the
    shipped filters stay on associative_scan. Revisit when the runtime
    updates. op(a, b) combines a (earlier prefix) into b (current).
    """
    import jax as _jax
    import jax.numpy as _jnp

    x = elems
    k = 1
    while k < length:
        earlier = _jax.tree_util.tree_map(lambda a: a[:-k], x)
        later = _jax.tree_util.tree_map(lambda a: a[k:], x)
        comb = op(earlier, later)
        x = _jax.tree_util.tree_map(
            lambda full, c: _jnp.concatenate([full[:k], c]), x, comb
        )
        k *= 2
    return x

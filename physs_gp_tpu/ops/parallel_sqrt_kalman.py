"""Parallel (associative-scan) SQUARE-ROOT Kalman filter/smoother.

Square-root formulation of temporal parallelisation following Yaghoobi,
Corenflos, Hassan & Särkkä (parallel square-root filtering/smoothing; see
PAPERS.md "Parallel square-root statistical linear regression" and "Parallel
Iterated Extended and Sigma-point Kalman Smoothers"): the filtering elements
carry triangular factors (A, b, U, eta, Z) with C = U U^T, J = Z Z^T, and the
associative combine works entirely in QR/Woodbury form — no PSD subtraction,
no covariance ever formed. This is the fp32-robust default for long series
with tight observation noise on TPU, where the covariance-form combine goes
indefinite (observed: NaN at T ~ 4k on spatio-temporal states).

Dense-form reference for the combine identities:
    A = A2 (I + C1 J2)^-1 A1,
    (I + C1 J2)^-1      = I - U1 M^-1 G Z2^T,      G = U1^T Z2, M = I + G G^T
    (I + C1 J2)^-1 C1   = (U1 Xi^-T)(U1 Xi^-T)^T,  Xi = chol(M) = tria([G, I])
    (I + J2 C1)^-1 J2   = (Z2 Lam^-T)(Z2 Lam^-T)^T, Lam = tria([G^T, I]).

Chunked mode carries the filtered (m, U) state between chunks (sufficient by
Markovianity — resets error, bounds memory, constant graph size in T).
"""
from __future__ import annotations

import math

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .kalman import FilterResult, SmootherResult, observation_mask
from .matrix import bmm, highest_precision
from .sqrt_kalman import _sqrt_update, tria, tria_sum

__all__ = [
    "parallel_sqrt_kalman_filter",
    "parallel_sqrt_rts_smoother",
    "sqrt_smoother_elements",
]

_LOG2PI = math.log(2.0 * math.pi)


class _SqrtFilterElems(NamedTuple):
    A: jnp.ndarray  # [T, d, d]
    b: jnp.ndarray  # [T, d]
    U: jnp.ndarray  # [T, d, d]  C = U U^T
    eta: jnp.ndarray  # [T, d]
    Z: jnp.ndarray  # [T, d, d]  J = Z Z^T


def _solve_tri(L, B, lower=True):
    """Batched triangular solve.

    XLA:TPU's batched TriangularSolve is catastrophically slow at tiny d —
    measured 3.5 ms PER MATRIX at [5000, 32, 32] vs 775 ns through the
    Pallas lane-batched Gauss-Jordan (4500x; `scripts/profile/bench_trisolve.py`,
    round 3) — it was the entire sqrt-path tax. GJ on a triangular system
    pivots on the diagonal (exact zeros above/below), matching
    solve_triangular to 3.4e-7 relative on the combine's chol(I + G G^T)
    factors. Routed through `gen_solve` (shape-gated Pallas on TPU, LU
    fallback elsewhere, differentiable custom VJP).
    """
    from .matrix import gen_solve
    from .pallas.batched_linalg import use_pallas_linalg

    if L.ndim == 3 and B.ndim == 3 and use_pallas_linalg(L.shape):
        return gen_solve(L, B)
    return jax.scipy.linalg.solve_triangular(L, B, lower=lower)


def _build_sqrt_elements(A, Q_sqrt, H, R_sqrt, y, mask, m0, U0):
    """Vectorised sqrt filtering elements for all T steps (prior folded into
    element 0).

    All ops are [p|d]-row lane-batched primitives. The historical
    (p+d)-row joint pre-array tria falls off the Pallas LQ gate (rows > 48)
    onto XLA's ~20 us/matrix batched QR — measured to DOMINATE the whole
    sqrt filter at T-wide batches. Instead:

      S^1/2  = tria([H Up, R^1/2])          p-row LQ (info-side: exact
                                            orthogonal transform, resolves
                                            the full scale/noise spread)
      K S^1/2 = Up (S^-1/2 H Up)^T          triangular solves vs S^1/2
                                            (cond ~ sqrt(cond S))
      U'     = tria_sum((I-KH) Up, K R^1/2) JOSEPH form: a PSD sum, valid
                                            for ANY K, so it tolerates the
                                            solve roundoff in K and routes
                                            to the fused chol-of-Gram
                                            kernel (covariance-side safe)
      Z      = tria(A^T (S^-1/2 H)^T)       p-row LQ (info-side)
    """
    T, d = y.shape[0], m0.shape[-1]
    p = y.shape[1]
    dtype = U0.dtype
    y0 = jnp.where(mask > 0, jnp.nan_to_num(y), 0.0)
    Hm = mask[..., :, None] * H  # [T, p, d]
    # masked R_sqrt with identity filler on the diagonal for masked rows:
    Rs_m = mask[..., :, None] * R_sqrt * mask[..., None, :] + jnp.einsum(
        "tp,pq->tpq", 1.0 - mask, jnp.eye(p, dtype=dtype)
    )

    # local prior sqrt: generic steps Qs_k; first step tria([A0 U0, Qs_0])
    Up_loc = Q_sqrt.at[0].set(
        tria(jnp.concatenate([A[0] @ U0, Q_sqrt[0]], axis=-1))
    )
    m_loc = jnp.zeros((T, d), dtype).at[0].set(A[0] @ m0)

    HU = jnp.einsum("tpi,tij->tpj", Hm, Up_loc)  # [T, p, d]
    # [HU, Rs] has full row rank (Rs diag > 0 incl. masked identity filler)
    L_S = tria(jnp.concatenate([HU, Rs_m], axis=-1), assume_full_rank=True)

    v = y0 - jnp.einsum("tpj,tj->tp", Hm, m_loc)
    # ONE batched solve against L_S for all four right-hand sides (each GJ /
    # triangular-solve launch re-eliminates the same L_S; extra RHS columns
    # ride along in the same pass):
    sol = _solve_tri(
        L_S, jnp.concatenate([v[..., None], HU, Hm, Rs_m], axis=-1)
    )
    Sv = sol[..., 0]  # S^-1/2 v
    N = sol[..., 1 : 1 + d]  # [T, p, d] = S^-1/2 H Up
    M = sol[..., 1 + d : 1 + 2 * d]  # [T, p, d] = S^-1/2 H
    Rtil = sol[..., 1 + 2 * d :]  # [T, p, p] = S^-1/2 R^1/2
    KS = bmm(Up_loc, N, tb=True)  # K S^1/2 = Up N^T
    b_out = m_loc + jnp.einsum("tip,tp->ti", KS, Sv)
    KH = bmm(KS, M)  # K Hm
    A_out = A - jnp.einsum("tij,tjk->tik", KH, A)

    # Joseph-form posterior factor: U' U'^T = (I-KH) P (I-KH)^T + K R K^T
    U_out = tria_sum(Up_loc - bmm(KH, Up_loc), bmm(KS, Rtil))

    # eta = A^T Hm^T S^-1 v = A^T (M^T Sv); Z = tria(A^T M^T)
    w_e = jnp.einsum("tpi,tp->ti", M, Sv)  # H^T S^-1 v
    eta = jnp.einsum("tji,tj->ti", A, w_e)
    Z = tria(bmm(A, M, ta=True, tb=True))

    # first element: A = 0, eta = 0, Z = 0 (prior folded into b, U)
    A_out = A_out.at[0].set(jnp.zeros((d, d), dtype))
    eta = eta.at[0].set(jnp.zeros((d,), dtype))
    Z = Z.at[0].set(jnp.zeros((d, d), dtype))
    return _SqrtFilterElems(A=A_out, b=b_out, U=U_out, eta=eta, Z=Z)


def _broadcast_batch(e1, e2):
    """Broadcast two element pytrees to a common batch shape (the chunked /
    sharded combines apply a [1, ...] carry against a [chunk, ...] scan; the
    concatenate-based sqrt algebra needs real matching shapes, unlike the
    einsum-only covariance operator)."""
    b1 = jax.tree_util.tree_leaves(e1)[0].shape[:-2]
    b2 = jax.tree_util.tree_leaves(e2)[0].shape[:-2]
    if b1 == b2:
        return e1, e2
    batch = jnp.broadcast_shapes(b1, b2)

    def fix(x):
        # vectors [batch, d] vs matrices [batch, d, d]
        core = 1 if x.ndim == len(b1) + 1 else 2
        return jnp.broadcast_to(x, batch + x.shape[x.ndim - core:])

    return (
        jax.tree_util.tree_map(fix, e1),
        jax.tree_util.tree_map(fix, e2),
    )


def _sqrt_filtering_moments(e1, e2, G=None, W1=None, XiG=None):
    """Shared core of the sqrt filtering combine: the moment outputs (b, U)
    plus the A2W1 intermediate the full operator's A output builds on — ONE
    implementation so the reduced distribute combine cannot desynchronize
    from the scan operator. Inputs must already be batch-broadcast.

    `W1`/`XiG` optionally inject the full operator's precomputed Woodbury
    solves (it batches them with the Lam-side solves in one launch). When
    absent (the distribute-stage reduced combine), the solve runs NARROW:
    the moments need the full W1 = U1 Xi^-T but only the VECTOR
    Gz = Xi^-1 G (Z2^T u) — d+1 right-hand-side columns instead of the full
    operator's 2d (the distribute pass runs at full chunk width, so the
    saved columns are the whole chunk wide)."""
    d = e1.A.shape[-1]
    dtype = e1.A.dtype
    if G is None:
        G = bmm(e1.U, e2.Z, ta=True)  # U1^T Z2 [d, d]
    # u = b1 + U1 U1^T eta2;  Z2^T u feeds the b-correction on both paths
    u = e1.b + jnp.einsum("...ij,...kj,...k->...i", e1.U, e1.U, e2.eta)
    Z2tu = jnp.einsum("...kj,...k->...j", e2.Z, u)
    if W1 is None:
        eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype), e1.A.shape)
        # info-side Woodbury factors stay on the LQ (chol-of-Gram cannot
        # resolve ||G||^2 > 1/eps spreads — see ops/pallas/batched_chol.py);
        # [G, I] has full row rank, so the regularisation block is skipped
        Xi = tria(jnp.concatenate([G, eye], axis=-1), assume_full_rank=True)
        vec = jnp.einsum("...ij,...j->...i", G, Z2tu)  # G Z2^T u
        sol = _solve_tri(
            Xi,
            jnp.concatenate(
                [jnp.swapaxes(e1.U, -1, -2), vec[..., None]], axis=-1
            ),
        )
        W1 = jnp.swapaxes(sol[..., :d], -1, -2)
        Gz = sol[..., d]  # Xi^-1 G Z2^T u
    else:
        Gz = jnp.einsum("...ij,...j->...i", XiG, Z2tu)
    A2W1 = bmm(e2.A, W1)
    # b = b2 + A2 (u - W1 Xi^-1 G Z2^T u)
    b = e2.b + jnp.einsum(
        "...ij,...j->...i", e2.A, u - jnp.einsum("...ij,...j->...i", W1, Gz)
    )
    U = tria_sum(A2W1, e2.U)
    return A2W1, b, U


def _sqrt_filtering_operator(e1, e2):
    """Associative combine in square-root form (e1 earlier, e2 later).

    Launch-count discipline (the sqrt-path tax is per-kernel overhead at
    lane-batched shapes, not FLOPs): the Xi/Lam Woodbury twins are ONE LQ
    call on the batch-stacked pre-arrays, and ALL FOUR triangular solves
    (W1+XiG against Xi, V2+lg against Lam) ride the same batch stack in ONE
    launch — every right-hand side depends only on combine inputs, so
    nothing forces the two factors' solves apart. The Lam-side RHS is
    zero-padded from d+1 to the Xi-side's 2d columns (dead columns through
    the lane-batched Gauss-Jordan are cheaper than a second launch)."""
    e1, e2 = _broadcast_batch(e1, e2)
    d = e1.A.shape[-1]
    dtype = e1.A.dtype
    eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype), e1.A.shape)
    G = bmm(e1.U, e2.Z, ta=True)  # U1^T Z2 [d, d]
    Gt = jnp.swapaxes(G, -1, -2)
    # eta-path pre-solve quantities (input-only):
    # w = eta2 - Z2 Z2^T b1, then G^T U1^T w
    w = e2.eta - jnp.einsum("...ij,...kj,...k->...i", e2.Z, e2.Z, e1.b)
    GtU1tw = jnp.einsum("...ji,...kj,...k->...i", G, e1.U, w)  # G^T U1^T w
    rhs_xi = jnp.concatenate([jnp.swapaxes(e1.U, -1, -2), G], axis=-1)
    rhs_lam = jnp.concatenate(
        [jnp.swapaxes(e2.Z, -1, -2), GtU1tw[..., None]], axis=-1
    )
    if G.ndim >= 3:
        # Xi = tria([G, I]) and Lam = tria([G^T, I]) in one batched LQ —
        # stacked along the batch axis, so one kernel launch serves both;
        # their solves stack the same way into one Gauss-Jordan launch
        nb = G.shape[-3]
        pre = jnp.concatenate(
            [
                jnp.concatenate([G, eye], axis=-1),
                jnp.concatenate([Gt, eye], axis=-1),
            ],
            axis=-3,
        )
        XiLam = tria(pre, assume_full_rank=True)
        pad = jnp.zeros(rhs_lam.shape[:-1] + (d - 1,), dtype)
        sol = _solve_tri(
            XiLam,
            jnp.concatenate(
                [rhs_xi, jnp.concatenate([rhs_lam, pad], axis=-1)], axis=-3
            ),
        )
        sol_xi = sol[..., :nb, :, :]
        sol_lam = sol[..., nb:, :, :]
    else:
        Xi = tria(jnp.concatenate([G, eye], axis=-1), assume_full_rank=True)
        Lam = tria(jnp.concatenate([Gt, eye], axis=-1), assume_full_rank=True)
        sol_xi = _solve_tri(Xi, rhs_xi)
        sol_lam = _solve_tri(Lam, rhs_lam)
    W1 = jnp.swapaxes(sol_xi[..., :d], -1, -2)  # U1 Xi^-T
    XiG = sol_xi[..., d:]  # Xi^-1 G
    V2t = sol_lam[..., :d]  # Lam^-1 Z2^T  (V2 = Z2 Lam^-T = V2t^T)
    lg = sol_lam[..., d]  # Lam^-1 G^T U1^T w
    A2W1, b, U = _sqrt_filtering_moments(e1, e2, G=G, W1=W1, XiG=XiG)

    # A = A2 A1 - (A2 W1) (Xi^-1 G) (Z2^T A1)
    Z2tA1 = bmm(e2.Z, e1.A, ta=True)
    A = bmm(e2.A, e1.A) - bmm(bmm(A2W1, XiG), Z2tA1)
    corr = jnp.einsum("...ji,...j->...i", V2t, lg)
    eta = e1.eta + jnp.einsum("...ji,...j->...i", e1.A, w - corr)

    # info-side: LQ (see Xi/Lam note); rank-deficient (zeroed) inputs need
    # tria's regularised/zero-bypass path. A1^T V2 = (V2t A1)^T in-kernel.
    Z = tria(jnp.concatenate([bmm(e1.A, V2t, ta=True, tb=True), e1.Z],
                             axis=-1))
    return _SqrtFilterElems(A=A, b=b, U=U, eta=eta, Z=Z)


def _sqrt_filtering_final(e1, e2):
    """Distribute-stage combine emitting only the filtered moments (b, U).

    Skips the full combine's A (two bmm), eta (Lam/V2 LQ+solves, einsums)
    and Z (the regularised-path tria, the combine's most expensive op) —
    all dead past the blocked scan's one full-width distribute pass."""
    e1, e2 = _broadcast_batch(e1, e2)
    *_, b, U = _sqrt_filtering_moments(e1, e2)
    return b, U


def _project_sqrt_filter_moments(e: _SqrtFilterElems):
    return e.b, e.U


def _per_step_lml_sqrt(A, Q_sqrt, H, R_sqrt, y, mask, ms, m0, U0, Us):
    """Post-hoc per-step lml from sqrt predictive factors. Also returns the
    predicted factors Up[t] = P_{t|t-1}^{1/2} for the smoother to reuse."""
    T, d = ms.shape
    p = y.shape[1]
    dtype = Us.dtype
    # roll-not-slice (CLAUDE.md rule 9): aligned full-length layouts
    m_prev = jnp.roll(ms, 1, axis=0).at[0].set(m0)
    U_prev = jnp.roll(Us, 1, axis=0).at[0].set(U0)
    m_pred = jnp.einsum("tij,tj->ti", A, m_prev)
    Up = tria_sum(bmm(A, U_prev), Q_sqrt)
    Hm = mask[..., :, None] * H
    Rs_m = mask[..., :, None] * R_sqrt * mask[..., None, :] + jnp.einsum(
        "tp,pq->tpq", 1.0 - mask, jnp.eye(p, dtype=dtype)
    )
    S_sqrt = tria(jnp.concatenate([bmm(Hm, Up), Rs_m], axis=-1),
                  assume_full_rank=True)
    y0 = jnp.where(mask > 0, jnp.nan_to_num(y), 0.0)
    v = y0 - jnp.einsum("tpj,tj->tp", Hm, m_pred)
    alpha = _solve_tri(S_sqrt, v[..., None])[..., 0]
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(S_sqrt, axis1=-2, axis2=-1))), -1
    )
    n_obs = jnp.sum(mask, -1)
    lmls = -0.5 * (jnp.sum(alpha * alpha, -1) + logdet + n_obs * _LOG2PI)
    return lmls, Up


@highest_precision
def parallel_sqrt_kalman_filter(
    A, Q_sqrt, H, R_sqrt, y, m0, P0_sqrt, mask=None,
    chunk_size: int | None = None,
) -> FilterResult:
    """Parallel-scan square-root filter. Ps in the result are SQRT factors."""
    T = y.shape[0]
    if mask is None:
        mask = observation_mask(y, P0_sqrt.dtype)
    H_steps = jnp.broadcast_to(H, (T,) + H.shape[-2:]) if H.ndim == 2 else H

    if chunk_size is None or chunk_size >= T:
        elems = _build_sqrt_elements(
            A, Q_sqrt, H_steps, R_sqrt, y, mask, m0, P0_sqrt
        )
        scanned = jax.lax.associative_scan(_sqrt_filtering_operator, elems)
        ms, Us = scanned.b, scanned.U
    else:
        assert T % chunk_size == 0, "T must be divisible by chunk_size"
        n_chunks = T // chunk_size
        chunked = jax.tree_util.tree_map(
            lambda x: x.reshape((n_chunks, chunk_size) + x.shape[1:]),
            (A, Q_sqrt, H_steps, R_sqrt, y, mask),
        )

        def chunk_step(carry, inputs):
            m_prev, U_prev = carry
            A_c, Qs_c, H_c, Rs_c, y_c, mask_c = inputs
            elems = _build_sqrt_elements(
                A_c, Qs_c, H_c, Rs_c, y_c, mask_c, m_prev, U_prev
            )
            from .parallel_kalman import _inner_scan_ex

            dd, dt = elems.A.shape[-1], elems.A.dtype
            (ms_c, Us_c), _ = _inner_scan_ex(
                _sqrt_filtering_operator, elems,
                ident=_SqrtFilterElems(
                    A=jnp.eye(dd, dtype=dt), b=jnp.zeros((dd,), dt),
                    U=jnp.zeros((dd, dd), dt), eta=jnp.zeros((dd,), dt),
                    Z=jnp.zeros((dd, dd), dt),
                ),
                final_op=_sqrt_filtering_final,
                project=_project_sqrt_filter_moments,
            )
            return (ms_c[-1], Us_c[-1]), (ms_c, Us_c)

        _, (ms, Us) = jax.lax.scan(chunk_step, (m0, P0_sqrt), chunked)
        ms = ms.reshape((T,) + ms.shape[2:])
        Us = Us.reshape((T,) + Us.shape[2:])

    lmls, Up = _per_step_lml_sqrt(
        A, Q_sqrt, H_steps, R_sqrt, y, mask, ms, m0, P0_sqrt, Us
    )
    return FilterResult(ms=ms, Ps=Us, lml=jnp.sum(lmls), lmls=lmls, Pp=Up)


def _factor_psd(L):
    """Factor a PSD covariance for downstream PSD projections.

    On the TPU Pallas path: NO added jitter — the lane-batched Cholesky
    pivot-floors per row at a few ULPs of that row's ORIGINAL diagonal
    (scale-invariant), so tight-noise variances orders below the global
    scale survive where `safe_cholesky`'s fp32 absolute 1e-6 jitter would
    swamp them. XLA fallback (CPU fp64 tests): the tiny per-dtype jitter
    (1e-12) guards exactly-singular PSD sums (noiseless-Q dynamics) from
    NaN-ing `jnp.linalg.cholesky`."""
    from .matrix import _cholesky_any, safe_cholesky, symmetrize
    from .pallas.batched_chol import use_pallas_chol

    if use_pallas_chol(L.shape):
        return _cholesky_any(symmetrize(L), assume_psd=True)
    return safe_cholesky(L)


def sqrt_smoother_elements(A_next, Qs_next, ms, Us, Pp_sqrt=None):
    """Gram-form Joseph smoothing elements (G, g, L22) at FULL length.

    All [p|d]-row lane ops (the historical [[A U, Qs], [U, 0]] 2d-row joint
    pre-array tria falls off the Pallas LQ gate onto XLA's batched QR and
    its [T, 2d, 2d+reg] transpose OOMs HBM at T = 100k):
      Pp^1/2 = tria_sum(A U, Qs)            chol-of-Gram (covariance-side)
      G      = P A^T Pp^-1                  ONE GJ launch (the factor
                                            inverse; the only
                                            ill-conditioned inverse here
                                            stays on the factor) + 2 bmms
      L22    = (I-GA) P (I-GA)^T + G Q G^T  JOSEPH covariance, exact:
               = P - G Pp G^T without the subtraction — emitted as the
               GRAM (two einsums); the scan consumes covariances directly

    The gain applies Pp^-1 = Linv^T Linv with Linv from a single GJ launch:
    two SEQUENTIAL dependent triangular-solve launches at [T, d, d]
    dominated the whole smoother stage (each lane-batched GJ launch costs
    the same whether its RHS is AP or I; the two bmms that replace the
    second launch ride the MXU an order of magnitude cheaper per matrix).
    Conditioning is unchanged — the elimination still runs on the
    triangular factor (cond sqrt(cond Pp)), not the squared Gram.

    Inputs are the k -> k+1 rolled (A, Qs): entry [-1] pairs wrap-around
    junk — callers overwrite it with their boundary element. `Pp_sqrt`
    optionally supplies the predicted factors (the filters' lml pass
    already built them; see FilterResult.Pp)."""
    from .matrix import symmetrize

    AU = bmm(A_next, Us)
    if Pp_sqrt is None:
        Pp_sqrt = tria_sum(AU, Qs_next)
    AP = bmm(AU, Us, tb=True)  # A P
    eye = jnp.broadcast_to(
        jnp.eye(Pp_sqrt.shape[-1], dtype=Pp_sqrt.dtype), Pp_sqrt.shape
    )
    Linv = _solve_tri(Pp_sqrt, eye)  # Pp^-1/2, one lane-batched GJ launch
    Gt = bmm(Linv, bmm(Linv, AP), ta=True)  # Pp^-1 A P
    G = jnp.swapaxes(Gt, -1, -2)
    WU = Us - bmm(G, AU)  # (I - G A) U
    GQ = bmm(G, Qs_next)
    L22 = symmetrize(bmm(WU, WU, tb=True) + bmm(GQ, GQ, tb=True))
    m_pred = jnp.einsum("tij,tj->ti", A_next, ms)
    g = ms - jnp.einsum("tij,tj->ti", G, m_pred)
    return G, g, L22


@highest_precision
def parallel_sqrt_rts_smoother(
    A, Q_sqrt, filtered: FilterResult, chunk_size: int | None = None
) -> SmootherResult:
    """Parallel-scan smoother for the sqrt pipeline; filtered.Ps must be
    sqrt factors. Returns COVARIANCE Ps plus the factors in Ls.

    The scan itself runs in covariance (Gram) form with the covariance
    smoother's einsum-only combine, then factors ONCE at the end (one
    T-wide lane-batched Cholesky). This is numerically equivalent to the
    factored combine — the smoother combine is a PSD SUM (congruence
    E L E^T plus a PSD term, no subtraction), and the factored combine's
    per-level `tria_sum` is chol-of-Gram on exactly the same sums, so it
    re-forms this Gram at every level anyway — but drops a batched
    Cholesky from every combine of every scan level (measured: the factored
    smoother stage ran 2.54x the covariance stage; ~60% of the sqrt tax).
    The filter (the part that actually goes indefinite in covariance form —
    its combine subtracts through the Woodbury J-terms) stays fully
    factored; so does the smoother gain solve (vs the predicted factor)."""
    from .parallel_kalman import (
        _inner_scan_ex,
        _project_smoother_moments,
        _SmootherElems,
        _smoothing_final,
        _smoothing_operator,
    )

    ms, Us = filtered.ms, filtered.Ps
    T, d = ms.shape
    dtype = Us.dtype

    # Full-length roll shift (k -> k+1), boundary fixed up after — offset
    # slices A[1:]/Us[:-1] fused into the downstream tria/solve hit a 16x
    # pathological XLA-TPU path (see parallel_kalman.parallel_rts_smoother).
    # roll[-1] pairs A[0] = I, Qs[0] = 0 with Us[-1]: well-conditioned junk.
    A_next = jnp.roll(A, -1, axis=0)
    Qs_next = jnp.roll(Q_sqrt, -1, axis=0)
    # the filter's lml pass already built Up[t] = P_{t|t-1}^{1/2}; the
    # smoother's Pp_sqrt[t] is Up[t+1] — roll instead of redoing the
    # T-wide chol-of-Gram. roll[-1] lands Up[0] (triangular, nonsingular
    # junk), overwritten by the boundary fixup.
    Pp_sqrt = (
        jnp.roll(filtered.Pp, -1, axis=0) if filtered.Pp is not None else None
    )
    G, g, L22 = sqrt_smoother_elements(A_next, Qs_next, ms, Us, Pp_sqrt)

    E = G.at[-1].set(jnp.zeros((d, d), dtype))
    g = g.at[-1].set(ms[-1])
    L = L22.at[-1].set(Us[-1] @ Us[-1].T)
    elems = _SmootherElems(E=E, g=g, L=L)

    # flip + forward scans (reverse=True is ~27x slower on TPU; see
    # parallel_kalman.parallel_rts_smoother)
    flipped = jax.tree_util.tree_map(lambda x: x[::-1], elems)
    if chunk_size is None or chunk_size >= T:
        scanned = jax.lax.associative_scan(_smoothing_operator, flipped)
        gs, Ls_cov = scanned.g, scanned.L
    else:
        assert T % chunk_size == 0
        n_chunks = T // chunk_size
        chunked = jax.tree_util.tree_map(
            lambda x: x.reshape((n_chunks, chunk_size) + x.shape[1:]), flipped
        )

        def chunk_step(carry, chunk_elems):
            dd, dt = chunk_elems.E.shape[-1], chunk_elems.E.dtype
            # carry folds into the block-totals pass (init=), replacing the
            # former extra full-width combine per chunk
            (g_c, L_c), last = _inner_scan_ex(
                _smoothing_operator, chunk_elems,
                ident=_SmootherElems(
                    E=jnp.eye(dd, dtype=dt), g=jnp.zeros((dd,), dt),
                    L=jnp.zeros((dd, dd), dt),
                ),
                final_op=_smoothing_final,
                project=_project_smoother_moments,
                init=carry,
            )
            return last, (g_c, L_c)

        init = _SmootherElems(
            E=jnp.eye(d, dtype=dtype),
            g=jnp.zeros((d,), dtype),
            L=jnp.zeros((d, d), dtype),
        )
        _, (gs, Ls_cov) = jax.lax.scan(chunk_step, init, chunked)
        gs = gs.reshape((T,) + gs.shape[2:])
        Ls_cov = Ls_cov.reshape((T,) + Ls_cov.shape[2:])
    gs = gs[::-1]
    Ls_cov = Ls_cov[::-1]
    # one T-wide factorization for downstream PSD projections (H Ls Grams)
    Ls_fac = _factor_psd(Ls_cov)
    # lag-one gains: E already carries [G_0..G_{T-2}, 0] after the fixup
    return SmootherResult(ms=gs, Ps=Ls_cov, Gs=E, Ls=Ls_fac)

"""Multi-chip time-axis sharding of the parallel Kalman filter/smoother.

The reference is single-device (SURVEY.md §2.11: no distributed backend).
This module is the TPU-native scale-out: the time axis is sharded over a
`jax.sharding.Mesh` axis, each chip runs the associative scan on its local
chunk, and chunk-summary elements are exchanged with ONE `all_gather` of
O(n_dev * d^2) floats over ICI — associativity makes the split exact:

  1. chip k builds filtering elements for its T/n local steps and computes
     the local prefix-combines l_i = e_first ∘ ... ∘ e_i;
  2. chunk totals (each chip's l_last) are all-gathered; every chip folds its
     own EXCLUSIVE prefix of totals (n_dev tiny combines, done redundantly —
     cheaper than a cross-chip scan);
  3. chip k's results are prefix ∘ l_i.

The prior (m0, P0) is folded into element 0 on chip 0 only; the cross-chip
prefix element's (b, C) is exactly the filtered state entering each chip,
which also provides the boundary state for per-step lml terms.

The smoother runs the mirror-image suffix exchange (the terminal element has
E = 0, so the gathered suffix collapses to the smoothed boundary state —
fp32 error does not accumulate across chips).

NOTE: differentiate this function under `jax.jit` — the eager-mode transpose
of shard_map rejects broadcast (replicated) cotangents against the sharded
out_specs ("Unexpected XLA sharding override").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.kalman import FilterResult, SmootherResult, observation_mask
from ..ops.matrix import highest_precision, safe_cholesky, cholesky_solve, symmetrize
from ..ops.parallel_kalman import (
    _FilterElems,
    _SmootherElems,
    _build_filter_elements,
    _filtering_operator,
    _per_step_lml,
    _smoothing_operator,
)

__all__ = ["sharded_filter_smoother"]


def _identity_filter_elem(d, dtype):
    return _FilterElems(
        A=jnp.eye(d, dtype=dtype),
        b=jnp.zeros((d,), dtype),
        C=jnp.zeros((d, d), dtype),
        J=jnp.zeros((d, d), dtype),
        eta=jnp.zeros((d,), dtype),
    )


def _tree_at(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def _varying(tree, axis):
    """Mark replicated values as device-varying for shard_map's vma typing
    (the fold carry becomes varying after combining with gathered totals)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pcast(x, (axis,), to="varying"), tree
    )


def _exclusive_prefix(totals, idx, n_dev, identity, operator, axis):
    """Fold totals[0..idx-1] left-to-right (masked fori over static n_dev)."""

    def body(i, acc):
        combined = operator(acc, _tree_at(totals, i))
        return jax.tree_util.tree_map(
            lambda a, c: jnp.where(i < idx, c, a), acc, combined
        )

    return jax.lax.fori_loop(0, n_dev, body, _varying(identity, axis))


def _exclusive_suffix(totals, idx, n_dev, identity, operator, axis):
    """Fold totals[idx+1..n-1] for the reverse (smoothing) direction."""

    def body(i, acc):
        j = n_dev - 1 - i
        combined = operator(acc, _tree_at(totals, j))
        return jax.tree_util.tree_map(
            lambda a, c: jnp.where(j > idx, c, a), acc, combined
        )

    return jax.lax.fori_loop(0, n_dev, body, _varying(identity, axis))


@highest_precision
def sharded_filter_smoother(
    A, Q, H, R, y, m0, P0, mesh: Mesh, axis: str = "t", mask=None
):
    """Time-sharded parallel filter + smoother.

    A, Q: [T, d, d]; H: [p, d]; R: [T, p, p]; y: [T, p]; T must be divisible
    by mesh.shape[axis]. Returns (FilterResult, SmootherResult) with outputs
    sharded along the time axis.
    """
    T, d = y.shape[0], m0.shape[-1]
    n_dev = mesh.shape[axis]
    assert T % n_dev == 0, f"T={T} must divide over {n_dev} '{axis}' shards"
    if mask is None:
        mask = observation_mask(y, P0.dtype)
    assert H.ndim == 2, "sharded path assumes a time-invariant H"
    dtype = P0.dtype

    spec = P(axis)
    rep = P()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, rep, spec, spec, rep, rep),
        out_specs=(spec, spec, spec, spec, spec, spec),
    )
    def run(A_l, Q_l, H_, R_l, y_mask_l, m0_, P0_):
        y_l, mask_l = y_mask_l[..., 0], y_mask_l[..., 1]
        H_l = jnp.broadcast_to(H_, (y_l.shape[0],) + H_.shape)
        idx = jax.lax.axis_index(axis)
        # --- filtering elements; prior folded on chip 0 only ---
        elems0 = _build_filter_elements(
            A_l, Q_l, H_l, R_l, y_l, mask_l, m0_, P0_
        )
        # generic (no prior, no zeroed first element) variant for chips > 0:
        zeros_m = jnp.zeros_like(m0_)
        zeros_P = jnp.zeros_like(P0_)
        elems1 = _build_filter_elements(
            A_l, Q_l, H_l, R_l, y_l, mask_l, zeros_m, zeros_P
        )
        # chips > 0 must keep the generic element 0 (A, eta, J not zeroed):
        elems1 = _rebuild_generic_first(elems1, A_l, Q_l, H_l, R_l, y_l, mask_l)
        elems = jax.tree_util.tree_map(
            lambda a, b: jnp.where(idx == 0, a, b), elems0, elems1
        )
        local = jax.lax.associative_scan(_filtering_operator, elems)
        total = _tree_at(local, -1)
        totals = jax.lax.all_gather(total, axis)  # [n_dev, ...]
        ident = _identity_filter_elem(d, dtype)
        prefix = _exclusive_prefix(
            totals, idx, n_dev, ident, _filtering_operator, axis
        )
        combined = _filtering_operator(
            jax.tree_util.tree_map(lambda x: x[None], prefix), local
        )
        ms_l, Ps_l = combined.b, symmetrize(combined.C)

        # boundary filtered state entering this chip (for per-step lml)
        m_in = jnp.where(idx == 0, m0_, prefix.b)
        P_in = jnp.where(idx == 0, P0_, symmetrize(prefix.C))
        lmls_l = _per_step_lml(
            A_l, Q_l, H_l, R_l, y_l, mask_l, ms_l, m_in, P_in, Ps_l
        )

        # --- smoothing elements + suffix exchange ---
        E_l, g_l, L_l = _smoother_elements_interior(
            A_l, Q_l, ms_l, Ps_l
        )
        # chip boundary: the element for this chip's LAST step uses the next
        # chip's first (A, Q) and filtered state; exchange A,Q,m,P across the
        # boundary by permuting left.
        nbr = {axis: [(i, (i - 1) % n_dev) for i in range(n_dev)]}
        A_next0 = jax.lax.ppermute(A_l[0], axis, nbr[axis])
        Q_next0 = jax.lax.ppermute(Q_l[0], axis, nbr[axis])
        E_last, g_last, L_last = _smoother_boundary_element(
            A_next0, Q_next0, ms_l[-1], Ps_l[-1]
        )
        # last chip's terminal element: (0, m_T, P_T)
        is_last = idx == n_dev - 1
        E_last = jnp.where(is_last, jnp.zeros((d, d), dtype), E_last)
        g_last = jnp.where(is_last, ms_l[-1], g_last)
        L_last = jnp.where(is_last, Ps_l[-1], L_last)
        E = jnp.concatenate([E_l, E_last[None]], axis=0)
        g = jnp.concatenate([g_l, g_last[None]], axis=0)
        L = jnp.concatenate([L_l, L_last[None]], axis=0)
        selems = _SmootherElems(E=E, g=g, L=L)
        slocal = jax.lax.associative_scan(
            _smoothing_operator, selems, reverse=True
        )
        stotal = _tree_at(slocal, 0)
        stotals = jax.lax.all_gather(stotal, axis)
        sident = _SmootherElems(
            E=jnp.eye(d, dtype=dtype),
            g=jnp.zeros((d,), dtype),
            L=jnp.zeros((d, d), dtype),
        )
        suffix = _exclusive_suffix(
            stotals, idx, n_dev, sident, _smoothing_operator, axis
        )
        scombined = _smoothing_operator(
            jax.tree_util.tree_map(lambda x: x[None], suffix), slocal
        )
        return ms_l, Ps_l, lmls_l, scombined.g, symmetrize(scombined.L), E

    y_mask = jnp.stack([jnp.nan_to_num(y) * mask, mask], axis=-1)
    ms, Ps, lmls, sms, sPs, Gs = run(A, Q, H, R, y_mask, m0, P0)
    filt = FilterResult(ms=ms, Ps=Ps, lml=jnp.sum(lmls), lmls=lmls)
    smooth = SmootherResult(ms=sms, Ps=sPs, Gs=Gs)
    return filt, smooth


def _rebuild_generic_first(elems, A_l, Q_l, H_l, R_l, y_l, mask_l):
    """Element 0 built as a GENERIC element (P_loc = Q_0, no prior, A/eta/J
    kept) — `_build_filter_elements` zeroes them assuming it owns the global
    first step."""
    from ..ops.gaussian import mask_covariance

    dtype = A_l.dtype
    d = A_l.shape[-1]
    Hm0 = mask_l[0][:, None] * H_l[0]
    y00 = jnp.nan_to_num(y_l[0]) * mask_l[0]
    P_loc = Q_l[0]
    S = mask_covariance(Hm0 @ P_loc @ Hm0.T + R_l[0], mask_l[0])
    Ls = safe_cholesky(S)
    K = cholesky_solve(Ls, Hm0 @ P_loc).T
    ImKH = jnp.eye(d, dtype=dtype) - K @ Hm0
    A0 = ImKH @ A_l[0]
    b0 = K @ y00
    C0 = symmetrize(ImKH @ P_loc)
    Sinv_v = cholesky_solve(Ls, y00[:, None])[:, 0]
    eta0 = A_l[0].T @ (Hm0.T @ Sinv_v)
    SinvH = cholesky_solve(Ls, Hm0)
    J0 = symmetrize(A_l[0].T @ (Hm0.T @ SinvH) @ A_l[0])
    return _FilterElems(
        A=elems.A.at[0].set(A0),
        b=elems.b.at[0].set(b0),
        C=elems.C.at[0].set(C0),
        J=elems.J.at[0].set(J0),
        eta=elems.eta.at[0].set(eta0),
    )


def _smoother_elements_interior(A_l, Q_l, ms_l, Ps_l):
    """Smoothing elements for local steps 0..n-2 (using local next (A,Q))."""
    A_next, Q_next = A_l[1:], Q_l[1:]
    P_f, m_f = Ps_l[:-1], ms_l[:-1]
    m_pred = jnp.einsum("tij,tj->ti", A_next, m_f)
    P_pred = jnp.einsum("tij,tjk,tlk->til", A_next, P_f, A_next) + Q_next
    Lp = safe_cholesky(P_pred)
    E = jnp.swapaxes(
        cholesky_solve(Lp, jnp.einsum("tij,tjk->tik", A_next, P_f)), -1, -2
    )
    g = m_f - jnp.einsum("tij,tj->ti", E, m_pred)
    L = symmetrize(P_f - jnp.einsum("tij,tjk,tlk->til", E, P_pred, E))
    return E, g, L


def _smoother_boundary_element(A_next0, Q_next0, m_last, P_last):
    """Smoothing element for this chip's last step, using the NEXT chip's
    first-step (A, Q) obtained by ppermute."""
    m_pred = A_next0 @ m_last
    P_pred = symmetrize(A_next0 @ P_last @ A_next0.T + Q_next0)
    Lp = safe_cholesky(P_pred)
    E = cholesky_solve(Lp, A_next0 @ P_last).T
    g = m_last - E @ m_pred
    L = symmetrize(P_last - E @ P_pred @ E.T)
    return E, g, L

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

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.kalman import FilterResult, SmootherResult, observation_mask
from ..ops.matrix import highest_precision, safe_cholesky, cholesky_solve, symmetrize
from ..ops.sqrt_kalman import tria
from ..ops.parallel_kalman import (
    _FilterElems,
    _SmootherElems,
    _build_filter_elements,
    _filtering_final,
    _filtering_operator,
    _per_step_lml,
    _smoothing_final,
    _smoothing_operator,
)
from ..ops.parallel_sqrt_kalman import (
    _SqrtFilterElems,
    _build_sqrt_elements,
    _per_step_lml_sqrt,
    _solve_tri,
    _sqrt_filtering_final,
    _sqrt_filtering_operator,
    _factor_psd,
    sqrt_smoother_elements,
)

__all__ = ["sharded_filter_smoother", "sharded_sqrt_filter_smoother"]


def _identity_filter_elem(d, dtype):
    return _FilterElems(
        A=jnp.eye(d, dtype=dtype),
        b=jnp.zeros((d,), dtype),
        C=jnp.zeros((d, d), dtype),
        J=jnp.zeros((d, d), dtype),
        eta=jnp.zeros((d,), dtype),
    )


def _identity_sqrt_filter_elem(d, dtype):
    return _SqrtFilterElems(
        A=jnp.eye(d, dtype=dtype),
        b=jnp.zeros((d,), dtype),
        U=jnp.zeros((d, d), dtype),
        eta=jnp.zeros((d,), dtype),
        Z=jnp.zeros((d, d), dtype),
    )


def _generic_local_elements(build_fn, A_l, Q_l, H_l, R_l, y_l, mask_l, m_z, P_z):
    """Build ALL-GENERIC elements for a local segment (no prior fold, no
    zeroed first element). The builders special-case index 0 as the global
    first step; prepend a dummy copy of step 0 and drop its element, so index
    0's element comes out of the shared generic formulas."""
    pad = lambda x: jnp.concatenate([x[:1], x], axis=0)
    elems = build_fn(
        pad(A_l), pad(Q_l), pad(H_l), pad(R_l), pad(y_l), pad(mask_l), m_z, P_z
    )
    return jax.tree_util.tree_map(lambda x: x[1:], elems)


def _chunked_inclusive_scan(op, elems, chunk_size, ident):
    """Inclusive associative combine; if chunk_size is set, an outer lax.scan
    over chunks of inner associative scans with the combined ELEMENT as carry
    (bounds memory + keeps graph size constant in the local segment length).
    `ident` must be a left identity of `op` and is fed as the initial carry."""
    T = jax.tree_util.tree_leaves(elems)[0].shape[0]
    if chunk_size is None or chunk_size >= T:
        return jax.lax.associative_scan(op, elems)
    assert T % chunk_size == 0, "local segment must divide by chunk_size"
    n = T // chunk_size
    chunked = jax.tree_util.tree_map(
        lambda x: x.reshape((n, chunk_size) + x.shape[1:]), elems
    )

    from ..ops.parallel_kalman import _inner_scan_ex

    def step(carry, chunk):
        # inter-chunk carry folds into the scan's block-totals pass (init=)
        # instead of an extra full-width combine per chunk
        combined, last = _inner_scan_ex(op, chunk, ident=ident, init=carry)
        return last, combined

    _, out = jax.lax.scan(step, ident, chunked)
    return jax.tree_util.tree_map(lambda x: x.reshape((T,) + x.shape[2:]), out)


def _tree_at(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def _varying(tree, axes):
    """Mark replicated values as device-varying over the manual mesh axes
    for shard_map's vma typing (the fold carry becomes varying after
    combining with gathered totals; in composite dp×t mode identities must
    vary over BOTH axes)."""
    axes = (axes,) if isinstance(axes, str) else tuple(axes)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pcast(x, axes, to="varying"), tree
    )


def _exclusive_prefix(totals, idx, n_dev, identity, operator, axes):
    """Fold totals[0..idx-1] left-to-right (masked fori over static n_dev)."""

    def body(i, acc):
        combined = operator(acc, _tree_at(totals, i))
        return jax.tree_util.tree_map(
            lambda a, c: jnp.where(i < idx, c, a), acc, combined
        )

    return jax.lax.fori_loop(0, n_dev, body, _varying(identity, axes))


def _exclusive_suffix(totals, idx, n_dev, identity, operator, axes):
    """Fold totals[idx+1..n-1] for the reverse (smoothing) direction."""

    def body(i, acc):
        j = n_dev - 1 - i
        combined = operator(acc, _tree_at(totals, j))
        return jax.tree_util.tree_map(
            lambda a, c: jnp.where(j > idx, c, a), acc, combined
        )

    return jax.lax.fori_loop(0, n_dev, body, _varying(identity, axes))


def _composite_specs(A, H, mesh, axis, batch_axis):
    """(in_specs, out_specs, batched) for the 1-D time mesh or the composite
    batch×time mesh (data-parallel over independent series, each series'
    scan time-sharded — e.g. mesh ('dp', 't') on a pod slice).

    Batched mode is detected from A's rank ([B, T, d, d]); every per-series
    array then carries a leading B axis sharded over `batch_axis` (H may
    stay [p, d]: one shared static observation matrix is replicated)."""
    batched = A.ndim == 4
    if batched and batch_axis is None:
        raise ValueError(
            "batched inputs ([B, T, ...]) need batch_axis= (a mesh axis "
            "name for the data-parallel dimension)"
        )
    lead = (batch_axis,) if batched else ()
    spec = P(*lead, axis)
    rep = P(*lead)
    # time-varying H shards along time like A/Q/R; a single static [p, d] H
    # is fully replicated (even in batched mode)
    tv_H = H.ndim == (4 if batched else 3)
    spec_H = spec if tv_H else (P() if H.ndim == 2 else rep)
    in_specs = (spec, spec, spec_H, spec, spec, rep, rep)
    out_specs = (spec, spec, spec, spec, spec, spec)
    return in_specs, out_specs, batched


@highest_precision
def sharded_filter_smoother(
    A, Q, H, R, y, m0, P0, mesh: Mesh, axis: str = "t", mask=None,
    chunk_size: int | None = None, batch_axis: str | None = None,
):
    """Time-sharded parallel filter + smoother.

    A, Q: [T, d, d]; H: [p, d]; R: [T, p, p]; y: [T, p]; T must be divisible
    by mesh.shape[axis]. Returns (FilterResult, SmootherResult) with outputs
    sharded along the time axis.

    COMPOSITE dp×t mode: pass every per-series array with a leading batch
    dim ([B, T, ...]; m0/P0 as [B, d]/[B, d, d]; H either shared [p, d] or
    per-series time-varying [B, T, p, d]) plus `batch_axis=` naming a second
    mesh axis — B shards over `batch_axis` while each series' scan shards
    over `axis`, so e.g. a ('dp', 't') = (32, 8) mesh trains 32-way data
    parallel with 8-way sequence parallelism per series.

    `chunk_size` chunks each chip's LOCAL scan (outer lax.scan of inner
    associative scans, element carry) — bounds per-chip memory and keeps the
    traced graph constant in T/n_dev, same story as the single-chip chunked
    mode but with an element (not state) carry since the incoming state is
    unknown until the cross-chip exchange.
    """
    T, d = y.shape[-2], m0.shape[-1]
    n_dev = mesh.shape[axis]
    assert T % n_dev == 0, f"T={T} must divide over {n_dev} '{axis}' shards"
    if mask is None:
        mask = observation_mask(y, P0.dtype)
    dtype = P0.dtype

    in_specs, out_specs, batched = _composite_specs(
        A, H, mesh, axis, batch_axis
    )
    vaxes = (axis, batch_axis) if batched else (axis,)

    def run(A_l, Q_l, H_, R_l, y_mask_l, m0_, P0_):
        y_l, mask_l = y_mask_l[..., 0], y_mask_l[..., 1]
        H_l = (
            H_ if H_.ndim == 3
            else jnp.broadcast_to(H_, (y_l.shape[0],) + H_.shape)
        )
        idx = jax.lax.axis_index(axis)
        # --- filtering elements; prior folded on chip 0 only ---
        elems0 = _build_filter_elements(
            A_l, Q_l, H_l, R_l, y_l, mask_l, m0_, P0_
        )
        # generic (no prior, no zeroed first element) variant for chips > 0:
        elems1 = _generic_local_elements(
            _build_filter_elements, A_l, Q_l, H_l, R_l, y_l, mask_l,
            jnp.zeros_like(m0_), jnp.zeros_like(P0_),
        )
        elems = jax.tree_util.tree_map(
            lambda a, b: jnp.where(idx == 0, a, b), elems0, elems1
        )
        ident = _identity_filter_elem(d, dtype)
        local = _chunked_inclusive_scan(
            _filtering_operator, elems, chunk_size, _varying(ident, vaxes)
        )
        total = _tree_at(local, -1)
        totals = jax.lax.all_gather(total, axis)  # [n_dev, ...]
        prefix = _exclusive_prefix(
            totals, idx, n_dev, ident, _filtering_operator, vaxes
        )
        # reduced distribute combine: only the filtered moments feed on
        b_l, C_l = _filtering_final(
            jax.tree_util.tree_map(lambda x: x[None], prefix), local
        )
        ms_l, Ps_l = b_l, symmetrize(C_l)

        # boundary filtered state entering this chip (for per-step lml)
        m_in = jnp.where(idx == 0, m0_, prefix.b)
        P_in = jnp.where(idx == 0, P0_, symmetrize(prefix.C))
        lmls_l, Pp_l = _per_step_lml(
            A_l, Q_l, H_l, R_l, y_l, mask_l, ms_l, m_in, P_in, Ps_l
        )

        # --- smoothing elements + suffix exchange ---
        # reuse the lml pass's predicted covariances (shifted by one; the
        # rolled [-1] junk is overwritten by the boundary element below)
        E_l, g_l, L_l = _smoother_elements_interior(
            A_l, Q_l, ms_l, Ps_l, P_pred=jnp.roll(Pp_l, -1, axis=0)
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
        E = E_l.at[-1].set(E_last)
        g = g_l.at[-1].set(g_last)
        L = L_l.at[-1].set(L_last)
        selems = _SmootherElems(E=E, g=g, L=L)
        # FLIP + forward scan + FLIP instead of reverse=True: reverse scans
        # hit a 27x-slower TPU path (see ops/parallel_kalman.py:260-266);
        # bit-identical results, and _smoothing_operator's (ej, ei) argument
        # order is exactly the flipped-domain prefix convention.
        sident = _SmootherElems(
            E=jnp.eye(d, dtype=dtype),
            g=jnp.zeros((d,), dtype),
            L=jnp.zeros((d, d), dtype),
        )
        sflip = jax.tree_util.tree_map(lambda x: x[::-1], selems)
        sscan = _chunked_inclusive_scan(
            _smoothing_operator, sflip, chunk_size, _varying(sident, vaxes)
        )
        slocal = jax.tree_util.tree_map(lambda x: x[::-1], sscan)
        stotal = _tree_at(slocal, 0)
        stotals = jax.lax.all_gather(stotal, axis)
        suffix = _exclusive_suffix(
            stotals, idx, n_dev, sident, _smoothing_operator, vaxes
        )
        sg_l, sL_l = _smoothing_final(
            jax.tree_util.tree_map(lambda x: x[None], suffix), slocal
        )
        return ms_l, Ps_l, lmls_l, sg_l, symmetrize(sL_l), E

    body = run
    if batched:
        # local batch vmap: the 't' collectives broadcast over the vmapped
        # dim (axis_index/all_gather/ppermute have batching rules); a shared
        # static H [p, d] stays unbatched
        body = jax.vmap(run, in_axes=(0, 0, None if H.ndim == 2 else 0,
                                      0, 0, 0, 0))
    run_sm = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs
    )
    y_mask = jnp.stack([jnp.nan_to_num(y) * mask, mask], axis=-1)
    ms, Ps, lmls, sms, sPs, Gs = run_sm(A, Q, H, R, y_mask, m0, P0)
    filt = FilterResult(ms=ms, Ps=Ps, lml=jnp.sum(lmls, -1), lmls=lmls)
    smooth = SmootherResult(ms=sms, Ps=sPs, Gs=Gs)
    return filt, smooth


def _smoother_elements_interior(A_l, Q_l, ms_l, Ps_l, P_pred=None):
    """Smoothing elements for local steps, FULL length n: the k -> k+1 shift
    is a jnp.roll (offset slices A_l[1:]/Ps_l[:-1] fused into the batched
    solve hit a 16x-slower XLA-TPU path — see
    ops/parallel_kalman.parallel_rts_smoother). Element n-1 is junk (rolled
    wrap-around) and must be overwritten by the caller's boundary element.
    `P_pred` optionally supplies the shifted predicted covariances the lml
    pass already built (FilterResult.Pp convention, rolled by the caller)."""
    A_next = jnp.roll(A_l, -1, axis=0)
    m_pred = jnp.einsum("tij,tj->ti", A_next, ms_l)
    if P_pred is None:
        Q_next = jnp.roll(Q_l, -1, axis=0)
        P_pred = jnp.einsum("tij,tjk,tlk->til", A_next, Ps_l, A_next) + Q_next
    Lp = safe_cholesky(P_pred)
    E = jnp.swapaxes(
        cholesky_solve(Lp, jnp.einsum("tij,tjk->tik", A_next, Ps_l)), -1, -2
    )
    g = ms_l - jnp.einsum("tij,tj->ti", E, m_pred)
    L = symmetrize(Ps_l - jnp.einsum("tij,tjk,tlk->til", E, P_pred, E))
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


# ---------------------------------------------------------------------------
# Square-root (QR) sharded variant — multi-chip with the fp32-robustness of
# the single-chip sqrt path (ops/parallel_sqrt_kalman.py).
# ---------------------------------------------------------------------------


def _sqrt_smoother_elements_interior(A_l, Qs_l, ms_l, Us_l, Pp_sqrt=None):
    """Sqrt-pipeline smoothing elements for local steps, FULL length n via
    jnp.roll (same 16x offset-slice pathology as the covariance form — see
    _smoother_elements_interior); element n-1 is junk the caller overwrites.

    Gram-form build (ops.parallel_sqrt_kalman.sqrt_smoother_elements):
    the Joseph covariance L22 directly (the gain solve stays against the
    predicted FACTOR), so the scan runs the covariance combine — exactly the
    single-chip Gram-form smoother, sharded. `Pp_sqrt` optionally supplies
    the lml pass's predicted factors (already rolled)."""
    A_next = jnp.roll(A_l, -1, axis=0)
    Qs_next = jnp.roll(Qs_l, -1, axis=0)
    return sqrt_smoother_elements(A_next, Qs_next, ms_l, Us_l, Pp_sqrt)


def _sqrt_smoother_boundary_element(A_next0, Qs_next0, m_last, U_last):
    """Sqrt smoothing element for the chip's last step (next chip's A, Qs)."""
    d = m_last.shape[-1]
    dtype = U_last.dtype
    pre = jnp.block(
        [
            [A_next0 @ U_last, Qs_next0],
            [U_last, jnp.zeros((d, d), dtype)],
        ]
    )
    Tm = tria(pre)
    Pp_sqrt, GP, Y22 = Tm[:d, :d], Tm[d:, :d], Tm[d:, d:]
    G = _solve_tri(Pp_sqrt.T, GP.T, lower=False).T
    g = m_last - G @ (A_next0 @ m_last)
    return G, g, Y22


@highest_precision
def sharded_sqrt_filter_smoother(
    A, Q_sqrt, H, R_sqrt, y, m0, P0_sqrt, mesh: Mesh, axis: str = "t",
    mask=None, chunk_size: int | None = None, batch_axis: str | None = None,
):
    """Time-sharded QR square-root parallel filter + smoother.

    Same exchange structure as `sharded_filter_smoother` (local scans, one
    all_gather of chunk totals, redundant tiny prefix fold; composite dp×t
    mode via leading batch dims + `batch_axis=`) but with the
    square-root elements/operators, so the multi-chip path inherits the fp32
    robustness story (CLAUDE.md rule 3). Q_sqrt/R_sqrt/P0_sqrt are lower
    Cholesky factors; returned Ps are COVARIANCES (squared at the boundary).
    """
    T, d = y.shape[-2], m0.shape[-1]
    n_dev = mesh.shape[axis]
    assert T % n_dev == 0, f"T={T} must divide over {n_dev} '{axis}' shards"
    if mask is None:
        mask = observation_mask(y, P0_sqrt.dtype)
    dtype = P0_sqrt.dtype

    in_specs, out_specs6, batched = _composite_specs(
        A, H, mesh, axis, batch_axis
    )
    out_specs = out_specs6 + (out_specs6[-1],)  # 7 outputs (extra Ls)
    vaxes = (axis, batch_axis) if batched else (axis,)

    def run(A_l, Qs_l, H_, Rs_l, y_mask_l, m0_, U0_):
        y_l, mask_l = y_mask_l[..., 0], y_mask_l[..., 1]
        H_l = (
            H_ if H_.ndim == 3
            else jnp.broadcast_to(H_, (y_l.shape[0],) + H_.shape)
        )
        idx = jax.lax.axis_index(axis)
        elems0 = _build_sqrt_elements(
            A_l, Qs_l, H_l, Rs_l, y_l, mask_l, m0_, U0_
        )
        elems1 = _generic_local_elements(
            _build_sqrt_elements, A_l, Qs_l, H_l, Rs_l, y_l, mask_l,
            jnp.zeros_like(m0_), jnp.zeros_like(U0_),
        )
        elems = jax.tree_util.tree_map(
            lambda a, b: jnp.where(idx == 0, a, b), elems0, elems1
        )
        ident = _identity_sqrt_filter_elem(d, dtype)
        local = _chunked_inclusive_scan(
            _sqrt_filtering_operator, elems, chunk_size, _varying(ident, vaxes)
        )
        total = _tree_at(local, -1)
        totals = jax.lax.all_gather(total, axis)
        prefix = _exclusive_prefix(
            totals, idx, n_dev, ident, _sqrt_filtering_operator, vaxes
        )
        # reduced distribute combine: only the filtered moments feed on
        ms_l, Us_l = _sqrt_filtering_final(
            jax.tree_util.tree_map(lambda x: x[None], prefix), local
        )

        m_in = jnp.where(idx == 0, m0_, prefix.b)
        U_in = jnp.where(idx == 0, U0_, prefix.U)
        lmls_l, Up_l = _per_step_lml_sqrt(
            A_l, Qs_l, H_l, Rs_l, y_l, mask_l, ms_l, m_in, U_in, Us_l
        )

        # --- Gram-form smoothing elements + suffix exchange (the scan runs
        # the covariance combine — PSD sums only; see
        # parallel_sqrt_kalman.parallel_sqrt_rts_smoother) ---
        # reuse the lml pass's predicted factors (shifted by one; the
        # rolled [-1] junk is overwritten by the boundary element below)
        E_l, g_l, L_l = _sqrt_smoother_elements_interior(
            A_l, Qs_l, ms_l, Us_l, Pp_sqrt=jnp.roll(Up_l, -1, axis=0)
        )
        nbr = {axis: [(i, (i - 1) % n_dev) for i in range(n_dev)]}
        A_next0 = jax.lax.ppermute(A_l[0], axis, nbr[axis])
        Qs_next0 = jax.lax.ppermute(Qs_l[0], axis, nbr[axis])
        E_last, g_last, D_last = _sqrt_smoother_boundary_element(
            A_next0, Qs_next0, ms_l[-1], Us_l[-1]
        )
        is_last = idx == n_dev - 1
        E_last = jnp.where(is_last, jnp.zeros((d, d), dtype), E_last)
        g_last = jnp.where(is_last, ms_l[-1], g_last)
        D_last = jnp.where(is_last, Us_l[-1], D_last)
        E = E_l.at[-1].set(E_last)
        g = g_l.at[-1].set(g_last)
        L = L_l.at[-1].set(D_last @ D_last.T)
        selems = _SmootherElems(E=E, g=g, L=L)
        sident = _SmootherElems(
            E=jnp.eye(d, dtype=dtype),
            g=jnp.zeros((d,), dtype),
            L=jnp.zeros((d, d), dtype),
        )
        sflip = jax.tree_util.tree_map(lambda x: x[::-1], selems)
        sscan = _chunked_inclusive_scan(
            _smoothing_operator, sflip, chunk_size, _varying(sident, vaxes)
        )
        slocal = jax.tree_util.tree_map(lambda x: x[::-1], sscan)
        stotal = _tree_at(slocal, 0)
        stotals = jax.lax.all_gather(stotal, axis)
        suffix = _exclusive_suffix(
            stotals, idx, n_dev, sident, _smoothing_operator, vaxes
        )
        sg_l, sL_l = _smoothing_final(
            jax.tree_util.tree_map(lambda x: x[None], suffix), slocal
        )
        # filtered factors square at the boundary (outputs are covariances);
        # the smoothed covariance factors ONCE for PSD head projections
        Ps_l = jnp.einsum("tij,tkj->tik", Us_l, Us_l)
        sLs_l = _factor_psd(sL_l)
        return ms_l, Ps_l, lmls_l, sg_l, sL_l, sLs_l, E

    body = run
    if batched:
        body = jax.vmap(run, in_axes=(0, 0, None if H.ndim == 2 else 0,
                                      0, 0, 0, 0))
    run_sm = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs
    )
    y_mask = jnp.stack([jnp.nan_to_num(y) * mask, mask], axis=-1)
    ms, Ps, lmls, sms, sPs, sLs, Gs = run_sm(
        A, Q_sqrt, H, R_sqrt, y_mask, m0, P0_sqrt
    )
    filt = FilterResult(ms=ms, Ps=Ps, lml=jnp.sum(lmls, -1), lmls=lmls)
    smooth = SmootherResult(ms=sms, Ps=sPs, Gs=Gs, Ls=sLs)
    return filt, smooth

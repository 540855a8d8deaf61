"""Filter/smoother dispatch: {sequential, parallel} x {covariance, sqrt}.

Static trace-time dispatch replacing the reference's `evoke('filter',
filter_type)` registry (`kalman_filter.py:541`, filter_type in
{'sequential','parallel','square_root_svm'}). Square-root variants take/return
triangular factors internally; this runner converts at the boundary so models
always see covariance-form (ms, Ps, lml).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import kalman, parallel_kalman, parallel_sqrt_kalman, sqrt_kalman
from .kalman import FilterResult, SmootherResult
from .matrix import safe_cholesky, safe_cholesky_rel, symmetrize

__all__ = ["run_filter_smoother", "run_filter"]


def _pad_amount(T: int, chunk_size, n_shards: int = 1) -> int:
    """Steps to append so T divides into n_shards equal segments, each a
    multiple of chunk_size (chunking applies within a shard's segment)."""
    unit = n_shards * (chunk_size or 1)
    if n_shards == 1 and (chunk_size is None or T <= chunk_size):
        return 0
    if n_shards > 1 and chunk_size is not None:
        # judge the no-op on the PADDED per-shard segment length ceil(T/n):
        # with T=1001, 8 shards, chunk=125 the floor test would pick unit=8
        # and leave a 126-step segment that does not divide by chunk_size
        if -(-T // n_shards) <= chunk_size:
            unit = n_shards  # chunking is a no-op within each segment
    return (-T) % unit


def _pad_inputs(ssm, R, Y, pad: int):
    """Append `pad` dummy steps: identity dynamics (A=I, Q=0), fully-missing
    observations (NaN Y, identity R). Filtered/smoothed results at padded
    steps are discarded; identity dynamics make the smoother pass exact."""
    T, d = Y.shape[0], ssm.m0.shape[-1]
    p = R.shape[-1]
    dtype = R.dtype
    eyed = jnp.broadcast_to(jnp.eye(d, dtype=dtype), (pad, d, d))
    A = jnp.concatenate([ssm.A, eyed])
    Q = jnp.concatenate([ssm.Q, jnp.zeros((pad, d, d), dtype)])
    Rp = jnp.concatenate(
        [R, jnp.broadcast_to(jnp.eye(p, dtype=dtype), (pad, p, p))]
    )
    Yp = jnp.concatenate([Y, jnp.full((pad, p), jnp.nan, Y.dtype)])
    H = ssm.H
    if H.ndim == 3:
        H = jnp.concatenate([H, jnp.broadcast_to(H[-1:], (pad,) + H.shape[1:])])
    return ssm._replace(A=A, Q=Q, H=H), Rp, Yp


def _unpad(res, T: int):
    return jax.tree_util.tree_map(lambda x: x[:T] if x.ndim > 0 else x, res)


import jax  # noqa: E402  (tree_map in _unpad)


def _square(F: FilterResult) -> FilterResult:
    Ps = jnp.einsum("tij,tkj->tik", F.Ps, F.Ps)
    # drop the PREDICTED-FACTOR byproduct: in covariance form Pp must be a
    # covariance, and the smoothers trust any non-None Pp — leaking the sqrt
    # factor here would silently corrupt parallel_rts_smoother(A, Q, F)
    return F._replace(Ps=Ps, Pp=None)


def _square_s(S: SmootherResult) -> SmootherResult:
    Ps = jnp.einsum("tij,tkj->tik", S.Ps, S.Ps)
    return S._replace(Ps=Ps, Ls=S.Ps)  # keep the factor for PSD projections


def run_filter(ssm, R, Y, *, parallel=False, sqrt=False, chunk_size=None):
    """One filtering pass; returns FilterResult with COVARIANCE Ps."""
    T = Y.shape[0]
    pad = _pad_amount(T, chunk_size if parallel else None)
    if pad:
        ssm, R, Y = _pad_inputs(ssm, R, Y, pad)
    f, aux = _run_filter_raw(
        ssm, R, Y, parallel=parallel, sqrt=sqrt, chunk_size=chunk_size
    )
    return _unpad(f, T), aux


def _mask_decoupled_R(R, Y):
    """Decouple missing-observation rows/cols of R BEFORE factoring.

    The sqrt filters mask the observation-noise FACTOR per step
    (`mask · R^1/2 · mask + (I - mask)`), which implies the masked
    covariance only when missing rows are already decoupled in R — exact
    for diagonal R, WRONG for dense R with a partially-missing step (the
    masked factor's Gram drops cross terms the true masked covariance
    keeps; caught by `tests/test_fuzz_kalman.py`). Factoring
    `mask_covariance(R, mask)` instead makes the filters' per-step factor
    masking idempotent and the implied covariance exact."""
    from .gaussian import mask_covariance
    from .kalman import observation_mask

    return mask_covariance(R, observation_mask(Y, R.dtype))


def _run_filter_raw(ssm, R, Y, *, parallel, sqrt, chunk_size):
    if sqrt:
        Q_sqrt = safe_cholesky_rel(ssm.Q)
        R_sqrt = safe_cholesky_rel(_mask_decoupled_R(R, Y))
        P0_sqrt = safe_cholesky_rel(ssm.P0)
        if parallel:
            f = parallel_sqrt_kalman.parallel_sqrt_kalman_filter(
                ssm.A, Q_sqrt, ssm.H, R_sqrt, Y, ssm.m0, P0_sqrt,
                chunk_size=chunk_size,
            )
        else:
            f = sqrt_kalman.sqrt_kalman_filter(
                ssm.A, Q_sqrt, ssm.H, R_sqrt, Y, ssm.m0, P0_sqrt
            )
        return _square(f), (Q_sqrt, f)
    if parallel:
        f = parallel_kalman.parallel_kalman_filter(
            ssm.A, ssm.Q, ssm.H, R, Y, ssm.m0, ssm.P0, chunk_size=chunk_size
        )
    else:
        f = kalman.kalman_filter(ssm.A, ssm.Q, ssm.H, R, Y, ssm.m0, ssm.P0)
    return f, (None, f)


def run_filter_smoother(ssm, R, Y, *, parallel=False, sqrt=False,
                        chunk_size=None, mesh=None, mesh_axis: str = "t"):
    """Filter + smoother; both results carry COVARIANCE Ps.

    `mesh`: a `jax.sharding.Mesh` routes the pass through the time-axis
    sharded multi-chip filters (`parallel.sharded`); `parallel` is implied.
    """
    if mesh is not None:
        return _run_sharded(
            ssm, R, Y, sqrt=sqrt, chunk_size=chunk_size, mesh=mesh,
            mesh_axis=mesh_axis,
        )
    T = Y.shape[0]
    pad = _pad_amount(T, chunk_size if parallel else None)
    if pad:
        ssm, R, Y = _pad_inputs(ssm, R, Y, pad)
    f_cov, (Q_sqrt, f_raw) = _run_filter_raw(
        ssm, R, Y, parallel=parallel, sqrt=sqrt, chunk_size=chunk_size
    )
    if sqrt:
        if parallel:
            # already covariance-form Ps + factor Ls (Gram-form scan, one
            # final T-wide Cholesky inside the smoother)
            s = parallel_sqrt_kalman.parallel_sqrt_rts_smoother(
                ssm.A, Q_sqrt, f_raw, chunk_size=chunk_size
            )
            return _unpad(f_cov, T), _unpad(s, T)
        s = sqrt_kalman.sqrt_rts_smoother(ssm.A, Q_sqrt, f_raw)
        return _unpad(f_cov, T), _unpad(_square_s(s), T)
    if parallel:
        s = parallel_kalman.parallel_rts_smoother(
            ssm.A, ssm.Q, f_raw, chunk_size=chunk_size
        )
    else:
        s = kalman.rts_smoother(ssm.A, ssm.Q, f_raw)
    return _unpad(f_cov, T), _unpad(s, T)


def _run_sharded(ssm, R, Y, *, sqrt, chunk_size, mesh, mesh_axis):
    """Multi-chip time-sharded pass (pads T to the mesh/chunk grid)."""
    from ..parallel import sharded as _sharded

    T = Y.shape[0]
    n_dev = mesh.shape[mesh_axis]
    pad = _pad_amount(T, chunk_size, n_shards=n_dev)
    if pad:
        ssm, R, Y = _pad_inputs(ssm, R, Y, pad)
    if sqrt:
        Q_sqrt = safe_cholesky_rel(ssm.Q)
        R_sqrt = safe_cholesky_rel(_mask_decoupled_R(R, Y))
        P0_sqrt = safe_cholesky_rel(ssm.P0)
        f, s = _sharded.sharded_sqrt_filter_smoother(
            ssm.A, Q_sqrt, ssm.H, R_sqrt, Y, ssm.m0, P0_sqrt, mesh=mesh,
            axis=mesh_axis, chunk_size=chunk_size,
        )
    else:
        f, s = _sharded.sharded_filter_smoother(
            ssm.A, ssm.Q, ssm.H, R, Y, ssm.m0, ssm.P0, mesh=mesh,
            axis=mesh_axis, chunk_size=chunk_size,
        )
    return _unpad(f, T), _unpad(s, T)

"""Nearest-neighbour orderings and conditioning sets for Vecchia inference.

Counterpart of the reference's nearest-neighbour data surface
(`/root/reference/src/lib/stgp/data/nearest_neighbours_data.py:7` —
`PrecomputedGroupedNearestNeighboursData`, which stores a caller-supplied
``neighbour_arr``). The reference never computes neighbours itself (its
transform/marginal code is an unfinished debug path, see
`transforms/nearest_neighbours.py:60`); here the orderings and conditioning
sets are first-class, computed host-side with numpy at model build time.
They are STATIC data (integer index arrays), so everything downstream stays
fixed-shape under jit: per-point conditioning becomes batched [N, m, m]
algebra that rides the Pallas lane-batched solves on TPU.

All functions take concrete (non-traced) arrays — call them at model
construction, not inside jit.
"""
from __future__ import annotations

import numpy as np

__all__ = ["maximin_ordering", "nearest_neighbour_sets"]


def _pairwise_sq_dists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """[Na, Nb] squared euclidean distances (host numpy)."""
    A = np.atleast_2d(np.asarray(A, dtype=np.float64))
    B = np.atleast_2d(np.asarray(B, dtype=np.float64))
    if A.ndim == 2 and A.shape[1] != B.shape[1]:  # pragma: no cover
        raise ValueError(f"dim mismatch {A.shape} vs {B.shape}")
    d2 = (
        np.sum(A * A, axis=1)[:, None]
        + np.sum(B * B, axis=1)[None, :]
        - 2.0 * (A @ B.T)
    )
    return np.maximum(d2, 0.0)


def maximin_ordering(X: np.ndarray) -> np.ndarray:
    """Maximin (farthest-point) ordering: start at the point closest to the
    centroid, then repeatedly take the point FARTHEST from everything chosen
    so far. Early points form a coarse space-filling net, so small
    conditioning sets carry long-range information — the standard ordering
    that makes Vecchia accurate at small m (Guinness 2018).

    X: [N, D] (or [N] for 1-D). Returns an [N] int64 permutation.
    O(N^2) time, O(N) memory per step — host preprocessing.
    """
    X = np.atleast_2d(np.asarray(X, dtype=np.float64))
    if X.shape[0] == 1 and X.size > 1:  # [N] 1-D input arrived as [1, N]
        X = X.T
    N = X.shape[0]
    centroid = X.mean(axis=0, keepdims=True)
    first = int(np.argmin(_pairwise_sq_dists(X, centroid)[:, 0]))
    order = np.empty(N, dtype=np.int64)
    order[0] = first
    min_d2 = _pairwise_sq_dists(X, X[first : first + 1])[:, 0]
    min_d2[first] = -np.inf
    for i in range(1, N):
        nxt = int(np.argmax(min_d2))
        order[i] = nxt
        d2 = _pairwise_sq_dists(X, X[nxt : nxt + 1])[:, 0]
        np.minimum(min_d2, d2, out=min_d2)
        min_d2[nxt] = -np.inf
    return order


def nearest_neighbour_sets(
    X: np.ndarray,
    m: int,
    *,
    ordering: str | np.ndarray | None = "maximin",
    block: int = 4096,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-point conditioning sets: for each point i (in the ordering), the
    up-to-m nearest PRECEDING points.

    Args:
        X: [N, D] inputs (concrete).
        m: conditioning-set size.
        ordering: "maximin", "input" (keep the given order), or an explicit
            [N] permutation.
        block: row-block size for the blocked distance sweep (host memory).

    Returns ``(order, nbrs, mask)``:
        order: [N] permutation of the input rows (int64).
        nbrs: [N, m] int32 — indices INTO THE ORDERED ARRAYS of each point's
            neighbours; rows with fewer than m predecessors are padded with 0.
        mask: [N, m] float32 — 1.0 for real neighbours, 0.0 for padding.
    """
    X = np.atleast_2d(np.asarray(X, dtype=np.float64))
    if X.shape[0] == 1 and X.size > 1:
        X = X.T
    N = X.shape[0]
    m = int(min(m, max(N - 1, 1)))
    if isinstance(ordering, str):
        if ordering == "maximin":
            order = maximin_ordering(X)
        elif ordering == "input":
            order = np.arange(N, dtype=np.int64)
        else:  # pragma: no cover
            raise ValueError(f"unknown ordering {ordering!r}")
    elif ordering is None:
        order = np.arange(N, dtype=np.int64)
    else:
        order = np.asarray(ordering, dtype=np.int64)
    Xo = X[order]

    nbrs = np.zeros((N, m), dtype=np.int32)
    mask = np.zeros((N, m), dtype=np.float32)
    for lo in range(0, N, block):
        hi = min(lo + block, N)
        d2 = _pairwise_sq_dists(Xo[lo:hi], Xo[:hi])  # [b, hi]
        rows = np.arange(lo, hi)
        # exclude self and successors within the block
        col = np.arange(hi)[None, :]
        d2[col >= rows[:, None]] = np.inf
        k = min(m, hi - 1)
        if k <= 0:
            continue
        part = np.argpartition(d2, kth=k - 1, axis=1)[:, :k]
        take = np.take_along_axis(d2, part, axis=1)
        ord_k = np.argsort(take, axis=1, kind="stable")
        part = np.take_along_axis(part, ord_k, axis=1)
        take = np.take_along_axis(take, ord_k, axis=1)
        valid = np.isfinite(take)
        nbrs[lo:hi, :k] = np.where(valid, part, 0)
        mask[lo:hi, :k] = valid.astype(np.float32)
    return order, nbrs, mask

"""Host-side spatio-temporal data assembly: scattered → state-space layout.

Counterpart of the reference's sequential/ST data layer:
  - `data/sequential.py:9`   pad_with_nan_to_make_grid
  - `data/sequential.py:71`  order_sequentially_np (sort to [Nt, Ns] grid)
  - `data/sequential.py:171` get_minimal_time_groups (ragged time groups)
  - `data/data.py:422`       SpatioTemporalData
  - `data/data.py:727`       TemporallyGroupedData
  - `data/data.py:782-791`   spatial minibatching

Design split (same as the reference, deliberately): all index bookkeeping is
ONE-TIME host-side numpy — sorting, uniquing and padding are data-dependent
and would be shape-dynamic under jit. The jitted models consume the fixed,
sorted arrays these builders produce; `unsort` maps posterior rows back to
the caller's original ordering.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "pad_with_nan_to_make_grid",
    "SpatioTemporalData",
    "TemporallyGroupedData",
    "spatial_minibatch_indices",
]


def _as_2d(X):
    X = np.asarray(X)
    if X.ndim != 2:
        raise ValueError(f"X must be [N, 1+ds] (time first column); got {X.shape}")
    return X


@dataclass
class SpatioTemporalData:
    """Scattered (t, s) observations snapped onto the full [Nt, Ns] grid.

    Attributes
    ----------
    t : [Nt] sorted unique times.
    X_space : [Ns, ds] sorted unique spatial sites.
    Y : [Nt, Ns, P] grid data, NaN where no observation exists.
    Use `Y_flat` ([Nt, Ns*P]) to feed the state-space models (site-major
    head layout matching SpatioTemporalKernel) and `unsort(A)` to read
    per-original-row values back out of a grid-shaped result.
    """

    t: np.ndarray
    X_space: np.ndarray
    Y: np.ndarray
    _row_t: np.ndarray = field(repr=False)  # [N] original row -> time index
    _row_s: np.ndarray = field(repr=False)  # [N] original row -> site index

    @classmethod
    def from_scattered(cls, X, Y) -> "SpatioTemporalData":
        """X: [N, 1+ds] rows (t, s...); Y: [N] or [N, P]."""
        X = _as_2d(X)
        Y = np.asarray(Y)
        if Y.ndim == 1:
            Y = Y[:, None]
        if Y.shape[0] != X.shape[0]:
            raise ValueError("X and Y row counts differ")
        t_all = X[:, 0]
        s_all = X[:, 1:]
        t_u, t_idx = np.unique(t_all, return_inverse=True)
        s_u, s_idx = np.unique(s_all, axis=0, return_inverse=True)
        Nt, Ns, P = t_u.shape[0], s_u.shape[0], Y.shape[1]
        grid = np.full((Nt, Ns, P), np.nan, dtype=np.result_type(Y.dtype, np.float32))
        # later duplicates win (reference keeps first unique row; duplicates
        # with conflicting values are caller error either way)
        grid[t_idx, s_idx] = Y
        return cls(t=t_u, X_space=s_u, Y=grid, _row_t=t_idx, _row_s=s_idx)

    @property
    def Nt(self) -> int:
        return self.t.shape[0]

    @property
    def Ns(self) -> int:
        return self.X_space.shape[0]

    @property
    def P(self) -> int:
        return self.Y.shape[-1]

    @property
    def Y_flat(self) -> np.ndarray:
        """[Nt, Ns*P] site-major head layout for the filters."""
        return self.Y.reshape(self.Nt, self.Ns * self.P)

    def unsort(self, A) -> np.ndarray:
        """Map a grid-shaped array [Nt, Ns, ...] (or [Nt, Ns*P] flat) back to
        one row per ORIGINAL scattered observation row."""
        A = np.asarray(A)
        if A.ndim == 2 and A.shape == (self.Nt, self.Ns * self.P):
            A = A.reshape(self.Nt, self.Ns, self.P)
        return A[self._row_t, self._row_s]

    @property
    def X(self) -> np.ndarray:
        """Full-grid [Nt*Ns, 1+ds] inputs (time-major), for dense oracles."""
        tt = np.repeat(self.t, self.Ns)[:, None]
        ss = np.tile(self.X_space, (self.Nt, 1))
        return np.hstack([tt, ss])


def pad_with_nan_to_make_grid(X, Y):
    """Scattered (t, s, y) rows → full-grid rows with NaN fill.

    Returns (n_added, X_grid [Nt*Ns, 1+ds], Y_grid [Nt*Ns, P]) where the
    FIRST N rows are the original X, Y (same order) and the remainder are the
    grid completion with NaN observations — exactly the reference's contract
    (`data/sequential.py:9`).
    """
    X = _as_2d(X)
    Y = np.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    d = SpatioTemporalData.from_scattered(X, Y)
    present = np.zeros((d.Nt, d.Ns), dtype=bool)
    present[d._row_t, d._row_s] = True
    miss_t, miss_s = np.nonzero(~present)
    X_add = np.hstack([d.t[miss_t][:, None], d.X_space[miss_s]])
    Y_add = np.full((X_add.shape[0], Y.shape[1]), np.nan, dtype=Y.dtype)
    return (
        X_add.shape[0],
        np.vstack([X, X_add]),
        np.vstack([Y, Y_add]),
    )


@dataclass
class TemporallyGroupedData:
    """Ragged time groups padded to a fixed spatial width (ref
    `data/data.py:727`, `data/sequential.py:171`).

    Unlike the full grid (Nt x Ns_total, mostly NaN for moving sensors), each
    time step keeps ONLY its own observation locations, padded to the max
    group size with filler points + NaN data. The models consume this through
    a time-VARYING observation matrix: H_t = w(X_st[t]) built from the
    spatial conditional at that step's points (see
    `transforms.operators.ScatteredSpatialHead`).

    Attributes
    ----------
    t : [Nt] sorted unique times.
    X_st : [Nt, Ng, ds] per-time spatial points (filler rows hold the
        nearest real point; their Y is NaN so they are masked in the filter).
    Y_st : [Nt, Ng, P] NaN-padded data.
    """

    t: np.ndarray
    X_st: np.ndarray
    Y_st: np.ndarray
    _row_t: np.ndarray = field(repr=False)
    _row_j: np.ndarray = field(repr=False)
    X_raw: np.ndarray = field(repr=False, default=None)  # original rows
    Y_raw: np.ndarray = field(repr=False, default=None)

    @classmethod
    def from_scattered(cls, X, Y) -> "TemporallyGroupedData":
        X = _as_2d(X)
        Y = np.asarray(Y)
        if Y.ndim == 1:
            Y = Y[:, None]
        order = np.lexsort(np.rot90(X))  # time-major stable sort
        inv = np.argsort(order, kind="stable")
        Xs, Ys = X[order], Y[order]
        t_u, t_idx, counts = np.unique(
            Xs[:, 0], return_inverse=True, return_counts=True
        )
        Nt, Ng, P = t_u.shape[0], int(counts.max()), Y.shape[1]
        ds = X.shape[1] - 1
        # position of each sorted row inside its time group
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        j_idx = np.arange(Xs.shape[0]) - starts[t_idx]
        X_st = np.zeros((Nt, Ng, ds), dtype=Xs.dtype)
        # filler = the group's own first point (valid location, NaN data)
        X_st[:] = Xs[starts, 1:][:, None, :]
        X_st[t_idx, j_idx] = Xs[:, 1:]
        Y_st = np.full((Nt, Ng, P), np.nan, dtype=np.result_type(Y.dtype, np.float32))
        Y_st[t_idx, j_idx] = Ys
        return cls(
            t=t_u, X_st=X_st, Y_st=Y_st,
            _row_t=t_idx[inv], _row_j=j_idx[inv],
            X_raw=np.asarray(X), Y_raw=Y,
        )

    @property
    def Nt(self) -> int:
        return self.t.shape[0]

    @property
    def Ng(self) -> int:
        return self.X_st.shape[1]

    @property
    def P(self) -> int:
        return self.Y_st.shape[-1]

    @property
    def Y_flat(self) -> np.ndarray:
        return self.Y_st.reshape(self.Nt, self.Ng * self.P)

    def unsort(self, A) -> np.ndarray:
        """[Nt, Ng, ...] (or [Nt, Ng*P]) → one row per original input row."""
        A = np.asarray(A)
        if A.ndim == 2 and A.shape == (self.Nt, self.Ng * self.P):
            A = A.reshape(self.Nt, self.Ng, self.P)
        return A[self._row_t, self._row_j]


def spatial_minibatch_indices(rng, Ns: int, batch: int) -> np.ndarray:
    """Uniform spatial-site minibatch (ref `data/data.py:782-791`). The ELL
    scale factor is Ns/batch; drawn WITH replacement like the reference."""
    return rng.integers(0, Ns, size=(batch,))

"""Host-side (numpy) time-grid assembly.

Counterpart of the reference's sequential-data sorting/padding layer
(`data/sequential.py:9` pad_with_nan_to_make_grid, `data/data.py:353` sort).
Deliberately numpy, outside jit — grids are built once per dataset; the
jitted math consumes fixed, sorted arrays (same split as the reference).
"""
from __future__ import annotations

import numpy as np

__all__ = ["merge_time_grids", "sort_time_series"]


def sort_time_series(t, Y):
    """Sort (t [N], Y [N, p]) by time; returns sorted copies + inverse index."""
    t = np.asarray(t).ravel()
    Y = np.asarray(Y)
    order = np.argsort(t, kind="stable")
    inv = np.argsort(order, kind="stable")
    return t[order], Y[order], inv


def merge_time_grids(*series, dtype=np.float64):
    """Merge per-head time series onto one NaN-padded grid.

    series: (t_h [N_h], y_h [N_h]) per head h. Returns (t [T] sorted unique,
    Y [T, H]) where Y[i, h] = y_h at t[i] or NaN. Duplicate times within one
    head must not conflict.
    """
    all_t = np.unique(np.concatenate([np.asarray(t).ravel() for t, _ in series]))
    H = len(series)
    Y = np.full((all_t.shape[0], H), np.nan, dtype=dtype)
    for h, (t_h, y_h) in enumerate(series):
        t_h = np.asarray(t_h).ravel()
        y_h = np.asarray(y_h).ravel()
        idx = np.searchsorted(all_t, t_h)
        Y[idx, h] = y_h
    return all_t.astype(dtype), Y

"""Point-array normalisation shared across models and zoo recipes.

Package-wide convention (the kernels' `_as_2d`): a 1-D array of points is
N points in ONE dimension — a COLUMN. `np/jnp.atleast_2d` silently makes it
one N-dimensional ROW instead, which broadcasts through kernel evaluation
with the wrong geometry (found live twice: `deriv_vgp(Z=linspace(...))`
trained on a single 30-D inducing point; `SVGP.predict_f(t_test)` evaluated
one 120-D query). Every user-facing entry point routes through here.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["as_points"]


def as_points(A, dtype=None, D=None, what="query points") -> jnp.ndarray:
    """[N] -> [N, 1]; [N, D] unchanged; scalars become [1, 1].

    `D`: expected input dimension — raises a clear error on mismatch
    (models pass their training-input dim)."""
    A = jnp.asarray(A, dtype) if dtype is not None else jnp.asarray(A)
    if A.ndim == 0:
        A = A[None]
    if A.ndim == 1:
        A = A[:, None]
    if D is not None and A.shape[-1] != D:
        raise ValueError(
            f"{what} have {A.shape[-1]} input dims; expected {D}"
        )
    return A

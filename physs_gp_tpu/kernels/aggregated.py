"""Aggregated (area-averaged) observations.

Counterpart of the reference's aggregation stack (`kernels/aggregated.py:7`,
`transforms/aggregate.py`, `data/data.py:332` AggregatedData): observations
are AVERAGES of f over regions, y_i = (1/|A_i|) ∫_{A_i} f(x) dx + eps. The
kernel between aggregated observations is the double integral of the base
kernel, evaluated here by fixed quadrature over each region — one batched
Gram over all quadrature nodes, then a weighted block-sum (MXU-friendly:
the node Gram is a single big matmul-driven kernel evaluation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.struct import field, module, static
from .base import Kernel

__all__ = ["AggregatedKernel", "uniform_box_nodes"]


def uniform_box_nodes(lows, highs, n_per_dim: int = 4):
    """Quadrature nodes/weights for axis-aligned boxes.

    lows/highs: [R, D] box bounds per region. Returns nodes [R, Q, D] and
    weights [R, Q] (averaging weights summing to 1 per region).
    """
    lows, highs = np.asarray(lows, float), np.asarray(highs, float)
    if lows.ndim == 1:  # R regions in 1-D, NOT one R-dim box
        lows, highs = lows[:, None], highs[:, None]
    R, D = lows.shape
    # midpoint rule per dim
    grids = []
    for d in range(D):
        frac = (np.arange(n_per_dim) + 0.5) / n_per_dim
        grids.append(frac)
    mesh = np.stack(np.meshgrid(*grids, indexing="ij"), -1).reshape(-1, D)
    Q = mesh.shape[0]
    nodes = lows[:, None, :] + mesh[None] * (highs - lows)[:, None, :]
    w = np.full((R, Q), 1.0 / Q)
    return nodes, w


@module
class AggregatedKernel(Kernel):
    """K between region-averages of a base-kernel GP.

    nodes [R, Q, D], weights [R, Q]: per-region quadrature of the average.
    `K(i, j) = sum_{qq'} w_iq w_jq' k(x_iq, x_jq')`.
    """

    base: object
    nodes: jnp.ndarray
    weights: jnp.ndarray

    def K(self, X1_idx, X2_idx):
        """Gram between regions selected by integer index arrays."""
        idx1 = jnp.ravel(X1_idx).astype(int)
        idx2 = jnp.ravel(X2_idx).astype(int)
        n1, w1 = self.nodes[idx1], self.weights[idx1]  # [R1, Q, D], [R1, Q]
        n2, w2 = self.nodes[idx2], self.weights[idx2]
        R1, Q, D = n1.shape
        R2 = n2.shape[0]
        Kfull = self.base.K(n1.reshape(-1, D), n2.reshape(-1, D))
        Kfull = Kfull.reshape(R1, Q, R2, Q)
        return jnp.einsum("iq,iqjp,jp->ij", w1, Kfull, w2)

    def K_diag(self, X_idx):
        idx = jnp.ravel(X_idx).astype(int)
        n, w = self.nodes[idx], self.weights[idx]
        R, Q, D = n.shape
        Kb = jax.vmap(lambda nn: self.base.K(nn, nn))(n)  # [R, Q, Q]
        return jnp.einsum("iq,iqp,ip->i", w, Kb, w)

    def cross_K(self, X_idx, Xs):
        """Covariance between region averages and point evaluations at Xs."""
        idx = jnp.ravel(X_idx).astype(int)
        n, w = self.nodes[idx], self.weights[idx]
        R, Q, D = n.shape
        Kc = self.base.K(n.reshape(-1, D), jnp.atleast_2d(Xs)).reshape(
            R, Q, -1
        )
        return jnp.einsum("iq,iqs->is", w, Kc)

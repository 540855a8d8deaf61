"""Vecchia (nearest-neighbour) GP — sparse exact-GP approximation by ordered
conditioning.

Completes the reference's nearest-neighbour surface
(`/root/reference/src/lib/stgp/transforms/nearest_neighbours.py:34`,
`data/nearest_neighbours_data.py:7`,
`computation/elbos/marginals/dispatched_nearest_neighbours.py:17`) — which
upstream is an unfinished debug path (``breakpoint()`` calls, hard-coded
group shapes) — with a working TPU-first design:

    log p(y) = sum_i log N(y_i | mu_i + c_i^T C_i^{-1} r_{J(i)},
                            k_ii + v - c_i^T C_i^{-1} c_i)

where J(i) is the set of (<= m) nearest PRECEDING points in a maximin
ordering, C_i = K_{J(i)} + v I and c_i = K(X_{J(i)}, x_i). Conditioning on
the OBSERVED process (noise inside C_i) makes each term a scalar Gaussian —
no per-point logdet — and the whole lml one batch of [N, m, m] solves, which
is exactly the shape the Pallas lane-batched Gauss-Jordan (`ops.matrix
.psd_solve`, CLAUDE.md rule 7) was built for: every point's conditional
rides the vector unit in parallel instead of XLA's 3.5 ms/matrix native
path. With m = N-1 the telescoping product is the EXACT joint density, so
the lml equals `BatchGP.log_marginal_likelihood` to machine precision
(gated in tests/test_vecchia.py).

Complexity O(N m^3) time, O(N m^2) memory — the scattered-spatial-data
regime (N ~ 10^5-10^6, D >= 2) where neither the dense Gram (O(N^3)) nor the
Markov time axis applies. Neighbour sets are host-side preprocessing
(`data.neighbours.nearest_neighbour_sets`) and static under jit.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..likelihoods.gaussian import Gaussian, IndependentGaussian
from ..ops.gaussian import mask_covariance
from ..ops.matrix import highest_precision, psd_solve
from ..utils.struct import module
from .ssgp import GaussianMoments

__all__ = ["VecchiaGP"]

_LOG2PI = math.log(2.0 * math.pi)


@module
class VecchiaGP:
    X: jnp.ndarray  # [N, D] inputs IN CONDITIONING ORDER
    Y: jnp.ndarray  # [N, 1] observations in the same order (NaN = missing)
    kernel: object
    likelihood: object  # Gaussian (response-Vecchia needs conjugate noise)
    # index arrays are stored as FLOATS (exact for N < 2^24 in fp32, 2^53 in
    # fp64) and cast back to int in-method: trainers differentiate the WHOLE
    # model pytree (trainers/trainer.py:56), and integer leaves break
    # jax.grad. trainable_mask marks them False like any data leaf.
    nbrs: jnp.ndarray  # [N, m] neighbour indices (into ordered rows)
    nbr_mask: jnp.ndarray  # [N, m] 1.0 = real neighbour, 0.0 = padding
    order: jnp.ndarray  # [N] permutation applied to the caller's rows
    mean: object = None  # optional Mean (means/mean.py)

    @classmethod
    def init(
        cls,
        X,
        Y,
        kernel,
        likelihood=None,
        *,
        m: int = 16,
        ordering: str | np.ndarray | None = "maximin",
    ) -> "VecchiaGP":
        """Build from raw (unordered) data: computes the maximin ordering and
        the per-point conditioning sets host-side, stores everything in the
        ordered layout. X/Y must be concrete here (not traced)."""
        from ..data.neighbours import nearest_neighbour_sets
        from ..utils.shapes import as_points

        X = np.asarray(as_points(jnp.asarray(X)))
        Y = np.asarray(Y, dtype=X.dtype).reshape(X.shape[0], -1)
        if Y.shape[1] != 1:
            raise ValueError(
                f"VecchiaGP is single-output; got Y with {Y.shape[1]} "
                "columns (use one model per output or an LMC BatchGP)"
            )
        order, nbrs, mask = nearest_neighbour_sets(X, m, ordering=ordering)
        if likelihood is None:
            likelihood = Gaussian()
        return cls(
            X=jnp.asarray(X[order]),
            Y=jnp.asarray(Y[order]),
            kernel=kernel,
            likelihood=likelihood,
            nbrs=jnp.asarray(nbrs, dtype=X.dtype),
            nbr_mask=jnp.asarray(mask, dtype=X.dtype),
            order=jnp.asarray(order, dtype=X.dtype),
            mean=None,
        )

    # -- shared pieces -----------------------------------------------------
    @property
    def n_outputs(self) -> int:
        return 1

    def _noise_var(self) -> jnp.ndarray:
        if isinstance(self.likelihood, IndependentGaussian):
            return self.likelihood._v[0]
        return jnp.asarray(self.likelihood.variance.value)

    def _mu(self, X) -> jnp.ndarray | None:
        if self.mean is None:
            return None
        mean = self.mean[0] if isinstance(self.mean, (list, tuple)) else self.mean
        return mean(X)

    def _residuals(self):
        """(r, obs): centred observations [N] and the finite-y mask [N]."""
        y = self.Y[:, 0]
        obs = jnp.isfinite(y).astype(self.X.dtype)
        mu = self._mu(self.X)
        r = jnp.nan_to_num(y) - (0.0 if mu is None else mu)
        return jnp.where(obs > 0, r, 0.0), obs

    def _conditionals(self, Xq, nbrs, w, r):
        """Batched per-point conditionals given conditioning sets.

        Xq [B, D] query points, nbrs [B, m] indices into self.X, w [B, m]
        neighbour masks, r [N] centred observations. Returns (mean_adj [B],
        var [B]): the conditional N(mu(xq) + mean_adj, var) of the LATENT f
        at each query given the observed y at its conditioning set.
        """
        v = self._noise_var()
        Xn = self.X[nbrs]  # [B, m, D]
        rn = r[nbrs] * w  # [B, m]

        def one(xn, xq):
            C = self.kernel.K(xn, xn)
            c = self.kernel.K(xn, xq[None, :])[:, 0]
            return C, c

        C, c = jax.vmap(one)(Xn, Xq)  # [B, m, m], [B, m]
        mI = jnp.eye(C.shape[-1], dtype=C.dtype)
        Cm = mask_covariance(C + v * mI, w)
        c = c * w
        W = psd_solve(Cm, jnp.stack([c, rn], axis=-1))  # [B, m, 2]
        kq = self.kernel.K_diag(Xq)
        mean_adj = jnp.sum(c * W[..., 1], axis=-1)
        var = kq - jnp.sum(c * W[..., 0], axis=-1)
        return mean_adj, var

    # -- inference ----------------------------------------------------------
    @highest_precision
    def log_marginal_likelihood(self) -> jnp.ndarray:
        """Vecchia lml: sum of scalar conditional log-densities. Exact when
        every point conditions on all predecessors (m = N-1)."""
        r, obs = self._residuals()
        nbrs = self.nbrs.astype(jnp.int32)
        w = self.nbr_mask * obs[nbrs]  # drop missing-y neighbours
        mean_adj, fvar = self._conditionals(self.X, nbrs, w, r)
        yvar = fvar + self._noise_var()
        ll = -0.5 * (_LOG2PI + jnp.log(yvar) + (r - mean_adj) ** 2 / yvar)
        return jnp.sum(jnp.where(obs > 0, ll, 0.0))

    def get_objective(self) -> jnp.ndarray:
        return -self.log_marginal_likelihood()

    @highest_precision
    def predict_f(self, Xs, m_predict: int | None = None) -> GaussianMoments:
        """Marginal posterior of f at Xs, each point conditioned on its
        m nearest observed training points (jit-safe: neighbour search is a
        top_k over the [Ns, N] distance matrix). Vecchia prediction is
        marginal by construction — use BatchGP for joint test covariances."""
        from ..utils.shapes import as_points

        Xs = as_points(Xs, D=self.X.shape[-1])
        r, obs = self._residuals()
        m = self.nbrs.shape[1] if m_predict is None else int(m_predict)
        m = min(m, self.X.shape[0])
        d2 = (
            jnp.sum(Xs * Xs, axis=1)[:, None]
            + jnp.sum(self.X * self.X, axis=1)[None, :]
            - 2.0 * (Xs @ self.X.T)
        )
        # missing-y rows can't inform predictions — push them to the back
        d2 = jnp.where(obs[None, :] > 0, d2, jnp.inf)
        neg, nbrs = jax.lax.top_k(-d2, m)  # [Ns, m]
        w = jnp.isfinite(neg).astype(self.X.dtype)
        mean_adj, var = self._conditionals(Xs, nbrs, w, r)
        mu = self._mu(Xs)
        mean = mean_adj if mu is None else mean_adj + mu
        return GaussianMoments(
            mean=mean[:, None], var=jnp.maximum(var, 0.0)[:, None]
        )

    def predict_y(self, Xs) -> GaussianMoments:
        f = self.predict_f(Xs)
        return GaussianMoments(mean=f.mean, var=f.var + self._noise_var())

    def nlpd(self, Xs, Ys) -> jnp.ndarray:
        py = self.predict_y(Xs)
        Ys = jnp.reshape(Ys, py.mean.shape)
        val = 0.5 * (
            _LOG2PI + jnp.log(py.var) + (Ys - py.mean) ** 2 / py.var
        )
        ok = jnp.isfinite(Ys)
        return jnp.sum(jnp.where(ok, jnp.nan_to_num(val), 0.0)) / jnp.sum(ok)

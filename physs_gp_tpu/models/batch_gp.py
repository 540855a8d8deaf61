"""Exact (batch) GP regression — dense conjugate inference.

TPU-native counterpart of the reference's `models/batch_gp.py:27` (lml via
closed form `computation/log_marginal_likelihoods.py:108`, prediction via
dense conditionals `computation/marginals.py:24-618`). Multi-output kernels
(DerivativeKernel, LMC) produce data-major block Grams; Y is [N, P] and NaNs
are handled by the fixed-shape masked-covariance algebra (no dynamic shapes
under jit).

Dense Grams are where the MXU earns its keep: the cross-covariance matmul and
the Cholesky triangular solves are large fp32 matmuls.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..likelihoods.gaussian import Gaussian, IndependentGaussian
from ..ops.gaussian import mask_covariance
from ..ops.matrix import (
    highest_precision,
    log_det_from_chol,
    safe_cholesky,
    solve_lower,
)
from ..utils.struct import module, static
from .ssgp import GaussianMoments

__all__ = ["BatchGP"]

_LOG2PI = math.log(2.0 * math.pi)


@module
class BatchGP:
    X: jnp.ndarray  # [N, D]
    Y: jnp.ndarray  # [N, P] (NaN = missing)
    kernel: object
    likelihood: object
    mean: object = None  # optional Mean (or list per output; means/mean.py)
    # solver="cg" replaces the Cholesky factorization with matrix-free
    # iterative inference (ops/cg.py: Jacobi-PCG solves + SLQ logdet) — the
    # reference's settings.linear_solver=CG mode (`computation/linalg.py:34`)
    # as a static per-model choice. Use for Grams too large to factor; the
    # lml's logdet becomes a deterministic-given-seed unbiased estimate.
    solver: str = static(default="cholesky")
    cg_tol: float = static(default=1e-6)
    slq_probes: int = static(default=32)
    slq_iters: int = static(default=48)

    @property
    def n_outputs(self) -> int:
        return getattr(self.kernel, "n_outputs", 1)

    def _mu(self, X) -> jnp.ndarray | None:
        """[N, P] prior-mean values, or None (zero mean)."""
        if self.mean is None:
            return None
        means = (
            self.mean if isinstance(self.mean, (list, tuple))
            else [self.mean] * self.n_outputs
        )
        return jnp.stack([m(X) for m in means], axis=1)

    def _noise_diag(self, N: int) -> jnp.ndarray:
        """Flattened per-entry noise variances [N*P] (data-major)."""
        P = self.n_outputs
        if isinstance(self.likelihood, IndependentGaussian):
            v = self.likelihood._v  # [P]
            return jnp.tile(v, N)
        return jnp.broadcast_to(self.likelihood.variance.value, (N * P,))

    def _masked_gram(self):
        N = self.X.shape[0]
        mu = self._mu(self.X)
        Yc = self.Y if mu is None else self.Y - mu
        yf = Yc.reshape(-1)
        mask = jnp.isfinite(yf).astype(self.X.dtype)
        K = self.kernel.K(self.X, self.X)
        Ky = K + jnp.diag(self._noise_diag(N))
        Km = mask_covariance(Ky, mask)
        y0 = jnp.where(mask > 0, jnp.nan_to_num(yf), 0.0)
        return Km, y0, mask

    def _masked_chol(self):
        Km, y0, mask = self._masked_gram()
        return safe_cholesky(Km), y0, mask

    @highest_precision
    def log_marginal_likelihood(self) -> jnp.ndarray:
        if self.solver == "cg":
            from ..ops.cg import cg_solve, slq_logdet

            Km, y0, mask = self._masked_gram()
            alpha = cg_solve(Km, y0, tol=self.cg_tol)
            # fixed key: the lml is a deterministic function of the params
            # (unbiased over keys; masked unit-diagonal rows contribute 0)
            ld = slq_logdet(
                Km,
                jax.random.PRNGKey(0),
                n_probes=self.slq_probes,
                lanczos_iters=self.slq_iters,
            )
            n_obs = jnp.sum(mask)
            return -0.5 * (jnp.sum(y0 * alpha) + ld + n_obs * _LOG2PI)
        L, y0, mask = self._masked_chol()
        alpha = solve_lower(L, y0[:, None])[:, 0]
        n_obs = jnp.sum(mask)
        return -0.5 * (
            jnp.sum(alpha * alpha) + log_det_from_chol(L) + n_obs * _LOG2PI
        )

    def get_objective(self) -> jnp.ndarray:
        return -self.log_marginal_likelihood()

    @highest_precision
    def predict_f(self, Xs, full_cov: bool = False):
        """Posterior q(f*) at new inputs: [Ns, P] moments (data-major)."""
        from ..utils.shapes import as_points

        Xs = as_points(Xs, D=self.X.shape[-1] if self.X.ndim > 1 else 1)
        P = self.n_outputs
        if self.solver == "cg":
            return self._predict_f_cg(Xs, full_cov)
        L, y0, mask = self._masked_chol()
        Kxs = self.kernel.K(self.X, Xs)  # [N*P, Ns*P]
        Kxs = Kxs * mask[:, None]  # zero rows for missing entries
        A = solve_lower(L, Kxs)  # [N*P, Ns*P]
        alpha = solve_lower(L, y0[:, None])
        mean = (A.T @ alpha)[:, 0]
        mu_s = self._mu(Xs)
        if full_cov:
            Kss = self.kernel.K(Xs, Xs)
            cov = Kss - A.T @ A
            mean = mean.reshape(-1, P)
            return (mean if mu_s is None else mean + mu_s), cov
        kd = self.kernel.K_diag(Xs)
        var = kd - jnp.sum(A * A, axis=0)
        mean = mean.reshape(-1, P)
        if mu_s is not None:
            mean = mean + mu_s
        return GaussianMoments(mean=mean, var=var.reshape(-1, P))

    def _predict_f_cg(self, Xs, full_cov: bool):
        """Matrix-free posterior: ONE multi-RHS PCG solve for [y0 | Kxs]
        (all Ns*P + 1 columns ride the same batched matvec matmuls)."""
        from ..ops.cg import cg_solve

        Km, y0, mask = self._masked_gram()
        P = self.n_outputs
        Kxs = self.kernel.K(self.X, Xs) * mask[:, None]  # [N*P, Ns*P]
        W = cg_solve(
            Km, jnp.concatenate([y0[:, None], Kxs], axis=1), tol=self.cg_tol
        )
        mean = Kxs.T @ W[:, 0]
        mu_s = self._mu(Xs)
        if full_cov:
            Kss = self.kernel.K(Xs, Xs)
            cov = Kss - Kxs.T @ W[:, 1:]
            mean = mean.reshape(-1, P)
            return (mean if mu_s is None else mean + mu_s), cov
        kd = self.kernel.K_diag(Xs)
        var = kd - jnp.sum(Kxs * W[:, 1:], axis=0)
        mean = mean.reshape(-1, P)
        if mu_s is not None:
            mean = mean + mu_s
        return GaussianMoments(mean=mean, var=var.reshape(-1, P))

    def predict_y(self, Xs) -> GaussianMoments:
        f = self.predict_f(Xs)
        Ns = f.mean.shape[0]
        nv = self._noise_diag(Ns).reshape(Ns, self.n_outputs)
        return GaussianMoments(mean=f.mean, var=f.var + nv)

    def sample_f(self, key, Xs, n_samples: int) -> jnp.ndarray:
        """JOINT posterior samples [S, Ns, P] at Xs (ref `models/vgp.py:284`
        samples surface, diagonal=False): mean + chol(posterior cov) ε."""
        from ..ops.matrix import safe_cholesky_rel

        mean, cov = self.predict_f(Xs, full_cov=True)
        Lc = safe_cholesky_rel(cov)
        eps = jax.random.normal(key, (n_samples, cov.shape[0]), cov.dtype)
        return mean[None] + (eps @ Lc.T).reshape(
            n_samples, *mean.shape
        )

    def nlpd(self, Xs, Ys) -> jnp.ndarray:
        """Mean negative log predictive density (Gaussian closed form)."""
        py = self.predict_y(Xs)
        Ys = jnp.reshape(Ys, py.mean.shape)
        val = 0.5 * (
            _LOG2PI + jnp.log(py.var) + (Ys - py.mean) ** 2 / py.var
        )
        ok = jnp.isfinite(Ys)
        return jnp.sum(jnp.where(ok, jnp.nan_to_num(val), 0.0)) / jnp.sum(ok)

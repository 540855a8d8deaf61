"""Gaussian Process Regression Network (GPRN) — nonlinear multi-output mixing.

Counterpart of the reference's `GPRN` transform family
(`transforms/multi_output.py:14-163`, `zoo/multi_output.py`): outputs
y_p(x) = sum_l W_pl(x) g_l(x) + eps, where the mixing weights W_pl AND the
latent functions g_l are GPs. Inference is mean-field sparse VI over the
stacked latents with a reparameterised-MC expected log-likelihood (the
reference routes this through its sampled-ELL dispatch,
`dispatched_ell.py:255`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.gaussian import gaussian_kl
from ..ops.matrix import highest_precision, solve_lower
from ..utils.params import (
    Param,
    fill_triangular,
    param,
    positive_param,
    tril_param,
)
from ..utils.struct import field, module, replace, static
from .ssgp import GaussianMoments
from .svgp import _chol_gram

__all__ = ["GPRN"]

_LOG2PI = math.log(2.0 * math.pi)


@module
class GPRN:
    """Mean-field whitened sparse VI for y = W(x) g(x) + noise.

    Latent order: [W_11..W_1L, ..., W_P1..W_PL, g_1..g_L] (P*L + L latents).
    """

    X: jnp.ndarray  # [N, D]
    Y: jnp.ndarray  # [N, P]
    Z: jnp.ndarray  # [M, D]
    kernel_w: object
    kernel_g: object
    noise: Param
    q_mu: Param  # [L_tot, M]
    q_sqrt: Param  # [L_tot, M(M+1)/2]
    seed: int = static(default=0)  # static: uint32 key leaves break jax.grad
    n_latent: int = static(default=1)
    n_mc: int = static(default=16)

    @property
    def key(self):
        return jax.random.PRNGKey(self.seed)

    @classmethod
    def init(cls, X, Y, Z, kernel_w, kernel_g, n_latent=1, noise=0.1,
             n_mc=16, key=None):
        X, Y, Z = jnp.atleast_2d(X), jnp.atleast_2d(Y), jnp.atleast_2d(Z)
        P = Y.shape[1]
        L_tot = P * n_latent + n_latent
        M = Z.shape[0]
        tril0 = tril_param(0.3 * jnp.eye(M)).raw
        # break the W*g = 0 saddle: weight latents start near 1, latents at 0
        q_mu0 = jnp.zeros((L_tot, M)).at[: P * n_latent].set(1.0)
        return cls(
            X=X, Y=Y, Z=Z, kernel_w=kernel_w, kernel_g=kernel_g,
            noise=positive_param(noise),
            q_mu=param(q_mu0),
            q_sqrt=param(jnp.tile(tril0[None], (L_tot, 1))),
            seed=key if isinstance(key, int) else 0,
            n_latent=n_latent, n_mc=n_mc,
        )

    def _marginals(self, Xs):
        """Whitened per-latent marginals at Xs: mean/var [L_tot, Ns]."""
        M = self.Z.shape[0]
        P = self.Y.shape[1]
        L = self.n_latent
        out_means, out_vars = [], []
        for kern, n_lat, sl in (
            (self.kernel_w, P * L, slice(0, P * L)),
            (self.kernel_g, L, slice(P * L, P * L + L)),
        ):
            Kzz = kern.K(self.Z, self.Z)
            Lz = _chol_gram(Kzz)
            A = solve_lower(Lz, kern.K(self.Z, Xs))  # [M, Ns]
            kd = kern.K_diag(Xs)
            mu = self.q_mu.value[sl] @ A  # [n_lat, Ns]
            Lq = fill_triangular(self.q_sqrt.value[sl], M)  # [n_lat, M, M]
            SA = jnp.einsum("lmk,mn->lkn", Lq, A)  # [n_lat, M, Ns]
            var = kd[None] - jnp.sum(A * A, 0)[None] + jnp.sum(SA**2, 1)
            out_means.append(mu)
            out_vars.append(jnp.maximum(var, 1e-12))
        return (
            jnp.concatenate(out_means, 0),
            jnp.concatenate(out_vars, 0),
        )

    def _kl(self):
        M = self.Z.shape[0]
        Lq = fill_triangular(self.q_sqrt.value, M)  # [L_tot, M, M]
        qm = self.q_mu.value
        zero = jnp.zeros((M,), qm.dtype)
        eye = jnp.eye(M, dtype=qm.dtype)
        return jnp.sum(
            jax.vmap(lambda m, L: gaussian_kl(m, L, zero, eye))(qm, Lq)
        )

    @highest_precision
    def elbo(self) -> jnp.ndarray:
        mu, var = self._marginals(self.X)  # [L_tot, N]
        P = self.Y.shape[1]
        L = self.n_latent
        N = self.X.shape[0]
        eps = jax.random.normal(
            self.key, (self.n_mc,) + mu.shape, mu.dtype
        )
        f = mu[None] + jnp.sqrt(var)[None] * eps  # [S, L_tot, N]
        W = f[:, : P * L].reshape(self.n_mc, P, L, N)
        g = f[:, P * L :]  # [S, L, N]
        y_hat = jnp.einsum("spln,sln->snp", W, g)  # [S, N, P]
        nv = self.noise.value
        ok = jnp.isfinite(self.Y)
        y0 = jnp.nan_to_num(self.Y)
        ll = -0.5 * (_LOG2PI + jnp.log(nv) + (y0[None] - y_hat) ** 2 / nv)
        ell = jnp.sum(jnp.where(ok[None], ll, 0.0)) / self.n_mc
        return ell - self._kl()

    def get_objective(self) -> jnp.ndarray:
        return -self.elbo()

    def predict_f(self, Xs, n_mc: int = 64) -> GaussianMoments:
        """MC moments of the mixed outputs at Xs."""
        mu, var = highest_precision(self._marginals)(jnp.atleast_2d(Xs))
        P = self.Y.shape[1]
        L = self.n_latent
        Ns = jnp.atleast_2d(Xs).shape[0]
        eps = jax.random.normal(
            jax.random.fold_in(self.key, 1), (n_mc,) + mu.shape, mu.dtype
        )
        f = mu[None] + jnp.sqrt(var)[None] * eps
        W = f[:, : P * L].reshape(n_mc, P, L, Ns)
        g = f[:, P * L :]
        y_hat = jnp.einsum("spln,sln->snp", W, g)
        return GaussianMoments(
            mean=jnp.mean(y_hat, 0), var=jnp.var(y_hat, 0)
        )

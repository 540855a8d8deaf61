"""Gaussian Process Regression Network (GPRN) — nonlinear multi-output mixing.

Counterpart of the reference's `GPRN` transform family
(`transforms/multi_output.py:14-163`, `zoo/multi_output.py`): outputs
y_p(x) = sum_l W_pl(x) g_l(x) + eps, where the mixing weights W_pl AND the
latent functions g_l are GPs. Inference is mean-field sparse VI over the
stacked latents with a reparameterised-MC expected log-likelihood (the
reference routes this through its sampled-ELL dispatch,
`dispatched_ell.py:255`).

Mixing parameterisations (`mixing=`; ref `GPRN`/`GPRN_Exp`/`GPRN_LDL`/
`GPRN_DRD`, `multi_output.py:39-203`):
- "plain":    y = W g, W the P*L weight GPs;
- "softplus": y = softplus(W) g — positive mixing weights;
- "ldl":      W unit-lower-triangular, strict-lower entries are GPs;
- "drd":      W = diag(scales) @ corr-chol(2*Phi(W_gp)-1) — time/space-
              varying correlation with trainable static scales (L == P).
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
    drd_scales: object = None  # [P] positive Param (mixing="drd" only)
    seed: int = static(default=0)  # static: uint32 key leaves break jax.grad
    n_latent: int = static(default=1)
    n_mc: int = static(default=16)
    mixing: str = static(default="plain")

    @property
    def key(self):
        return jax.random.PRNGKey(self.seed)

    @staticmethod
    def _n_w(mixing: str, P: int, L: int) -> int:
        """Number of mixing-weight latent GPs for each parameterisation."""
        if mixing in ("plain", "softplus"):
            return P * L
        if mixing == "ldl":
            import numpy as onp

            return len(onp.tril_indices(P, -1, L)[0])
        if mixing == "drd":
            if L != P:
                raise ValueError(
                    f"mixing='drd' needs n_latent == n_outputs (got {L} vs {P})"
                )
            return P * (P - 1) // 2
        raise ValueError(f"unknown GPRN mixing {mixing!r}")

    @classmethod
    def init(cls, X, Y, Z, kernel_w, kernel_g, n_latent=1, noise=0.1,
             n_mc=16, key=None, mixing: str = "plain"):
        from ..utils.shapes import as_points

        X, Y, Z = as_points(X), as_points(Y), as_points(Z)
        P = Y.shape[1]
        n_w = cls._n_w(mixing, P, n_latent)
        L_tot = n_w + n_latent
        M = Z.shape[0]
        tril0 = tril_param(0.3 * jnp.eye(M)).raw
        q_mu0 = jnp.zeros((L_tot, M))
        if mixing in ("plain", "softplus"):
            # break the W*g = 0 saddle: weight latents start near 1
            q_mu0 = q_mu0.at[:n_w].set(1.0)
        # ldl/drd have a unit diagonal built in — zeros give W = I
        return cls(
            X=X, Y=Y, Z=Z, kernel_w=kernel_w, kernel_g=kernel_g,
            noise=positive_param(noise),
            q_mu=param(q_mu0),
            q_sqrt=param(jnp.tile(tril0[None], (L_tot, 1))),
            drd_scales=(
                positive_param(jnp.ones(P)) if mixing == "drd" else None
            ),
            seed=key if isinstance(key, int) else 0,
            n_latent=n_latent, n_mc=n_mc, mixing=mixing,
        )

    def _mix(self, f, Ns):
        """f [S, L_tot, Ns] latent samples -> mixed outputs y_hat [S, Ns, P]."""
        P = self.Y.shape[1]
        L = self.n_latent
        S = f.shape[0]
        n_w = self._n_w(self.mixing, P, L)
        fW = f[:, :n_w]  # [S, n_w, Ns]
        g = f[:, n_w:]  # [S, L, Ns]
        if self.mixing in ("plain", "softplus"):
            W = fW.reshape(S, P, L, Ns)
            if self.mixing == "softplus":
                W = jax.nn.softplus(W)
            return jnp.einsum("spln,sln->snp", W, g)
        if self.mixing == "ldl":
            import numpy as onp

            rows, cols = onp.tril_indices(P, -1, L)
            W = jnp.broadcast_to(
                jnp.eye(P, L, dtype=f.dtype), (S, Ns, P, L)
            )
            W = W.at[:, :, rows, cols].set(jnp.moveaxis(fW, 1, -1))
            return jnp.einsum("snpl,sln->snp", W, g)
        # drd: correlation Cholesky of squashed weight GPs, static scales
        from ..likelihoods.dynamic_covariance import correlation_cholesky

        z = 2.0 * jax.scipy.stats.norm.cdf(jnp.moveaxis(fW, 1, -1)) - 1.0
        Lc = correlation_cholesky(z, P)  # [S, Ns, P, P]
        W = self.drd_scales.value[:, None] * Lc
        return jnp.einsum("snpl,sln->snp", W, g)

    def _marginals(self, Xs):
        """Whitened per-latent marginals at Xs: mean/var [L_tot, Ns]."""
        M = self.Z.shape[0]
        P = self.Y.shape[1]
        L = self.n_latent
        n_w = self._n_w(self.mixing, P, L)
        out_means, out_vars = [], []
        for kern, n_lat, sl in (
            (self.kernel_w, n_w, slice(0, n_w)),
            (self.kernel_g, L, slice(n_w, n_w + L)),
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
    def elbo(self, key=None) -> jnp.ndarray:
        """key: fresh PRNG key per training step for unbiased MC ELL;
        None falls back to the static seed (frozen noise)."""
        mu, var = self._marginals(self.X)  # [L_tot, N]
        P = self.Y.shape[1]
        L = self.n_latent
        N = self.X.shape[0]
        eps = jax.random.normal(
            self.key if key is None else key, (self.n_mc,) + mu.shape, mu.dtype
        )
        f = mu[None] + jnp.sqrt(var)[None] * eps  # [S, L_tot, N]
        y_hat = self._mix(f, N)  # [S, N, P]
        nv = self.noise.value
        ok = jnp.isfinite(self.Y)
        y0 = jnp.nan_to_num(self.Y)
        ll = -0.5 * (_LOG2PI + jnp.log(nv) + (y0[None] - y_hat) ** 2 / nv)
        ell = jnp.sum(jnp.where(ok[None], ll, 0.0)) / self.n_mc
        return ell - self._kl()

    def get_objective(self, key=None) -> jnp.ndarray:
        return -self.elbo(key=key)

    def predict_f(self, Xs, n_mc: int = 64) -> GaussianMoments:
        """MC moments of the mixed outputs at Xs."""
        from ..utils.shapes import as_points

        Xs = as_points(Xs)
        mu, var = highest_precision(self._marginals)(Xs)
        P = self.Y.shape[1]
        L = self.n_latent
        Ns = Xs.shape[0]
        eps = jax.random.normal(
            jax.random.fold_in(self.key, 1), (n_mc,) + mu.shape, mu.dtype
        )
        f = mu[None] + jnp.sqrt(var)[None] * eps
        y_hat = self._mix(f, Ns)
        return GaussianMoments(
            mean=jnp.mean(y_hat, 0), var=jnp.var(y_hat, 0)
        )

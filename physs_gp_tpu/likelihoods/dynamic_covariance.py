"""Dynamic covariance (multivariate volatility) likelihood.

Counterpart of the reference's covariance-regression stack:
`transforms/covariance.py:21` LKJStaticVarianceProcess (latent GPs → a
correlation Cholesky through the canonical partial-correlation construction,
scaled by static variances) + `likelihood/dynamic_covariance_likelihood.py:9`
DynamicCovarianceGaussian (y_t ~ N(0, Σ(f_t))).

Here the Q = P(P−1)/2 latent processes are heads of a `StackedMarkov` CVI
model; the ELL E_q[log N(y_t | 0, Σ(f_t))] is evaluated by reparameterised MC
through the joint block posterior (same machinery as the nonlinear PDE
residuals), so latent correlations enter the expectation.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..utils.params import Param, positive_param
from ..utils.struct import field, module, static
from .gaussian import Likelihood

__all__ = ["correlation_cholesky", "DynamicCovarianceGaussian"]

_LOG2PI = math.log(2.0 * math.pi)


def correlation_cholesky(z: jnp.ndarray, P: int) -> jnp.ndarray:
    """z [..., Q] in (−1, 1) → L [..., P, P], Cholesky of a correlation matrix.

    Canonical partial-correlation (hyperspherical) construction — every
    z ∈ (−1,1)^Q maps to a valid correlation Cholesky with unit-norm rows:
        L[i, 0] = z_i0,  L[i, j] = z_ij · √(1 − Σ_{k<j} L[i,k]²),
        L[i, i] = √(1 − Σ_{k<i} L[i,k]²).
    (Same parameterisation as the reference's `get_correlation_cholesky`,
    `computation/parameter_transforms.py:98` — reimplemented row-recursively.)
    """
    batch = z.shape[:-1]
    tril_r, tril_c = jnp.tril_indices(P, -1)
    Zm = jnp.zeros(batch + (P, P), z.dtype).at[..., tril_r, tril_c].set(z)
    L = jnp.zeros(batch + (P, P), z.dtype).at[..., 0, 0].set(1.0)
    for i in range(1, P):
        rem = jnp.ones(batch, z.dtype)  # 1 - sum_k L[i,k]^2 so far
        for j in range(i):
            lij = Zm[..., i, j] * jnp.sqrt(jnp.maximum(rem, 1e-30))
            L = L.at[..., i, j].set(lij)
            rem = rem - lij * lij
        L = L.at[..., i, i].set(jnp.sqrt(jnp.maximum(rem, 1e-30)))
    return L


@module
class DynamicCovarianceGaussian(Likelihood):
    """y_t ~ N(0, Σ_t) with Σ_t = D L(f_t) L(f_t)^T D (ref
    `dynamic_covariance_likelihood.py:12`).

    f_t are the Q latent-correlation heads (z = tanh of the latent GPs, the
    reference's `correlation_transform`); D = diag(√variances) is static but
    trainable. The observed data lives HERE (`y` field): the model's Y is the
    all-NaN head placeholder, and `site_active_mask` keeps every site live —
    the latents are only ever informed through this joint likelihood.
    """

    y: jnp.ndarray  # [T, P] observations (NaN rows skipped)
    variances: list = field(default_factory=list)  # P positive Params
    n_mc: int = static(default=32)
    seed: int = static(default=0)

    @property
    def P(self) -> int:
        return len(self.variances)

    def site_active_mask(self, Y):
        return jnp.ones_like(Y, dtype=bool)

    def R(self, T: int, p: int = 1) -> jnp.ndarray:
        # surrogate-site observation noise placeholder (identity): sites are
        # initialised from this; the filter only ever sees site (Ỹ, Ṽ)
        return jnp.broadcast_to(jnp.eye(p), (T, p, p))

    def _logp(self, y_row, z):
        """log N(y | 0, D L L^T D) for one sample/time: y [P], z [Q]."""
        P = self.P
        L = correlation_cholesky(z, P)
        d = jnp.sqrt(jnp.stack([v.value for v in self.variances]))
        chol = d[:, None] * L  # chol of Σ
        alpha = jax.scipy.linalg.solve_triangular(chol, y_row, lower=True)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (jnp.sum(alpha * alpha) + logdet + P * _LOG2PI)

    def expected_log_lik_blocks(self, Y_unused, m, S, key=None):
        """MC ELL through the joint block posterior q(f_t) = N(m_t, S_t).

        key=None falls back to the static seed (frozen noise); training
        loops should pass a fresh key per step."""
        from ..ops.matrix import robust_cholesky

        Ls = robust_cholesky(S)
        eps = jax.random.normal(
            jax.random.PRNGKey(self.seed) if key is None else key,
            (self.n_mc,) + m.shape, m.dtype
        )
        f = m[None] + jnp.einsum("tij,ntj->nti", Ls, eps)  # [n, T, Q]
        z = jnp.tanh(f)  # correlation_transform
        y0 = jnp.nan_to_num(self.y)
        ll = jax.vmap(jax.vmap(self._logp))(
            jnp.broadcast_to(y0, (self.n_mc,) + y0.shape), z
        )  # [n, T]
        ok = jnp.all(jnp.isfinite(self.y), axis=-1)
        return jnp.sum(jnp.where(ok, jnp.mean(ll, axis=0), 0.0))

    def natgrad_moments(self, Y_unused, m, S,
                        residual_hessian: str = "gauss_newton", key=None):
        """(g1, g2) for the CVI site update with an EMPIRICAL-FISHER Hessian.

        Bonnet/Price identities give dELL/dm = E[∇_f log p] and
        dELL/dS = ½ E[∇²_f log p]; the exact MC Hessian of the covariance
        likelihood goes indefinite within a few natural-gradient steps
        (observed: NaN by iter ~3 even at lr 0.1). Empirical Fisher replaces
        ∇² with −E[s sᵀ] (s the score), NSD by construction — the same
        stabilisation family as the reference's `laplace_gauss_newton`
        (`cvi_hessian_approximations.py:85-634`).
        """
        from ..ops.matrix import robust_cholesky

        Ls = robust_cholesky(S)
        eps = jax.random.normal(
            jax.random.PRNGKey(self.seed + 1) if key is None
            else jax.random.fold_in(key, 1),
            (self.n_mc,) + m.shape, m.dtype
        )
        f = m[None] + jnp.einsum("tij,ntj->nti", Ls, eps)  # [n, T, Q]
        y0 = jnp.nan_to_num(self.y)

        def lp(y_row, f_row):
            return self._logp(y_row, jnp.tanh(f_row))

        score = jax.vmap(jax.vmap(jax.grad(lp, argnums=1)))(
            jnp.broadcast_to(y0, (self.n_mc,) + y0.shape), f
        )  # [n, T, Q]
        ok = jnp.all(jnp.isfinite(self.y), axis=-1)
        g1 = jnp.where(ok[:, None], jnp.mean(score, axis=0), 0.0)
        g2 = -0.5 * jnp.mean(
            jnp.einsum("nti,ntj->ntij", score, score), axis=0
        )
        g2 = jnp.where(ok[:, None, None], g2, 0.0)
        return g1, g2

    def log_prob(self, y, f):
        z = jnp.tanh(f)
        return self._logp(y, z)

    def conditional_mean(self, f):
        return jnp.zeros_like(f[..., :1])

    def conditional_variance(self, f):
        v = jnp.stack([p.value for p in self.variances])
        return jnp.broadcast_to(v[..., :1], f[..., :1].shape)

    def correlation_path(self, m):
        """Posterior-mean correlation matrices [T, P, P] from head means."""
        z = jnp.tanh(m)
        L = correlation_cholesky(z, self.P)
        return jnp.einsum("tij,tkj->tik", L, L)

"""Composite (multi-head) likelihoods for physics-informed models.

Counterpart of the reference's `ProductLikelihood` over heterogeneous heads
(`likelihood/product_likelihood.py:19`, `zoo/sde_diff.py` lik_arr): column h
of Y is observed through its own elementwise likelihood — e.g.
[Gaussian(data), Gaussian(collocation)] for PDEs, [Gaussian, Probit] for
monotonicity constraints.

`NonlinearResidual` adds a nonlinear PDE residual term evaluated by
reparameterised Monte-Carlo through the joint block posterior q(f_t) —
the TPU-native version of the reference's MC expected-log-likelihood through
nonlinear prior transforms (`dispatched_ell.py:255` compute_ell_for_sample).
"""
from __future__ import annotations

import math

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.matrix import robust_cholesky
from ..utils.params import Param, positive_param
from ..utils.struct import field, module, static
from .gaussian import Likelihood

__all__ = ["CompositeLikelihood", "NonlinearResidual"]

_LOG2PI = math.log(2.0 * math.pi)


@module
class NonlinearResidual:
    """Pseudo-observation 0 = g(f_heads) + eps, eps ~ N(0, noise_var).

    `fn` maps the head vector [..., p] -> residual: scalar [...] (one
    residual per time step — ODEs) or vector [..., C] (one per collocation
    point — PDEs like Allen-Cahn, ref `transforms/pdes.py:223` AllenCahn).
    Evaluated by MC with n_mc reparameterised samples from the full block
    q(f_t) = N(m_t, S_t) so head correlations enter the expectation.
    """

    noise_var: Param = field(default_factory=lambda: positive_param(1e-3))
    fn: Callable = static(default=None)
    n_mc: int = static(default=32)
    seed: int = static(default=0)  # fallback when no key is passed

    @property
    def key(self):
        return jax.random.PRNGKey(self.seed)

    def _samples(self, m, S, key=None):
        # key=None falls back to the static seed (deterministic, but FROZEN
        # noise across iterations — training loops should pass a fresh key
        # per step, ref `computation/integrals/samples.py:116` advances RNG)
        # robust (escalating-jitter) factor: S = H P H^T over nearly
        # linearly-dependent heads is indefinite at fp32 error scale on TPU
        L = robust_cholesky(S)
        eps = jax.random.normal(
            self.key if key is None else key, (self.n_mc,) + m.shape, m.dtype
        )  # [n, T, p]
        return m[None] + jnp.einsum("tij,ntj->nti", L, eps)

    def ell(self, mask, m, S, key=None):
        """mask: [T] 1.0 where the residual is enforced; m [T,p]; S [T,p,p]."""
        f = self._samples(m, S, key)
        r = self.fn(f)  # [n, T] or [n, T, C]
        nv = self.noise_var.value
        ll = -0.5 * (_LOG2PI + jnp.log(nv) + r * r / nv)
        ll = jnp.mean(ll, axis=0)  # [T] or [T, C]
        if ll.ndim == 2:
            ll = jnp.sum(ll, axis=-1)
        return jnp.sum(jnp.where(mask > 0, ll, 0.0))

    def gauss_newton_grads(self, mask, m, S, key=None):
        """(g1, g2) of the residual ELL with the Gauss-Newton Hessian.

        TPU counterpart of the reference's `laplace_gauss_newton` family
        (`natural_gradients/cvi_hessian_approximations.py:85-634`): for the
        Gaussian residual pseudo-likelihood -r(f)^2/2sigma^2,

            g1 = -E[ r(f) J(f) ] / sigma^2           (exact MC gradient)
            g2 = -0.5 E[ J(f) J(f)^T ] / sigma^2     (GN: drop the r * dJ term)

        g2 is negative-semidefinite by construction, so the site precision
        -2 lam2 stays PSD under hard non-conjugacy where the exact MC Hessian
        goes indefinite.
        """
        f = self._samples(m, S, key)  # [n, T, p]
        r = self.fn(f)  # [n, T] or [n, T, C]
        nv = self.noise_var.value
        if r.ndim == 3:
            # vector residual: J [n, T, C, p]; sum GN terms over C
            J = jax.vmap(jax.vmap(jax.jacfwd(self.fn)))(f)
            g1 = -jnp.mean(jnp.einsum("ntc,ntcp->ntp", r, J), axis=0) / nv
            g2 = -0.5 * jnp.mean(
                jnp.einsum("ntcp,ntcq->ntpq", J, J), axis=0
            ) / nv
        else:
            J = jax.vmap(jax.vmap(jax.grad(self.fn)))(f)  # [n, T, p]
            g1 = -jnp.mean(r[..., None] * J, axis=0) / nv  # [T, p]
            g2 = -0.5 * jnp.mean(
                J[..., :, None] * J[..., None, :], axis=0
            ) / nv  # [T, p, p]
        g1 = jnp.where(mask[:, None] > 0, g1, 0.0)
        g2 = jnp.where(mask[:, None, None] > 0, g2, 0.0)
        return g1, g2


@module
class CompositeLikelihood(Likelihood):
    """Per-column elementwise likelihoods + optional nonlinear residual.

    residual_mask selects the rows (time steps) where the nonlinear residual
    is enforced (collocation points); None means every step.
    """

    heads: list = field(default_factory=list)
    residual: object = None
    residual_mask: object = None

    def site_active_mask(self, Y):
        """[T, p] mask of site elements that can carry information.

        Data elements (finite Y) are always active. When a nonlinear residual
        is present, EVERY head is additionally active at the residual rows —
        the full-state-observed surrogate semantics of the reference
        (`conjugate_gaussian_approximate_posterior.py:174-232`): the residual
        couples all heads, so all of them need live site rows there.
        """
        act = jnp.isfinite(Y)
        if self.residual is not None:
            rows = (
                jnp.ones(Y.shape[0], bool)
                if self.residual_mask is None
                else self.residual_mask > 0
            )
            act = act | rows[:, None]
        return act

    def natgrad_moments(self, Y, m, S, residual_hessian: str = "exact",
                        key=None):
        """(g1, g2) = d ELL / d(m, S) for the CVI site update.

        residual_hessian='gauss_newton' swaps the residual term's exact MC
        Hessian for the PSD-safe Gauss-Newton form (heads stay exact)."""
        if residual_hessian == "exact" or self.residual is None:
            return jax.grad(
                lambda mm, SS: self.expected_log_lik_blocks(Y, mm, SS, key=key),
                argnums=(0, 1),
            )(m, S)

        def heads_only(mm, SS):
            from .nongaussian import expected_log_lik

            v = jnp.diagonal(SS, axis1=-2, axis2=-1)
            tot = 0.0
            for h, lik in enumerate(self.heads):
                tot = tot + jnp.sum(
                    expected_log_lik(lik, Y[:, h], mm[:, h], v[:, h])
                )
            return tot

        g1, g2 = jax.grad(heads_only, argnums=(0, 1))(m, S)
        mask = (
            jnp.ones(m.shape[0], m.dtype)
            if self.residual_mask is None
            else self.residual_mask
        )
        r1, r2 = self.residual.gauss_newton_grads(mask, m, S, key=key)
        return g1 + r1, g2 + r2

    def expected_log_lik_blocks(self, Y, m, S, key=None):
        """Total ELL given block moments (m [T,p], S [T,p,p])."""
        from .nongaussian import expected_log_lik

        v = jnp.diagonal(S, axis1=-2, axis2=-1)
        total = 0.0
        for h, lik in enumerate(self.heads):
            total = total + jnp.sum(
                expected_log_lik(lik, Y[:, h], m[:, h], v[:, h])
            )
        if self.residual is not None:
            mask = (
                jnp.ones(m.shape[0], m.dtype)
                if self.residual_mask is None
                else self.residual_mask
            )
            total = total + self.residual.ell(mask, m, S, key=key)
        return total

    def predict_y_moments(self, f_mean, f_var, gh_points: int = 20):
        """Per-head moment-matched predictive p(y*) — (mean, var), each [T, p].

        Routes column h of q(f) through head h's own conditional moments by
        Gauss-Hermite quadrature, the reference's per-likelihood predictive
        dispatch (`computation/predictors/y_predictors.py`; product
        likelihoods route per head, `dispatched_ell.py:356-649`). The
        nonlinear residual is a training device and is excluded, as the
        reference excludes its constraint pseudo-observations.
        """
        from ..ops.quadrature import expect_gh

        means, vrs = [], []
        for h, lik in enumerate(self.heads):
            m, v = f_mean[..., h], f_var[..., h]
            ey = expect_gh(lik.conditional_mean, m, v, gh_points)
            ey2 = expect_gh(
                lambda ff, lik=lik: lik.conditional_variance(ff)
                + lik.conditional_mean(ff) ** 2,
                m, v, gh_points,
            )
            means.append(ey)
            vrs.append(ey2 - ey * ey)
        return jnp.stack(means, -1), jnp.stack(vrs, -1)

    def predictive_density(self, y, f_mean, f_var, gh_points: int = 20):
        """Elementwise p(y*_th) = ∫ p(y|f) q(f) df per head; [T, p]."""
        from ..ops.quadrature import expect_gh

        cols = []
        for h, lik in enumerate(self.heads):
            y0 = jnp.nan_to_num(y[..., h])  # quadrature-safe; masked by caller
            cols.append(
                expect_gh(
                    lambda ff, lik=lik, y0=y0: jnp.exp(
                        lik.log_prob(y0[..., None], ff)
                    ),
                    f_mean[..., h], f_var[..., h], gh_points,
                )
            )
        return jnp.stack(cols, -1)

    def predictive_log_density(self, y, f_mean, f_var, gh_points: int = 20):
        """Elementwise log p(y*_th) per head — log-domain GH quadrature.

        fp32-safe: `predictive_density` quadrates exp(log_prob), which
        underflows fp32 at logpdf < -88 (TPU NLPD came back +inf on any
        moderately surprising extrapolation point)."""
        from ..ops.quadrature import expect_gh_log

        cols = []
        for h, lik in enumerate(self.heads):
            y0 = jnp.nan_to_num(y[..., h])  # quadrature-safe; masked by caller
            cols.append(
                expect_gh_log(
                    lambda ff, lik=lik, y0=y0: lik.log_prob(y0[..., None], ff),
                    f_mean[..., h], f_var[..., h], gh_points,
                )
            )
        return jnp.stack(cols, -1)

    def log_prob(self, y, f):
        """Columnwise log-prob (heads only; residual is a training device)."""
        outs = [
            self.heads[h].log_prob(y[..., h, :], f[..., h, :])
            if y.ndim > 2
            else self.heads[h].log_prob(y[..., h], f[..., h])
            for h in range(len(self.heads))
        ]
        return jnp.stack(outs, axis=-1)

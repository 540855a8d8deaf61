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

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.matrix import safe_cholesky
from ..utils.params import Param, positive_param
from ..utils.struct import field, module, static
from .gaussian import Likelihood

__all__ = ["CompositeLikelihood", "NonlinearResidual"]

_LOG2PI = jnp.log(2.0 * jnp.pi)


@module
class NonlinearResidual:
    """Pseudo-observation 0 = g(f_heads) + eps, eps ~ N(0, noise_var).

    `fn` maps the head vector [..., p] -> residual [...]; evaluated by MC
    with n_mc reparameterised samples from the full block q(f_t) = N(m_t, S_t)
    so head correlations enter the expectation.
    """

    noise_var: Param = field(default_factory=lambda: positive_param(1e-3))
    fn: Callable = static(default=None)
    n_mc: int = static(default=32)
    seed: int = static(default=0)  # static: uint32 key leaves break jax.grad

    @property
    def key(self):
        return jax.random.PRNGKey(self.seed)

    def ell(self, mask, m, S):
        """mask: [T] 1.0 where the residual is enforced; m [T,p]; S [T,p,p]."""
        L = safe_cholesky(S)
        eps = jax.random.normal(
            self.key, (self.n_mc,) + m.shape, m.dtype
        )  # [n, T, p]
        f = m[None] + jnp.einsum("tij,ntj->nti", L, eps)
        r = self.fn(f)  # [n, T]
        nv = self.noise_var.value
        ll = -0.5 * (_LOG2PI + jnp.log(nv) + r * r / nv)
        return jnp.sum(jnp.where(mask > 0, jnp.mean(ll, axis=0), 0.0))


@module
class CompositeLikelihood(Likelihood):
    """Per-column elementwise likelihoods + optional nonlinear residual.

    residual_mask selects the rows (time steps) where the nonlinear residual
    is enforced (collocation points); None means every step.
    """

    heads: list = field(default_factory=list)
    residual: object = None
    residual_mask: object = None

    def expected_log_lik_blocks(self, Y, m, S):
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
            total = total + self.residual.ell(mask, m, S)
        return total

    def log_prob(self, y, f):
        """Columnwise log-prob (heads only; residual is a training device)."""
        outs = [
            self.heads[h].log_prob(y[..., h, :], f[..., h, :])
            if y.ndim > 2
            else self.heads[h].log_prob(y[..., h], f[..., h])
            for h in range(len(self.heads))
        ]
        return jnp.stack(outs, axis=-1)

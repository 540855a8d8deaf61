"""Multi-output mixing kernels: LMC (linear model of coregionalisation).

Counterpart of `stgp/transforms/multi_output.py:206-383` (`LMC` + variants).
The reference realises LMC as a prior-DAG transform over latent GPs; here it
is a multi-output KERNEL (outputs f = W g, g_l independent latent GPs):

    Cov(f_p(x), f_q(x')) = sum_l W_pl W_ql k_l(x, x')

which drops into BatchGP / SVGP / DerivativeKernel-style consumers through
the same data-major block-Gram contract.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.params import Param, param
from ..utils.struct import field, module, static
from .base import Kernel, _as_2d

__all__ = ["LMC"]


@module
class LMC(Kernel):
    """Linear model of coregionalisation over independent latent kernels."""

    latents: list  # L latent kernels
    W: Param  # [P, L] mixing matrix

    @classmethod
    def init(cls, latents, P: int, key=None):
        L = len(latents)
        key = key if key is not None else jax.random.PRNGKey(0)
        W0 = jax.random.normal(key, (P, L)) / jnp.sqrt(L)
        return cls(latents=list(latents), W=param(W0))

    @property
    def n_outputs(self) -> int:
        return self.W.value.shape[0]

    def K_blocks(self, X1, X2):
        """[P, P, N, M] mixed covariance blocks."""
        W = self.W.value
        Ks = jnp.stack([k.K(X1, X2) for k in self.latents])  # [L, N, M]
        return jnp.einsum("pl,lnm,ql->pqnm", W, Ks, W)

    def K(self, X1, X2):
        B = self.K_blocks(_as_2d(X1), _as_2d(X2))
        P, _, N, M = B.shape
        return jnp.transpose(B, (2, 0, 3, 1)).reshape(N * P, M * P)

    def K_diag(self, X):
        X = _as_2d(X)
        W = self.W.value
        kd = jnp.stack([k.K_diag(X) for k in self.latents])  # [L, N]
        out = jnp.einsum("pl,ln->np", W * W, kd)  # [N, P]
        return out.reshape(-1)

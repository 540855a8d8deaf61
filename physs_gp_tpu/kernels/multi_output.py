"""Multi-output mixing kernels: LMC (linear model of coregionalisation).

Counterpart of `stgp/transforms/multi_output.py:206-383` (`LMC`, `LMC_LDL`,
`LMC_DRD`). The reference realises LMC as a prior-DAG transform over latent
GPs; here it is a multi-output KERNEL (outputs f = W g, g_l independent
latent GPs):

    Cov(f_p(x), f_q(x')) = sum_l W_pl W_ql k_l(x, x')

which drops into BatchGP / SVGP / DerivativeKernel-style consumers through
the same data-major block-Gram contract.

The parameterisation variants differ ONLY in how W is built, so they are
pluggable mixing objects exposing `.value` (Param duck-type):
- free [P, L] matrix (plain `LMC.init`),
- `UnitLowerMixing`: unit-diagonal lower-triangular W (ref `LMC_LDL`,
  `multi_output.py:357-383`),
- `CorrelationMixing`: W = diag(scales) @ chol(correlation) with the
  canonical partial-correlation construction (ref `LMC_DRD`,
  `multi_output.py:386-430`).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.params import Param, param, positive_param
from ..utils.struct import field, module, static
from .base import Kernel, _as_2d

__all__ = ["LMC", "UnitLowerMixing", "CorrelationMixing"]


@module
class UnitLowerMixing:
    """W = eye(P, L) with a trainable strict lower triangle (ref `LMC_LDL`).

    The unit diagonal pins output p to latent p (identifiable ordering); the
    strict-lower entries mix in earlier latents.
    """

    z: Param  # strict-lower entries, row-major
    P: int = static(default=1)
    L: int = static(default=1)

    @classmethod
    def init(cls, P: int, L: int | None = None):
        L = P if L is None else L
        n = len(np.tril_indices(P, -1, L)[0])
        return cls(z=param(jnp.zeros(n)), P=P, L=L)

    @property
    def value(self):
        z = self.z.value
        rows, cols = np.tril_indices(self.P, -1, self.L)
        W = jnp.eye(self.P, self.L, dtype=z.dtype)
        return W.at[rows, cols].set(z)


@module
class CorrelationMixing:
    """W = diag(scales) @ L_corr(z), L_corr a correlation Cholesky from the
    canonical partial-correlation construction (ref `LMC_DRD`: z mapped into
    (-1, 1) by a probit squash, `parameter_transforms.py:72,98`).

    W W^T = diag(s) C diag(s) is a full covariance split into trainable
    per-output scales and a unit-diagonal correlation — the 'DRD' form.
    """

    scales: Param  # [P] positive
    z: Param  # [P(P-1)/2] unconstrained
    P: int = static(default=1)

    @classmethod
    def init(cls, P: int, scales=None):
        s = jnp.ones(P) if scales is None else jnp.asarray(scales)
        n = P * (P - 1) // 2
        return cls(scales=positive_param(s), z=param(jnp.zeros(n)), P=P)

    @property
    def value(self):
        from ..likelihoods.dynamic_covariance import correlation_cholesky

        # probit squash into (-1, 1): 2 Phi(z) - 1 (ref correlation_transform)
        zc = 2.0 * jax.scipy.stats.norm.cdf(self.z.value) - 1.0
        L = correlation_cholesky(zc, self.P)
        return self.scales.value[:, None] * L


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

    @classmethod
    def init_ldl(cls, latents, P: int) -> "LMC":
        """Unit-lower-triangular mixing (ref `LMC_LDL`); recovers plain LMC
        with W = eye when the strict-lower entries are zero."""
        return cls(latents=list(latents), W=UnitLowerMixing.init(P, len(latents)))

    @classmethod
    def init_drd(cls, latents, scales=None) -> "LMC":
        """diag(scales) @ correlation-Cholesky mixing (ref `LMC_DRD`);
        requires as many latents as outputs (square W)."""
        return cls(
            latents=list(latents),
            W=CorrelationMixing.init(len(latents), scales=scales),
        )

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

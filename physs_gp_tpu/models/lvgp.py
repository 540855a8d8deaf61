"""Latent-variable GP: trainable per-datapoint latent inputs (GPLVM-style).

Counterpart of the reference's `transforms/latent_variable.py:12-38`
(`LatentVariable`, `ConcatenateLatentVariable`, `AdditiveLatentVariable`):
the model's inputs are augmented with a trainable latent W — either
concatenated ([X, W]) or added (X + W) — optimised jointly with the
hyperparameters under an isotropic N(0, σ_w² I) prior (MAP, matching the
reference's point-estimate latents).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.params import Param, param
from ..utils.struct import module, replace, static
from .batch_gp import BatchGP
from .ssgp import GaussianMoments

__all__ = ["LatentVariableGP"]


@module
class LatentVariableGP:
    """BatchGP over transformed inputs [X, W] (concat) or X + W (additive)."""

    base: BatchGP  # base.X holds the OBSERVED inputs
    W: Param  # [N, dw] latent inputs (trainable)
    mode: str = static(default="concat")  # 'concat' | 'additive'
    prior_var: float = static(default=1.0)

    @classmethod
    def init(cls, X, Y, kernel, likelihood, dw: int = 1, mode: str = "concat",
             prior_var: float = 1.0, W0=None, key=None):
        import jax

        from ..utils.shapes import as_points

        X = as_points(X)
        N = X.shape[0]
        if W0 is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            if mode == "additive":
                W0 = 0.01 * jax.random.normal(key, X.shape, X.dtype)
            else:
                W0 = 0.01 * jax.random.normal(key, (N, dw), X.dtype)
        base = BatchGP(X=X, Y=Y, kernel=kernel, likelihood=likelihood)
        return cls(base=base, W=param(jnp.asarray(W0)), mode=mode,
                   prior_var=prior_var)

    def _augmented(self) -> BatchGP:
        Wv = self.W.value
        if self.mode == "additive":
            X = self.base.X + Wv
        else:
            X = jnp.concatenate([self.base.X, Wv], axis=1)
        return replace(self.base, X=X)

    def log_marginal_likelihood(self) -> jnp.ndarray:
        return self._augmented().log_marginal_likelihood()

    def get_objective(self) -> jnp.ndarray:
        """-lml - log N(W | 0, σ_w² I): MAP over the latent inputs."""
        Wv = self.W.value
        log_prior = -0.5 * jnp.sum(Wv * Wv) / self.prior_var
        return -(self.log_marginal_likelihood() + log_prior)

    def predict_f(self, X_new, W_new=None) -> GaussianMoments:
        """Predict at new inputs; W_new defaults to zeros (prior-mean latent)."""
        from ..utils.shapes import as_points

        X_new = as_points(X_new)
        if self.mode == "additive":
            Xq = X_new if W_new is None else X_new + W_new
        else:
            dw = self.W.value.shape[1]
            Wq = (jnp.zeros((X_new.shape[0], dw), X_new.dtype)
                  if W_new is None else as_points(W_new))
            Xq = jnp.concatenate([X_new, Wq], axis=1)
        return self._augmented().predict_f(Xq)

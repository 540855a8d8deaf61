"""Model wrappers: multi-objective training and latent-space prediction.

Counterpart of `stgp/models/wrappers.py:15,57` (`LatentPredictor`,
`MultiObjectiveModel`)."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.struct import field, module, replace, static

__all__ = ["MultiObjectiveModel", "LatentPredictor"]


@module
class MultiObjectiveModel:
    """Sum of objectives over several models (shared training loop; ref
    `wrappers.py:57`). Natural-gradient updates fan out to CVI members."""

    models: list = field(default_factory=list)

    def get_objective(self) -> jnp.ndarray:
        return sum(m.get_objective() for m in self.models)

    def elbo(self) -> jnp.ndarray:
        return -self.get_objective()

    def natural_gradient_update(self, lr: float) -> "MultiObjectiveModel":
        new = [
            m.natural_gradient_update(lr)
            if hasattr(m, "natural_gradient_update")
            else m
            for m in self.models
        ]
        return replace(self, models=new)

    def __getitem__(self, i):
        return self.models[i]


@module
class LatentPredictor:
    """Predict a chosen latent head of a multi-head model (ref
    `wrappers.py:15`): e.g. the derivative head of a physics model."""

    base: object
    head: int = static(default=0)

    def predict_f(self, t_new):
        from .ssgp import GaussianMoments

        # full posterior at new times, select the head column
        p = self.base.predict_f(t_new)
        return GaussianMoments(
            mean=p.mean[..., self.head : self.head + 1],
            var=p.var[..., self.head : self.head + 1],
        )

    def posterior(self):
        from .ssgp import GaussianMoments

        p = self.base.posterior()
        return GaussianMoments(
            mean=p.mean[..., self.head : self.head + 1],
            var=p.var[..., self.head : self.head + 1],
        )

"""Input-space transforms: uncertain inputs and latent input variables.

Counterparts of the reference's `transforms/latent_variable.py`:
- `UncertainInput` (ref :40-107): observations at noisy input locations
  x + w, w ~ N(0, σ_x²). The reference's delta approximation propagates the
  input noise through the derivative process:
      E[f(x+w)]  ≈ f(x)            (+ ½ σ_x² f''(x) with the Hessian flag)
      V[f(x+w)]  ≈ V[f] + σ_x² (f'(x)² + V[f'])
  The Markov state already carries f' (and f''), so here this is a LIKELIHOOD
  moment transform over (f, f′[, f″]) heads — no new kernels needed.
- `LatentVariable` / `ConcatenateLatentVariable` / `AdditiveLatentVariable`
  (ref :12-38): per-datapoint trainable latent inputs W (GPLVM-style MAP),
  realised by `models.lvgp.LatentVariableGP`.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..likelihoods.nongaussian import expected_log_lik
from ..utils.params import Param, positive_param
from ..utils.struct import field, module, static

__all__ = ["UncertainInputLikelihood"]


@module
class UncertainInputLikelihood:
    """Wraps an elementwise likelihood: y observed at x + w, w ~ N(0, σ_x²).

    Use with observation heads [ValueHead(), DerivativeHead(1)]
    (+ DerivativeHead(2) for `hessian=True`); Y carries data in column 0 and
    NaN in the derivative columns (they inform only through this transform,
    so sites stay active on them — `site_active_mask`).
    """

    base: object  # elementwise likelihood of y | f(x+w)
    input_var: Param = field(default_factory=lambda: positive_param(0.1))
    hessian: bool = static(default=False)

    def site_active_mask(self, Y):
        # derivative heads carry information through the moment transform
        return jnp.ones_like(Y, dtype=bool)

    def R(self, T: int, p: int = 1) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.eye(p), (T, p, p))

    def transformed_moments(self, m, S):
        """Delta-approximation moments of f(x+w): ([T], [T])."""
        sx2 = self.input_var.value
        f, df = m[:, 0], m[:, 1]
        var_f = S[:, 0, 0]
        var_df = S[:, 1, 1]
        mean = f
        if self.hessian:
            mean = mean + 0.5 * sx2 * m[:, 2]
        var = var_f + sx2 * (df * df + var_df)
        return mean, var

    def expected_log_lik_blocks(self, Y, m, S, key=None):  # key unused (deterministic)
        mean, var = self.transformed_moments(m, S)
        return jnp.sum(expected_log_lik(self.base, Y[:, 0], mean, var))

    def log_prob(self, y, f):
        return self.base.log_prob(y, f)

    def conditional_mean(self, f):
        return self.base.conditional_mean(f)

    def conditional_variance(self, f):
        return self.base.conditional_variance(f)

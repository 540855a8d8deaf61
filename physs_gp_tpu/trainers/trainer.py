"""Trainers: Adam on hyperparameters, natural-gradient on CVI sites, and the
alternating VB_NG_ADAM composite.

Counterpart of `stgp/trainers/{trainer.py,natgrad_trainer.py,standard.py}`
(GradDescentTrainer ref `trainer.py:252`, NatGradTrainer with NaN-retry ref
`natgrad_trainer.py:144-301`, VB_NG_ADAM ref `standard.py:58`). Differences:
- steps are pure jitted functions over the model pytree (no objax state);
- hyperparameter selection is structural (`trainable_mask`), not var-surgery;
- the NaN guard reverts to the previous sites and shrinks the step size, as
  the reference's retry loop does, but as a host-side wrapper around one
  jitted step.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..utils.training import trainable_mask, zero_untrainable

__all__ = ["AdamTrainer", "NatGradTrainer", "VB_NG_Adam", "lr_schedule"]


def lr_schedule(kind: str, base: float, n: int):
    """'constant' | 'linear' | 'log' ramps (ref `natgrad_trainer.py:198-301`)."""
    import numpy as np

    if kind == "constant":
        return [base] * n
    if kind == "linear":
        return list(np.linspace(base / 10, base, n))
    if kind == "log":
        return list(np.logspace(np.log10(base / 100), np.log10(base), n))
    raise ValueError(kind)


class AdamTrainer:
    """Adam on the model's hyperparameters (non-fixed Params only).

    `seed`: when set, a fresh PRNG key is split per epoch and passed to
    `get_objective(key=...)` so stochastic (MC) objectives resample each step
    (ref `computation/integrals/samples.py:116` advances its RNG per call);
    requires the model's objective to accept a `key` kwarg.
    """

    def __init__(self, model: Any, lr: float = 1e-2, seed: int | None = None):
        self.opt = optax.adam(lr)
        self.mask = trainable_mask(model)
        self.opt_state = self.opt.init(model)
        self._key = None if seed is None else jax.random.PRNGKey(seed)

        @jax.jit
        def step(model, opt_state):
            loss, grads = jax.value_and_grad(lambda m: m.get_objective())(model)
            grads = zero_untrainable(grads, self.mask)
            updates, opt_state = self.opt.update(grads, opt_state)
            return optax.apply_updates(model, updates), opt_state, loss

        @jax.jit
        def step_key(model, opt_state, key):
            loss, grads = jax.value_and_grad(
                lambda m: m.get_objective(key=key)
            )(model)
            grads = zero_untrainable(grads, self.mask)
            updates, opt_state = self.opt.update(grads, opt_state)
            return optax.apply_updates(model, updates), opt_state, loss

        self._step = step
        self._step_key = step_key

    def train(self, model: Any, epochs: int, callback: Callable | None = None):
        losses = []
        for i in range(epochs):
            if self._key is None:
                model, self.opt_state, loss = self._step(model, self.opt_state)
            else:
                self._key, k = jax.random.split(self._key)
                model, self.opt_state, loss = self._step_key(
                    model, self.opt_state, k
                )
            losses.append(float(loss))
            if callback:
                callback(i, model, float(loss))
        return model, losses


class NatGradTrainer:
    """Natural-gradient site updates with a NaN-guard retry loop.

    `seed`: when set, a fresh PRNG key is split per step (and per NaN retry)
    and passed to `natural_gradient_update(..., key=...)` so MC ELL terms
    resample each iteration instead of optimising one frozen noise draw.
    """

    def __init__(self, nan_max_attempts: int = 4, hessian: str = "exact",
                 seed: int | None = None):
        self.nan_max_attempts = nan_max_attempts
        self._key = None if seed is None else jax.random.PRNGKey(seed)
        self._step = jax.jit(
            lambda model, lr: model.natural_gradient_update(lr, hessian),
            static_argnums=(),
        )
        self._step_key = jax.jit(
            lambda model, lr, key: model.natural_gradient_update(
                lr, hessian, key=key
            ),
            static_argnums=(),
        )

    def train(self, model: Any, lrs, callback: Callable | None = None):
        if isinstance(lrs, (int, float)):
            lrs = [float(lrs)]
        for i, lr in enumerate(lrs):
            lr_try = float(lr)
            for _ in range(self.nan_max_attempts):
                if self._key is None:
                    new_model = self._step(model, lr_try)
                else:
                    self._key, k = jax.random.split(self._key)
                    new_model = self._step_key(model, lr_try, k)
                # A diverged step shows up as non-finite site variances, or as
                # NaNs leaking into site means that were previously active
                # (inactive site means are NaN by convention — compare the
                # finite-pattern, don't require all-finite).
                v_ok = all(
                    bool(jnp.all(jnp.isfinite(x)))
                    for x in jax.tree_util.tree_leaves(new_model.sites.V)
                )
                y_ok = bool(
                    jnp.all(
                        jnp.isfinite(new_model.sites.Y)
                        == jnp.isfinite(model.sites.Y)
                    )
                )
                if v_ok and y_ok:
                    model = new_model
                    break
                lr_try *= 0.5  # ref `natgrad_trainer.py:267-287`: shrink+retry
            if callback:
                callback(i, model, lr_try)
        return model


class VB_NG_Adam:
    """Alternate: one natural-gradient site step + one Adam hyperparam step
    per epoch (ref `standard.py:58` VB_NG_ADAM)."""

    def __init__(self, model: Any, adam_lr: float = 1e-2, ng_lr: float = 1.0,
                 hessian: str = "exact", seed: int | None = None):
        self.adam = AdamTrainer(model, adam_lr, seed=seed)
        self.ng = NatGradTrainer(
            hessian=hessian, seed=None if seed is None else seed + 1
        )
        self.ng_lr = ng_lr

    def train(self, model: Any, epochs: int, callback: Callable | None = None):
        losses = []
        for i in range(epochs):
            model = self.ng.train(model, [self.ng_lr])
            model, ls = self.adam.train(model, 1)
            losses.extend(ls)
            if callback:
                callback(i, model, ls[-1])
        return model, losses

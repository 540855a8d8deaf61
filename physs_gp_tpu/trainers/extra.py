"""Additional trainers: L-BFGS, switch/split composites.

Counterpart of `stgp/trainers/trainer.py:146` (ScipyTrainer L-BFGS),
`:291` (SwitchTrainer), `standard.py:93` (LikNoiseSplitTrainer) and
`standard.py:21` (VB_NG_LBFGS) — built on optax.lbfgs instead of scipy so
the whole step stays jitted on device.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..utils.training import trainable_mask, zero_untrainable
from .trainer import AdamTrainer, NatGradTrainer

__all__ = ["LBFGSTrainer", "SwitchTrainer", "VB_NG_LBFGS"]


class LBFGSTrainer:
    """Full-batch L-BFGS on hyperparameters (ref ScipyTrainer)."""

    def __init__(self, model: Any, max_linesearch_steps: int = 20):
        self.opt = optax.lbfgs(
            linesearch=optax.scale_by_zoom_linesearch(
                max_linesearch_steps=max_linesearch_steps
            )
        )
        self.mask = trainable_mask(model)
        self.opt_state = self.opt.init(model)

        def obj(m):
            return m.get_objective()

        @jax.jit
        def step(model, opt_state):
            loss, grads = jax.value_and_grad(obj)(model)
            grads = zero_untrainable(grads, self.mask)
            updates, opt_state = self.opt.update(
                grads, opt_state, model, value=loss, grad=grads,
                value_fn=obj,
            )
            return optax.apply_updates(model, updates), opt_state, loss

        self._step = step

    def train(self, model: Any, iters: int, callback: Callable | None = None):
        losses = []
        for i in range(iters):
            model, self.opt_state, loss = self._step(model, self.opt_state)
            losses.append(float(loss))
            if callback:
                callback(i, model, float(loss))
        return model, losses


class SwitchTrainer:
    """Alternate between trainers in rounds (ref `trainer.py:291`)."""

    def __init__(self, trainers: list, epochs_per_round: list):
        self.trainers = trainers
        self.epochs_per_round = epochs_per_round

    def train(self, model: Any, rounds: int):
        losses = []
        for _ in range(rounds):
            for trainer, n in zip(self.trainers, self.epochs_per_round):
                out = trainer.train(model, n)
                model, ls = out if isinstance(out, tuple) else (out, [])
                losses.extend(ls if isinstance(ls, list) else [])
        return model, losses


class VB_NG_LBFGS:
    """Natural-gradient site steps + L-BFGS hyperparameter steps
    (ref `standard.py:21`)."""

    def __init__(self, model: Any, ng_lr: float = 1.0):
        self.lbfgs = LBFGSTrainer(model)
        self.ng = NatGradTrainer()
        self.ng_lr = ng_lr

    def train(self, model: Any, epochs: int):
        losses = []
        for _ in range(epochs):
            model = self.ng.train(model, [self.ng_lr])
            model, ls = self.lbfgs.train(model, 1)
            losses.extend(ls)
        return model, losses

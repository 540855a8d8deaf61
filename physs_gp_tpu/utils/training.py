"""Trainability masking for optax over model pytrees.

The reference trains objax TrainVars and surgically updates surrogate site
variables by object id (`trainers/natgrad_trainer.py:45-140`). Here the rule
is structural: a leaf is hyperparameter-trainable iff it is the `raw` field
of a non-fixed `Param`. Data arrays, CVI sites, and fixed Params are excluded
automatically — no id bookkeeping.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .params import Param
from .struct import is_module

__all__ = ["trainable_mask", "apply_updates", "zero_untrainable"]


def trainable_mask(tree: Any):
    """Pytree of bools matching `tree`'s structure: True = Adam-trainable."""

    def rec(obj):
        if obj is None:
            return None
        if isinstance(obj, Param):
            return dataclasses.replace(obj, raw=(not obj.fixed))
        if is_module(obj):
            kwargs = {}
            for f in dataclasses.fields(obj):
                val = getattr(obj, f.name)
                kwargs[f.name] = val if f.metadata.get("static") else rec(val)
            return type(obj)(**kwargs)
        if isinstance(obj, (list, tuple)):
            out = [rec(v) for v in obj]
            return type(obj)(out) if not hasattr(obj, "_fields") else type(obj)(*out)
        if isinstance(obj, dict):
            return {k: rec(v) for k, v in obj.items()}
        return False  # plain arrays (data, sites, ...) are not hyperparams

    return rec(tree)


def zero_untrainable(grads: Any, mask: Any):
    """Zero gradient leaves where mask is False (keeps treedef identical)."""
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask
    )


def apply_updates(model: Any, updates: Any):
    return jax.tree_util.tree_map(lambda p, u: p + u, model, updates)

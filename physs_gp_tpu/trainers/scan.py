"""On-device (in-graph) training loops: the whole schedule in ONE jit.

The host-loop trainers (`trainer.py`) dispatch one jitted step per iteration.
That is fine on a local device, but through a remote-dispatch relay each
dispatch costs ~8 ms — more than the entire device time of a d=2 T=100k CVI
step (~2.7 ms measured in-graph, round 4). These loops run N steps inside a
single `lax.scan`, so the whole schedule is one dispatch and XLA compiles the
full training loop as one program — the idiomatic TPU schedule for production
training. Counterpart of the reference's host-side epoch loops
(`trainers/trainer.py:252`, `trainers/natgrad_trainer.py:144`), redesigned
for the jit-once/execute-on-device model.

The NaN guard mirrors `NatGradTrainer`'s reject-and-retry semantics in-graph:
a step whose site leaves go non-finite is REVERTED (that iteration becomes a
no-op) instead of shrink-retried — there is no host to shrink the lr, and a
reverted step with the next (scheduled) lr is the same recovery in practice.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..utils.training import trainable_mask, zero_untrainable

__all__ = ["adam_scan", "natgrad_scan", "vb_ng_adam_scan"]


def _as_lrs(lrs, n_steps, dtype=jnp.float32):
    lrs = jnp.asarray(lrs, dtype)
    if lrs.ndim == 0:
        if n_steps is None:
            raise ValueError("scalar lr requires n_steps")
        lrs = jnp.broadcast_to(lrs, (int(n_steps),))
    return lrs


def _sites_ok(new_sites, old_sites):
    """Step acceptance: finite site variances AND unchanged finite-pattern
    of site means (inactive sites are NaN by convention)."""
    v_ok = jnp.array(True)
    for leaf in jax.tree_util.tree_leaves(new_sites.V):
        v_ok = v_ok & jnp.all(jnp.isfinite(leaf))
    y_ok = jnp.all(
        jnp.isfinite(new_sites.Y) == jnp.isfinite(old_sites.Y)
    )
    return v_ok & y_ok


def _guard_sites(new_model, old_model):
    ok = _sites_ok(new_model.sites, old_model.sites)
    from ..utils.struct import replace

    sites = jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok, a, b), new_model.sites, old_model.sites
    )
    return replace(new_model, sites=sites), ok


def natgrad_scan(model: Any, lrs, n_steps: int | None = None,
                 hessian: str = "exact", key=None, nan_guard: bool = True):
    """N CVI natural-gradient steps in one compiled graph.

    Args:
      model: a CVI-style model exposing ``step_with_elbo(lr, hessian, key)``.
      lrs: scalar learning rate (with ``n_steps``) or per-step array
        (use ``lr_schedule`` for the reference's ramps).
      key: optional PRNG key, split per step so stochastic (MC) ELLs
        resample each iteration.
      nan_guard: revert steps whose sites go non-finite (see module doc).

    Returns ``(model, elbos)`` with ``elbos[i]`` the PRE-update ELBO of step
    i — identical semantics to looping ``step_with_elbo`` on the host.
    """
    lrs = _as_lrs(lrs, n_steps)
    n = lrs.shape[0]
    keys = (
        jax.random.split(key, n)
        if key is not None
        else jnp.zeros((n, 2), jnp.uint32)
    )
    has_key = key is not None

    def body(m, x):
        lr, k = x
        if has_key:
            m2, elbo = m.step_with_elbo(lr, hessian=hessian, key=k)
        else:
            m2, elbo = m.step_with_elbo(lr, hessian=hessian)
        if nan_guard:
            m2, _ = _guard_sites(m2, m)
        return m2, elbo

    return jax.lax.scan(body, model, (lrs, keys))


def adam_scan(model: Any, n_steps: int, lr: float = 1e-2, key=None):
    """N Adam steps on the trainable hyperparameters in one compiled graph
    (in-graph counterpart of ``AdamTrainer``; any model exposing
    ``get_objective()``). Returns ``(model, losses)``."""
    opt = optax.adam(lr)
    mask = trainable_mask(model)
    opt_state = opt.init(model)
    keys = (
        jax.random.split(key, n_steps)
        if key is not None
        else jnp.zeros((n_steps, 2), jnp.uint32)
    )
    has_key = key is not None

    def body(carry, k):
        m, s = carry
        obj = (
            (lambda mm: mm.get_objective(key=k))
            if has_key
            else (lambda mm: mm.get_objective())
        )
        loss, grads = jax.value_and_grad(obj)(m)
        grads = zero_untrainable(grads, mask)
        updates, s = opt.update(grads, s)
        return (optax.apply_updates(m, updates), s), loss

    (model, _), losses = jax.lax.scan(body, (model, opt_state), keys)
    return model, losses


def vb_ng_adam_scan(model: Any, n_steps: int, adam_lr: float = 1e-2,
                    ng_lr: float = 1.0, hessian: str = "exact", key=None,
                    nan_guard: bool = True):
    """In-graph VB_NG_ADAM: each iteration = one natural-gradient site step
    + one Adam step on the (trainable) hyperparameters, the whole schedule
    under one jit (ref `trainers/standard.py:58`, fused on-device).

    Returns ``(model, elbos)`` — ``elbos[i]`` is the ELBO surface Adam saw at
    iteration i (post-natgrad, pre-Adam).
    """
    opt = optax.adam(adam_lr)
    mask = trainable_mask(model)
    opt_state = opt.init(model)
    ng_lrs = _as_lrs(ng_lr, n_steps)
    n = ng_lrs.shape[0]
    keys = (
        jax.random.split(key, n)
        if key is not None
        else jnp.zeros((n, 2), jnp.uint32)
    )
    has_key = key is not None

    def body(carry, x):
        m, s = carry
        lr, k = x
        if has_key:
            m2 = m.natural_gradient_update(lr, hessian, key=k)
            obj = lambda mm: mm.get_objective(key=k)  # noqa: E731
        else:
            m2 = m.natural_gradient_update(lr, hessian)
            obj = lambda mm: mm.get_objective()  # noqa: E731
        if nan_guard:
            m2, _ = _guard_sites(m2, m)
        loss, grads = jax.value_and_grad(obj)(m2)
        grads = zero_untrainable(grads, mask)
        updates, s = opt.update(grads, s)
        return (optax.apply_updates(m2, updates), s), -loss

    (model, _), elbos = jax.lax.scan(body, (model, opt_state), (ng_lrs, keys))
    return model, elbos

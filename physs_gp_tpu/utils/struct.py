"""Pytree dataclass foundation.

The reference framework (`physs_gp`, see `/root/reference/src/lib/stgp/module.py`,
`parameter.py`) builds on objax's stateful Module/TrainVar system and a runtime
multiple-dispatch registry. On TPU we want everything to be a *pytree of
arrays* flowing through pure functions, so that `jax.jit`/`pjit`/`shard_map`
and optax see one flat parameter tree with no hidden state.

`@module` turns a class into a frozen dataclass registered as a JAX pytree.
Fields declared with `static()` are trace-time metadata (ints, strings, bools,
callables) and become part of the treedef (i.e. recompilation keys), not
traced arrays.
"""
from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")

__all__ = ["module", "static", "field", "replace", "is_module"]

field = dataclasses.field
replace = dataclasses.replace


def static(**kwargs: Any) -> dataclasses.Field:
    """Declare a dataclass field as static (part of the pytree treedef)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def module(cls: type[T]) -> type[T]:
    """Class decorator: frozen dataclass + JAX pytree registration."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    cls.__is_physs_module__ = True  # type: ignore[attr-defined]
    return cls


def is_module(obj: Any) -> bool:
    return getattr(type(obj), "__is_physs_module__", False)

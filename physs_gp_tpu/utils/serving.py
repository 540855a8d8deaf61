"""AOT predictor export for production serving (`jax.export`).

A trained model's predictive function is traced, lowered, and serialized to
a portable StableHLO artifact (bytes). A serving process deserializes and
calls it WITHOUT the Python model classes, kernels, or parameters — the
trained parameters are baked into the artifact as constants, and Pallas
kernels ship inside it as platform custom-calls. This covers the
deploy-and-serve story the reference leaves to ad-hoc pickles (its
checkpointing is `trainers/trainer.py` pickled objax state requiring the
full library at load time).

Typical flow:

    blob = export_predictor(model, example_ts)          # on the build host
    Path("predictor.hlo").write_bytes(blob)
    ...
    serve = load_predictor(Path("predictor.hlo").read_bytes())
    mean, var = serve(ts_new)                           # serving process

The exported artifact is shape-specialised to the example input (standard
for serving; export several shapes or use jax.export symbolic shapes for
bucketed serving). Platform defaults to the exporting backend.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["export_predictor", "load_predictor", "export_fn", "load_fn"]


def export_fn(fn: Callable, *example_args,
              platforms: Sequence[str] | None = None) -> bytes:
    """Serialize `jit(fn)` specialised to `example_args` (arrays or
    ShapeDtypeStructs). `fn` must return arrays / flat tuples of arrays."""
    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        example_args,
    )
    exp = jax.export.export(
        jax.jit(fn),
        platforms=None if platforms is None else list(platforms),
    )(*specs)
    return exp.serialize()


def load_fn(blob: bytes) -> Callable:
    """Deserialize an `export_fn` artifact into a callable."""
    exp = jax.export.deserialize(bytearray(blob))
    return lambda *args: exp.call(*args)


def export_predictor(model, example_ts, predict: str = "predict_f",
                     platforms: Sequence[str] | None = None) -> bytes:
    """Export `model.<predict>(ts)` with the TRAINED model baked in.

    Returns a serialized artifact whose call signature is `ts -> (mean,
    var)`. `predict` is any model method returning Gaussian moments
    (`predict_f`, `predict_y`, ...).
    """
    method = getattr(model, predict)

    def _serve(ts):
        out = method(ts)
        return out.mean, out.var

    return export_fn(_serve, example_ts, platforms=platforms)


def load_predictor(blob: bytes) -> Callable:
    """Deserialize an `export_predictor` artifact: `ts -> (mean, var)`."""
    return load_fn(blob)

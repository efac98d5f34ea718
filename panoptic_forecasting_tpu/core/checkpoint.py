"""Checkpointing: best/latest model + trainer state (Orbax).

Reference capability (SURVEY.md §5.4): two model files per run —
``best_model`` (val-best) and ``model_checkpoint`` (latest) — plus
``training_checkpoint`` = {epoch+1, optimizer state, best val result/epoch,
step} (train.py:139-141, 275-289); resume restores all of it. Here each is
an Orbax directory; only process 0 writes (reference dist.py:74-76).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np

BEST = "best_model"
LATEST = "model_checkpoint"
TRAINER = "training_checkpoint"


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree to ``path`` (atomic overwrite), process 0 only."""
    if jax.process_index() != 0:
        return
    path = os.path.abspath(path)
    tree = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
    tmp = path + ".tmp_new"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    _ckptr().save(tmp, tree)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree; ``like`` (if given) provides structure/dtypes."""
    path = os.path.abspath(path)
    restored = _ckptr().restore(path)
    if like is not None:
        flat_like, treedef = jax.tree_util.tree_flatten(like)
        flat_new = jax.tree_util.tree_leaves(restored)
        if len(flat_like) != len(flat_new):
            raise ValueError(
                f"checkpoint at {path} has {len(flat_new)} leaves, "
                f"expected {len(flat_like)}"
            )
        flat_cast = []
        for i, (n, l) in enumerate(zip(flat_new, flat_like)):
            if hasattr(l, "shape") and np.shape(n) != tuple(l.shape):
                raise ValueError(
                    f"checkpoint at {path}: leaf {i} has shape "
                    f"{np.shape(n)}, expected {tuple(l.shape)} — the model "
                    "config does not match the one this checkpoint was "
                    "trained with"
                )
            flat_cast.append(
                np.asarray(n).astype(l.dtype) if hasattr(l, "dtype") else n
            )
        return jax.tree_util.tree_unflatten(treedef, flat_cast)
    return restored


def save_model(working_dir: str, params: Any, best: bool = False) -> None:
    save_pytree(os.path.join(working_dir, BEST if best else LATEST), params)


def load_model(path_or_dir: str, like: Optional[Any] = None,
               best: bool = False) -> Any:
    """Load params from an explicit checkpoint path or a working dir."""
    if os.path.basename(path_or_dir) in (BEST, LATEST):
        path = path_or_dir
    elif os.path.isdir(os.path.join(path_or_dir, BEST if best else LATEST)):
        path = os.path.join(path_or_dir, BEST if best else LATEST)
    else:
        path = path_or_dir
    return load_pytree(path, like)


def save_trainer_state(working_dir: str, state: Any) -> None:
    save_pytree(os.path.join(working_dir, TRAINER), state)


def load_trainer_state(working_dir: str, like: Optional[Any] = None) -> Any:
    return load_pytree(os.path.join(working_dir, TRAINER), like)


def has_trainer_state(working_dir: str) -> bool:
    return os.path.isdir(os.path.join(working_dir, TRAINER))

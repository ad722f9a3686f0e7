"""Checkpoint / resume for simulation state pytrees.

The reference has no checkpointing; its closest analogue is
``get_fields()``'s full device->host dump, which (because it includes ``f``)
*is* a complete restart state (``opencl_dim.py:390-415``, SURVEY.md §5).
Here: any model state pytree (populations + RNG keys + aux fields) saves to
a single ``.npz`` with its tree structure, and restores onto any backend.
"""

from __future__ import annotations

import json

import jax
import numpy as np

__all__ = ["save_state", "load_state", "save_model", "restore_model"]


def save_state(path: str, state) -> None:
    """Save a pytree of arrays to ``path`` (.npz) with its treedef."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x))
              for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8)
    arrays["__num_leaves__"] = np.asarray(len(leaves))
    np.savez(path, **arrays)


def load_state(path: str, like=None):
    """Load a pytree saved by :func:`save_state`.

    If ``like`` (an example pytree with the same structure) is given, the
    saved leaves are unflattened into that structure (and cast to the
    example's dtypes); otherwise a flat list of arrays is returned.
    """
    with np.load(path) as data:
        n = int(data["__num_leaves__"])
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    if like is None:
        return leaves
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    assert len(like_leaves) == len(leaves), (
        f"checkpoint has {len(leaves)} leaves, expected {len(like_leaves)}")
    cast = [np.asarray(a, dtype=np.asarray(b).dtype)
            for a, b in zip(leaves, like_leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)


def save_model(path: str, model) -> None:
    """Save ``model.state`` (works for every :class:`LBModel`)."""
    save_state(path, model.state)


def restore_model(path: str, model):
    """Restore a saved state into ``model`` (structure must match)."""
    import jax.numpy as jnp

    restored = load_state(path, like=model.state)
    model.state = jax.tree_util.tree_map(jnp.asarray, restored)
    return model

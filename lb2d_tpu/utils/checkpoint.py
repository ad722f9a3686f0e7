"""Checkpoint / resume for simulation state pytrees.

The reference has no checkpointing; its closest analogue is
``get_fields()``'s full device->host dump, which (because it includes ``f``)
*is* a complete restart state (``opencl_dim.py:390-415``, SURVEY.md §5).
Here: any model state pytree (populations + RNG keys + aux fields) saves to
a single ``.npz`` that is **self-describing** — the container structure
(nested dict/list/tuple/None) is serialized alongside the leaves, so
``load_state(path)`` reconstructs the exact pytree with no ``like``
template.
"""

from __future__ import annotations

import json

import jax
import numpy as np

__all__ = ["save_state", "load_state", "save_model", "restore_model"]


def _describe(obj, leaves: list):
    """Recursively describe a pytree of dict/list/tuple/None containers,
    appending leaf arrays to ``leaves`` in traversal order."""
    if obj is None:
        return {"t": "none"}
    if isinstance(obj, dict):
        return {"t": "dict",
                "keys": list(obj.keys()),
                "vals": [_describe(v, leaves) for v in obj.values()]}
    if isinstance(obj, (list, tuple)):
        return {"t": "list" if isinstance(obj, list) else "tuple",
                "items": [_describe(v, leaves) for v in obj]}
    i = len(leaves)
    leaves.append(obj)
    return {"t": "leaf", "i": i}


def _rebuild(desc, leaves):
    t = desc["t"]
    if t == "none":
        return None
    if t == "dict":
        return {k: _rebuild(v, leaves)
                for k, v in zip(desc["keys"], desc["vals"])}
    if t in ("list", "tuple"):
        seq = [_rebuild(v, leaves) for v in desc["items"]]
        return seq if t == "list" else tuple(seq)
    return leaves[desc["i"]]


def save_state(path: str, state) -> None:
    """Save a pytree of arrays to ``path`` (.npz) with its structure."""
    leaves: list = []
    desc = _describe(state, leaves)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x))
              for i, x in enumerate(leaves)}
    arrays["__structure__"] = np.frombuffer(
        json.dumps(desc).encode(), dtype=np.uint8)
    arrays["__num_leaves__"] = np.asarray(len(leaves))
    np.savez(path, **arrays)


def load_state(path: str, like=None):
    """Load a pytree saved by :func:`save_state`.

    Returns the reconstructed pytree (structure read from the file). If
    ``like`` (an example pytree with the same structure) is given, the
    loaded leaves are additionally cast to the example leaves' dtypes.
    Legacy checkpoints without the structure record return a flat leaf
    list (or unflatten into ``like`` when provided).
    """
    with np.load(path) as data:
        n = int(data["__num_leaves__"])
        leaves = [data[f"leaf_{i}"] for i in range(n)]
        desc = None
        if "__structure__" in data:
            desc = json.loads(bytes(data["__structure__"]).decode())

    if like is not None:
        like_leaves, treedef = jax.tree_util.tree_flatten(like)
        assert len(like_leaves) == len(leaves), (
            f"checkpoint has {len(leaves)} leaves, "
            f"expected {len(like_leaves)}")
        if desc is not None:
            # match leaf order to the template's flatten order (dicts
            # flatten key-sorted; the file records traversal order)
            rebuilt = _rebuild(desc, leaves)
            leaves = jax.tree_util.tree_flatten(rebuilt)[0]
        cast = [np.asarray(a, dtype=np.asarray(b).dtype)
                for a, b in zip(leaves, like_leaves)]
        return jax.tree_util.tree_unflatten(treedef, cast)

    if desc is None:
        return leaves  # legacy format: structure unknown
    return _rebuild(desc, leaves)


def save_model(path: str, model) -> None:
    """Save ``model.state`` (works for every :class:`LBModel`)."""
    save_state(path, model.state)


def restore_model(path: str, model):
    """Restore a saved state into ``model`` (structure must match)."""
    import jax.numpy as jnp

    restored = load_state(path, like=model.state)
    model.state = jax.tree_util.tree_map(jnp.asarray, restored)
    return model

"""Checkpoint / resume for simulation state.

The reference has none (SURVEY.md section 5.4: serde is a dependency but
nothing in-tree serializes; "restart" re-runs scene init).  On TPU the whole
sim state is one pytree, so checkpointing is a first-class feature here:
a compressed npz of all leaves (orbax is available too, but npz keeps the
artifact self-describing and dependency-free for tooling).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_names(state):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    names, arrays = [], []
    for path, leaf in leaves:
        names.append(jax.tree_util.keystr(path))
        arrays.append(np.asarray(leaf))
    return names, arrays, treedef


def save(path: str, state, extra: dict | None = None) -> None:
    """Save a SimState (or any pytree of arrays) to one .npz file."""
    names, arrays, _ = _flatten_with_names(state)
    payload = {f"leaf_{i}": a for i, a in enumerate(arrays)}
    payload["__names__"] = np.asarray(json.dumps(names))
    if extra:
        payload["__extra__"] = np.asarray(json.dumps(extra))
    np.savez_compressed(path, **payload)


def load(path: str, template):
    """Load into the structure of `template` (a matching pytree).

    Returns (state, extra_dict).
    """
    data = np.load(path, allow_pickle=False)
    names = json.loads(str(data["__names__"]))
    extra = json.loads(str(data["__extra__"])) if "__extra__" in data else {}
    leaves_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    t_names = [jax.tree_util.keystr(p) for p, _ in leaves_t]
    by_name = {n: data[f"leaf_{i}"] for i, n in enumerate(names)}
    new_leaves = []
    for n, (_, t_leaf) in zip(t_names, leaves_t):
        if n not in by_name:
            raise KeyError(f"checkpoint missing leaf {n}")
        arr = by_name[n]
        if arr.shape != t_leaf.shape:
            raise ValueError(
                f"shape mismatch for {n}: checkpoint {arr.shape} vs template {t_leaf.shape}"
            )
        new_leaves.append(jnp.asarray(arr))
    state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), new_leaves
    )
    return state, extra

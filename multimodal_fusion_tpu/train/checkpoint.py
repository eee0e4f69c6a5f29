"""Checkpoint save/load: nnx state trees <-> npz files.

Replaces the reference's three torch.save flavours (SURVEY.md §5).  Static
model shapes mean load is a plain tree-restore — no shape reconstruction from
checkpoint weights (the reference's eval-side hack, trainer.py:1072-1105,
is designed away).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import nnx


def _path_key(path) -> str:
    """Render a keypath as 'a/b/0/c', dropping the VariableState '.value'
    component so nested nnx.State and pure-dict trees address identically."""
    parts = []
    for p in path:
        s = str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
        if s in ("value", ".value"):
            continue
        parts.append(s)
    return "/".join(parts)


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_path_key(path)] = np.asarray(leaf)
    return flat


def _npz_path(path: str | Path) -> Path:
    """np.savez silently appends '.npz' to suffix-less paths; normalise so
    save and load always agree on the on-disk name (review finding: the
    alignment trainer's periodic '<save_path>.step_N' checkpoints landed at
    a name no later load would open)."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_name(path.name + ".npz")
    return path


def save_state(path: str | Path, state, extra: Optional[Dict[str, Any]] = None) -> Path:
    """Save an nnx.State (or any pytree of arrays) plus optional scalar
    extras; returns the actual (.npz-normalised) path written."""
    path = _npz_path(path)
    flat = _flatten(nnx.to_pure_dict(state) if isinstance(state, nnx.State) else state)
    if extra:
        for k, v in extra.items():
            flat[f"__extra__/{k}"] = np.asarray(v)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)
    return path


def load_state(path: str | Path, state):
    """Restore arrays into a template state tree (same structure as saved).

    Returns (new_state, extras dict)."""
    path = Path(path)
    if not path.exists() and _npz_path(path).exists():
        path = _npz_path(path)
    data = np.load(path, allow_pickle=False)
    extras = {}
    arrays = {}
    for k in data.files:
        if k.startswith("__extra__/"):
            extras[k[len("__extra__/"):]] = data[k]
        else:
            arrays[k] = data[k]

    template = nnx.to_pure_dict(state) if isinstance(state, nnx.State) else state
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = _path_key(path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing key {key}")
        arr = arrays[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}")
        new_leaves.append(arr)
    new_tree = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if isinstance(state, nnx.State):
        new_state = jax.tree.map(lambda x: x, state)  # copy structure
        nnx.replace_by_pure_dict(new_state, new_tree)
        return new_state, extras
    return new_tree, extras


def load_subtree(path: str | Path, template, prefix: str):
    """Restore only the keys under ``prefix/`` of a checkpoint into a
    template tree (e.g. load just the model from a {'model':…, 'opt':…}
    checkpoint without knowing the optimizer structure)."""
    path = Path(path)
    if not path.exists() and _npz_path(path).exists():
        path = _npz_path(path)
    data = np.load(path, allow_pickle=False)
    arrays = {
        k[len(prefix) + 1 :]: data[k]
        for k in data.files
        if k.startswith(prefix + "/")
    }
    tpl = nnx.to_pure_dict(template) if isinstance(template, nnx.State) else template
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(tpl)
    new_leaves = []
    for p, leaf in leaves_with_path:
        key = _path_key(p)
        if key not in arrays:
            raise KeyError(f"checkpoint missing key {prefix}/{key}")
        if arrays[key].shape != np.shape(leaf):
            # same clear error load_state gives — a differently-sized model's
            # checkpoint would otherwise fail deep inside jit tracing
            raise ValueError(
                f"shape mismatch for {prefix}/{key}: "
                f"{arrays[key].shape} vs {np.shape(leaf)}"
            )
        new_leaves.append(arrays[key])
    new_tree = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if isinstance(template, nnx.State):
        new_state = jax.tree.map(lambda x: x, template)
        nnx.replace_by_pure_dict(new_state, new_tree)
        return new_state
    return new_tree


def save_model(path: str | Path, model: nnx.Module, extra: Optional[Dict[str, Any]] = None) -> Path:
    return save_state(path, nnx.state(model), extra)


def load_model(path: str | Path, model: nnx.Module) -> Dict[str, Any]:
    """Load a checkpoint into an existing model in place; returns extras."""
    state = nnx.state(model)
    new_state, extras = load_state(path, state)
    nnx.update(model, new_state)
    return extras

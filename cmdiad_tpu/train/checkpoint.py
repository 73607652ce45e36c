"""Checkpoint save/load for params pytrees and training state.

Replaces the reference's torch .pth checkpointing (utils/utils.py:34-68,
dict {'model', 'epoch', 'args', 'optimizer'}) with a flat .npz format for
bare pytrees plus an orbax-backed path for full train state.  Fixes
reference quirk Q7 (resume reads a nonexistent flag and crashes,
utils/utils.py:39).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np
import jax


_SEP = "\x1f"  # unit separator — never appears in module names


def _part(p) -> str:
    if hasattr(p, "key"):          # DictKey
        return str(p.key)
    if hasattr(p, "name"):         # GetAttrKey (NamedTuple fields)
        return str(p.name)
    if hasattr(p, "idx"):          # SequenceKey
        return f"{p.idx:06d}"  # zero-pad so lexicographic == positional order
    return str(p)


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        flat[_SEP.join(_part(p) for p in path)] = np.asarray(leaf)
    return flat


def load_flat(path: str, prefix: str = "") -> Dict[str, np.ndarray]:
    """{path-key: array} for keys under ``prefix``; the prefix (and its
    separator) is stripped so keys are relative to the requested subtree."""
    out = {}
    strip = len(prefix) + (1 if prefix else 0)  # prefix + separator
    with np.load(path, allow_pickle=False) as z:
        for key in z.files:
            if key == "__meta__":
                continue
            if not prefix:
                out[key] = z[key]
            elif key == prefix or key.startswith(prefix + _SEP):
                out[key[strip:] if key != prefix else ""] = z[key]
    return out


def restore_into(template, flat: Dict[str, np.ndarray], prefix: str = ""):
    """Rebuild a pytree with ``template``'s structure from a flat key map.

    Leaves are matched by their full path key (never by sort order — leaf
    traversal order and lexicographic key order diverge for NamedTuple
    states such as optax MultiStepsState).
    """
    sep = _SEP
    paths_leaves = jax.tree_util.tree_leaves_with_path(template)
    assert len(flat) == len(paths_leaves), (
        f"checkpoint has {len(flat)} leaves, template {len(paths_leaves)}")
    cast = []
    for path, tmpl_leaf in paths_leaves:
        key = prefix + sep.join(_part(p) for p in path)
        leaf = flat[key]
        cast.append(np.asarray(leaf).reshape(np.shape(tmpl_leaf)))
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, cast)


def save_pytree(path: str, tree, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(tree)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_pytree(path: str):
    """Returns the nested dict pytree (and attaches meta as ['__meta__'])."""
    with np.load(path, allow_pickle=False) as z:
        out: Dict[str, Any] = {}
        for key in z.files:
            if key == "__meta__":
                continue
            parts = key.split(_SEP)
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out


def load_meta(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        if "__meta__" in z.files:
            return json.loads(bytes(z["__meta__"].tobytes()).decode())
    return {}

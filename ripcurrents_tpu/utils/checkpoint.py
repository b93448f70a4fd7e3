"""Checkpoint/resume for streaming pipelines.

The reference loses all temporal state on exit (accumulators, ring
buffers, advected particles live in process memory; SURVEY.md section 5).
Here every pipeline's state is an explicit pytree, so long-running stream
processing is resumable: the carry is flattened to named numpy arrays and
written with np.savez (no framework lock-in, inspectable with numpy alone).
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np


def save_state(path: str, state: Any, meta: dict | None = None) -> None:
    """Serialize a pipeline state pytree to an .npz file.

    Written to a temp file and atomically renamed, so a run killed
    mid-checkpoint never leaves a truncated file for --resume."""
    import os
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    final = path if path.endswith(".npz") else path + ".npz"
    tmp = final + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, final)


def load_state(path: str, like: Any):
    """Restore a state pytree saved by save_state. `like` supplies the
    treedef (an example state from the pipeline's init)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(like)
    saved = str(treedef)
    stored = bytes(data["__treedef__"]).decode()
    if saved != stored:
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  checkpoint: {stored}\n  expected:   {saved}")
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    for a, b in zip(leaves, new_leaves):
        if np.asarray(a).shape != b.shape:
            raise ValueError(
                f"checkpoint leaf shape mismatch: {b.shape} vs "
                f"{np.asarray(a).shape}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_meta(path: str) -> dict:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    return json.loads(bytes(data["__meta__"]).decode())

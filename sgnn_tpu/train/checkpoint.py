"""Checkpoint save/load: params + BN stats + optimizer state + progress.

Equivalent of the reference's torch.save({'epoch','state_dict','optimizer'})
(/root/reference/torch/train.py:305-306,444). Format: one .npz holding the
TrainState's pytree leaves keyed by their canonical jax key-paths, plus a
JSON manifest — dependency-free and stable.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax


def _leaves_with_paths(state):
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    return [(jax.tree_util.keystr(path), leaf) for path, leaf in flat]


def save_checkpoint(path, state, *, epoch: int, iteration: int, extra=None):
    state = jax.device_get(state)
    payload = {}
    for key, leaf in _leaves_with_paths(state):
        payload[key] = np.asarray(leaf)
    meta = {"epoch": epoch, "iteration": iteration}
    if extra:
        meta.update(extra)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, os.path.basename(path) + ".tmp.npz")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path, state_template):
    """Restore a TrainState saved by save_checkpoint.

    ``state_template`` provides the pytree structure (create it with the
    same config); leaf shapes are validated. Returns (state, meta).
    """
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode())
    tmpl = jax.device_get(state_template)
    flat, treedef = jax.tree_util.tree_flatten_with_path(tmpl)
    leaves = []
    for path_, leaf in flat:
        key = jax.tree_util.keystr(path_)
        if key not in data.files:
            raise KeyError(f"checkpoint missing leaf {key}")
        val = data[key]
        if np.shape(val) != np.shape(leaf):
            raise ValueError(
                f"shape mismatch at {key}: ckpt {np.shape(val)} vs "
                f"template {np.shape(leaf)}"
            )
        leaves.append(val)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta

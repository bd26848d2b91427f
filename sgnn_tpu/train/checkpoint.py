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


# ------------------------------------------------------ orbax async backend
#
# Pod-scale alternative to the .npz format: Orbax writes each host's
# shard of a distributed array in parallel and (with AsyncCheckpointer)
# overlaps serialization with the next training steps — the multi-host
# analog of the reference's torch.save (train.py:305). The .npz backend
# remains the default for single-host runs; both store the same TrainState
# pytree, and `latest_checkpoint` recognizes either.


class OrbaxCheckpointer:
    """Async Orbax checkpointing of TrainState + progress metadata.

    Usage:
        ck = OrbaxCheckpointer()
        ck.save(path_dir, state, epoch=e, iteration=i)   # returns quickly
        ck.wait()                                        # barrier (or del)
        state, meta = ck.load(path_dir, state_template)
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path, state, *, epoch: int, iteration: int, force=True):
        path = os.path.abspath(path)
        meta = {"epoch": int(epoch), "iteration": int(iteration)}
        with open(path + ".meta.json.tmp", "w") as f:
            json.dump(meta, f)
        os.replace(path + ".meta.json.tmp", path + ".meta.json")
        self._ckptr.save(path, args=self._ocp.args.StandardSave(state),
                         force=force)

    def wait(self):
        self._ckptr.wait_until_finished()

    def load(self, path, state_template):
        path = os.path.abspath(path)
        self.wait()
        restored = self._ckptr.restore(
            path, args=self._ocp.args.StandardRestore(state_template)
        )
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        return restored, meta

    def close(self):
        self._ckptr.close()

"""Device mesh + sharding helpers.

The reference is single-GPU (/root/reference/torch/train.py:77); here data
parallelism is first-class: a 1-D ``jax.sharding.Mesh`` over axis "data",
with batches sharded on their leading device axis and parameters
replicated. Gradients/BN moments are psum'd over the axis inside
``shard_map`` (see train/step.py) — collectives ride ICI, never the host.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_leading(mesh: Mesh):
    """NamedSharding partitioning the leading (device) axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def put_device_batch(dev_batch: dict, mesh: Mesh):
    """Asynchronously transfer a per-device batch (leading [D] axis on
    every array, from ``device_batch``) onto the mesh with the shardings
    the jitted step expects (P(DATA_AXIS) on the leading axis).

    ``jax.device_put`` is async: calling it one batch ahead of the step
    overlaps the host->device transfer with the previous step's compute.
    """
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sh), dev_batch)


def prefetch_to_device(batches, mesh: Mesh, size: int = 2):
    """Double-buffered device prefetch: yields batches already resident on
    the mesh, keeping ``size`` transfers in flight ahead of the consumer
    (the reference's DataLoader(num_workers=2) host analog — train.py:102 —
    extended to hide the H2D hop itself)."""
    import collections

    buf = collections.deque()
    it = iter(batches)
    for b in it:
        buf.append(put_device_batch(b, mesh))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def device_batch(batch: dict, num_devices: int,
                 transfer_dtype=np.float32) -> dict:
    """Regroup a collated global batch into per-device sub-batches.

    Every array gains a leading [D] axis; sparse coordinate batch indices
    are rewritten to be device-local. The global batch size must divide by
    num_devices; sparse rows are re-collated per device with equal
    capacity (global_cap // D each).

    ``transfer_dtype``: dtype the float arrays (input sdf, target sdf,
    hierarchy) are SHIPPED in; the step casts back to f32 on device
    (train/step.py:_unpack_batch). bfloat16 halves the H2D bytes — the
    dominant train-step cost on hosts with a slow device link — at a max
    SDF quantization error of ~0.008 voxel on the +-3-voxel range
    (values are consumed clamped to the truncation band).
    """
    B = batch["sdf"].shape[0]
    assert B % num_devices == 0, f"batch {B} not divisible by {num_devices}"
    per = B // num_devices
    cap = batch["input_locs"].shape[0]
    cap_d = cap // num_devices

    locs = batch["input_locs"]
    feats = batch["input_sdf"]
    n = int(batch["input_num_valid"])
    out_locs = np.full((num_devices, cap_d, 4), -1, np.int32)
    out_feats = np.zeros((num_devices, cap_d, feats.shape[-1]), np.float32)
    out_num = np.zeros((num_devices,), np.int32)
    for d in range(num_devices):
        m = (locs[:n, 3] >= d * per) & (locs[:n, 3] < (d + 1) * per)
        sel_locs = locs[:n][m].copy()
        sel_locs[:, 3] -= d * per
        k = min(len(sel_locs), cap_d)
        out_locs[d, :k] = sel_locs[:k]
        out_feats[d, :k] = feats[:n][m][:k]
        out_num[d] = k

    def split(a):
        return a.reshape(num_devices, per, *a.shape[1:])

    td = np.dtype(transfer_dtype)

    def fcast(a):
        return a.astype(td) if a.dtype == np.float32 else a

    out = {
        "input_locs": out_locs,
        "input_sdf": fcast(out_feats),
        "input_num_valid": out_num,
        "sdf": fcast(split(batch["sdf"])),
        "known": split(batch["known"]),
    }
    if batch.get("hierarchy") is not None:
        out["hierarchy"] = [fcast(split(h)) for h in batch["hierarchy"]]
    else:
        out["hierarchy"] = None
    return out

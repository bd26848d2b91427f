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


def _split_rows(locs, vals, n, num_devices: int, per: int, cap_d: int,
                locs_dtype=np.int32):
    """Re-collate pooled sparse rows (batch column = locs[:, 3]) into
    per-device arrays with device-local batch indices and equal capacity.

    ``locs_dtype`` int16 halves coordinate H2D bytes (any chunk/scene dim
    and per-device batch index fits in int16; the device step casts back
    to int32 — train/step.py:_unpack_batch).
    """
    out_locs = np.full((num_devices, cap_d, 4), -1, locs_dtype)
    val_shape = (num_devices, cap_d) + vals.shape[1:]
    out_vals = np.zeros(val_shape, np.float32)
    out_num = np.zeros((num_devices,), np.int32)
    for d in range(num_devices):
        m = (locs[:n, 3] >= d * per) & (locs[:n, 3] < (d + 1) * per)
        sel_locs = locs[:n][m].astype(locs_dtype)
        sel_locs[:, 3] -= d * per
        k = min(len(sel_locs), cap_d)
        out_locs[d, :k] = sel_locs[:k]
        out_vals[d, :k] = vals[:n][m][:k]
        out_num[d] = k
    return out_locs, out_vals, out_num


def device_batch(batch: dict, num_devices: int,
                 transfer_dtype=np.float32) -> dict:
    """Regroup a collated global batch into per-device sub-batches.

    Every array gains a leading [D] axis; sparse coordinate batch indices
    are rewritten to be device-local. The global batch size must divide by
    num_devices; sparse rows are re-collated per device with equal
    capacity (global_cap // D each).

    Two schemas (data/dataset.py):
      * dense (collate): dense "sdf"/"known"/"hierarchy" grids.
      * sparse-target (collate_sparse): "target_locs/vals", per-level
        "hier_locs/vals", bit-packed "known_unk" — the device step
        densifies (train/step.py). Sparse rows additionally ship their
        coordinates as int16 (half the bytes).

    ``transfer_dtype``: dtype the float arrays are SHIPPED in; the step
    casts back to f32 on device (train/step.py:_unpack_batch). bfloat16
    halves the H2D bytes — the dominant train-step cost on hosts with a
    slow device link — at a max SDF quantization error of ~0.008 voxel on
    the +-3-voxel range (values are consumed clamped to the truncation
    band).
    """
    sparse_tgt = "target_locs" in batch
    B = (batch["known_unk"] if sparse_tgt else batch["sdf"]).shape[0]
    assert B % num_devices == 0, f"batch {B} not divisible by {num_devices}"
    per = B // num_devices
    cap = batch["input_locs"].shape[0]
    cap_d = cap // num_devices

    in_dtype = np.int16 if sparse_tgt else np.int32
    out_locs, out_feats, out_num = _split_rows(
        batch["input_locs"], batch["input_sdf"],
        int(batch["input_num_valid"]), num_devices, per, cap_d,
        locs_dtype=in_dtype,
    )

    def split(a):
        return a.reshape(num_devices, per, *a.shape[1:])

    td = np.dtype(transfer_dtype)

    def fcast(a):
        return a.astype(td) if a.dtype == np.float32 else a

    out = {
        "input_locs": out_locs,
        "input_sdf": fcast(out_feats),
        "input_num_valid": out_num,
    }
    if sparse_tgt:
        tl, tv, tn = _split_rows(
            batch["target_locs"], batch["target_vals"],
            int(batch["target_num_valid"]), num_devices, per,
            batch["target_locs"].shape[0] // num_devices,
            locs_dtype=np.int16,
        )
        out.update(
            target_locs=tl, target_vals=fcast(tv), target_num_valid=tn
        )
        hl_out, hv_out, hn_out = [], [], []
        for hl, hv, hn in zip(
            batch["hier_locs"], batch["hier_vals"], batch["hier_num"]
        ):
            a, b, c = _split_rows(
                hl, hv, int(hn), num_devices, per,
                hl.shape[0] // num_devices, locs_dtype=np.int16,
            )
            hl_out.append(a)
            hv_out.append(fcast(b))
            hn_out.append(c)
        out.update(
            hier_locs=hl_out, hier_vals=hv_out, hier_num=hn_out,
            known_unk=split(batch["known_unk"]),
            target_pos=split(batch["target_pos"]),
            hier_pos=[split(hp) for hp in batch["hier_pos"]],
        )
        return out
    out["sdf"] = fcast(split(batch["sdf"]))
    out["known"] = split(batch["known"])
    if batch.get("hierarchy") is not None:
        out["hierarchy"] = [fcast(split(h)) for h in batch["hierarchy"]]
    else:
        out["hierarchy"] = None
    return out

"""Dataset + batching into static-capacity device arrays.

Host-side counterpart of /root/reference/torch/scene_dataloader.py. Two
modes, matching SceneDataset (scene_dataloader.py:39-116):

  * chunk mode (training): .sdfs train chunks.
  * scene mode (inference): paired input/target .sdf + target .knw, with
    height cropping and pad-to-multiple-of-(hierarchy_factor*4)
    (scene_dataloader.py:83-93).

collate() produces fixed-capacity numpy batches (the XLA static-shape
contract) instead of the reference's variable-length torch.cat
(scene_dataloader.py:13-36).
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

from sgnn_tpu.data import formats as F

UP_AXIS = 0  # z (train.py:73)
UNK_THRESH = 2  # known >= 2 is unobserved (loss.py:10)


def shard_files(files, host_id: int, num_hosts: int):
    """Disjoint per-host file shards for multi-host (pod-slice) training.

    Each host loads only its stride-slice of the file list; combined with
    per-device batch sharding this gives pure data parallelism over DCN+ICI
    with no duplicate IO (the reference is single-process and has no
    equivalent).
    """
    return files[host_id::num_hosts]


class SceneDataset:
    def __init__(
        self,
        files,
        truncation: float,
        num_hierarchy_levels: int,
        max_input_height: int = 0,
        num_overfit: int = 0,
        target_path: str = "",
        dim_round: int = 0,
        sparse_targets: bool = False,
    ):
        assert num_hierarchy_levels <= 4, "precomputed hierarchy has 3 levels"
        self.is_chunks = target_path == ""
        if self.is_chunks:
            self.files = [f for f in files if os.path.isfile(f)]
        else:
            self.files = [
                (f, os.path.join(target_path, os.path.basename(f)))
                for f in files
                if os.path.isfile(f)
                and os.path.isfile(os.path.join(target_path, os.path.basename(f)))
            ]
        self.truncation = truncation
        self.num_hierarchy_levels = num_hierarchy_levels
        self.max_input_height = max_input_height
        # pad scenes to a multiple of this; 0 = hierarchy_factor*4 (the
        # reference's choice). Larger values bucket scene shapes to reduce
        # XLA recompiles. A scalar applies to all axes; a (z,y,x) triple
        # rounds per axis — the height axis is capped at max_input_height
        # (usually exactly 128 after the crop) so a small z round with
        # coarse y/x rounds cuts the bucket count without the z blow-up a
        # scalar round causes (see tools/compile_budget.py bucket_report).
        base = 2 ** (num_hierarchy_levels - 1) * 4
        if np.ndim(dim_round) == 0:
            dim_round = (dim_round or base,) * 3
        self.dim_round = np.asarray(dim_round, np.int64)
        assert (self.dim_round > 0).all(), (
            f"dim_round {tuple(self.dim_round)} must be positive"
        )
        assert (self.dim_round % base == 0).all(), (
            f"dim_round {tuple(self.dim_round)} must be multiples of "
            f"hierarchy_factor*4 = {base}"
        )
        # chunk mode only: keep target/hierarchy in native sparse row form
        # (densified ON DEVICE, train/step.py) — cuts H2D bytes ~10x
        self.sparse_targets = sparse_targets and self.is_chunks
        if num_overfit > 0 and self.files:
            num_repeat = max(1, num_overfit // len(self.files))
            self.files = self.files * num_repeat

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        if self.is_chunks:
            return self._get_chunk(self.files[idx])
        return self._get_scene(*self.files[idx])

    def _get_chunk_sparse(self, path):
        """Chunk sample with target + hierarchy as sparse rows.

        Lossless target thinning — everything the loss consumes goes
        through losses.preprocess_sdf's clamp to ±truncation, so only the
        open band (-trunc, trunc) carries information as VALUES:

          * rows with val <= -truncation are dropped: after on-device
            densify (default -inf) + clamp they are indistinguishable
            from missing voxels. This removes the behind-surface band the
            datagen stores at truncFactor 6
            (/root/reference/datagen/.../Fuser.cpp:34).
          * rows with val >= +truncation (observed free space in front of
            surfaces — 60-80% of all rows in well-scanned scenes, since
            the fuser writes +trunc(d) along every ray) collapse to ONE
            BIT each: a bit-packed plane marks them, and the device
            rebuilds +truncation there before clamping
            (train/step.py:_unpack_batch) — bit-identical to densifying
            the full .sdfs row set.
        """
        name = os.path.splitext(os.path.basename(path))[0]
        c = F.load_train_file_sparse(path)
        hierarchy = c.hierarchy
        if self.num_hierarchy_levels < 4:
            hierarchy = hierarchy[4 - self.num_hierarchy_levels:]
        dims = tuple(int(d) for d in c.dims)
        trunc = self.truncation

        def band_and_bits(locs, vals, d):
            keep = (vals > -trunc) & (vals < trunc)
            pos = vals >= trunc
            plane = np.zeros(d[0] * d[1] * d[2], np.bool_)
            pl = locs[pos]
            plane[(pl[:, 0] * d[1] + pl[:, 1]) * d[2] + pl[:, 2]] = True
            return locs[keep], vals[keep], np.packbits(
                plane, bitorder="little"
            )

        t_locs, t_vals, t_pos = band_and_bits(
            c.target_locs, c.target_vals, dims
        )
        hier_rows, hier_pos = [], []
        L = self.num_hierarchy_levels
        for h, (locs, vals) in enumerate(hierarchy):
            f = 2 ** (L - 1 - h)
            hd = tuple(d // f for d in dims)
            hl, hv, hp = band_and_bits(locs, vals, hd)
            hier_rows.append((hl, hv))
            hier_pos.append(hp)
        mask = np.abs(c.input_sdf) < self.truncation
        return {
            "name": name,
            "input_locs": c.input_locs[mask],
            "input_sdf": c.input_sdf[mask],
            "target_locs": t_locs,
            "target_vals": t_vals,
            "target_pos": t_pos,
            "hier_rows": hier_rows,
            "hier_pos": hier_pos,
            "known_unk": np.packbits(
                (c.known >= UNK_THRESH).reshape(-1), bitorder="little"
            ),
            "world2grid": c.world2grid,
            "orig_dims": np.array(c.dims, np.int64),
        }

    def _get_chunk(self, path):
        if self.sparse_targets:
            return self._get_chunk_sparse(path)
        name = os.path.splitext(os.path.basename(path))[0]
        c = F.load_train_file(path)
        hierarchy = c.hierarchy
        if self.num_hierarchy_levels < 4:
            hierarchy = hierarchy[4 - self.num_hierarchy_levels:]
        mask = np.abs(c.input_sdf) < self.truncation
        return {
            "name": name,
            "input_locs": c.input_locs[mask],
            "input_sdf": c.input_sdf[mask],
            "sdf": c.target_sdf,
            "known": c.known,
            "hierarchy": hierarchy,
            "world2grid": c.world2grid,
            "orig_dims": np.array(c.dims, np.int64),
        }

    def _get_scene(self, input_file, target_file):
        name = os.path.splitext(os.path.basename(input_file))[0]
        inp = F.load_scene(input_file)
        tgt = F.load_scene(target_file)
        known = F.load_scene_known(os.path.splitext(target_file)[0] + ".knw")
        targets = F.sparse_to_dense(tgt.locs, tgt.sdf, tgt.dims, -np.inf)
        orig_dims = np.array(targets.shape, np.int64)

        in_locs, in_sdf = inp.locs, inp.sdf
        max_dim = np.array(targets.shape)
        if self.max_input_height > 0 and max_dim[UP_AXIS] > self.max_input_height:
            max_dim[UP_AXIS] = self.max_input_height
            m = in_locs[:, UP_AXIS] < self.max_input_height
            in_locs, in_sdf = in_locs[m], in_sdf[m]
        r = self.dim_round
        max_dim = ((max_dim + r - 1) // r) * r
        mh = self.max_input_height if self.max_input_height > 0 else targets.shape[0]
        padded = np.full(tuple(max_dim), -np.inf, np.float32)
        padded[: min(mh, targets.shape[0]), : targets.shape[1], : targets.shape[2]] = (
            targets[:mh, :, :]
        )
        targets = padded
        known_pad = np.full(tuple(max_dim), 255, np.uint8)
        known_pad[: min(mh, known.shape[0]), : known.shape[1], : known.shape[2]] = (
            known[:mh, :, :]
        )
        known = known_pad

        mask = np.abs(in_sdf) < self.truncation
        return {
            "name": name,
            "input_locs": in_locs[mask],
            "input_sdf": in_sdf[mask],
            "sdf": targets,
            "known": known,
            "hierarchy": None,
            "world2grid": inp.world2grid,
            "orig_dims": orig_dims,
        }


def _pool_rows(locs_per_sample, vals_per_sample, capacity: int):
    """Concatenate per-sample sparse rows with an appended batch column,
    truncate/pad to a fixed capacity. Returns (locs [cap,4] int32,
    vals [cap] f32, num_valid, overflow)."""
    locs_list, vals_list = [], []
    for b, (locs, vals) in enumerate(zip(locs_per_sample, vals_per_sample)):
        n = len(locs)
        locs_list.append(
            np.concatenate([locs, np.full((n, 1), b, np.int32)], axis=1)
        )
        vals_list.append(vals)
    locs = np.concatenate(locs_list, 0).astype(np.int32)
    vals = np.concatenate(vals_list, 0).astype(np.float32)
    n = len(locs)
    overflow = max(0, n - capacity)
    if overflow:
        locs, vals = locs[:capacity], vals[:capacity]
        n = capacity
    pad = capacity - n
    locs = np.concatenate([locs, np.full((pad, 4), -1, np.int32)], 0)
    vals = np.concatenate([vals, np.zeros((pad,), np.float32)], 0)
    return locs, vals, np.int32(n), overflow


def collate_sparse(samples, input_capacity: int, target_capacity: int,
                   hier_capacities):
    """Batch sparse-target chunk samples (SceneDataset(sparse_targets=True))
    into fixed-capacity row arrays + bit-packed unknown masks. The device
    step densifies (train/step.py:_unpack_batch) — the H2D transfer carries
    only the native sparse rows of the .sdfs file instead of ~4 MB of
    dense grids per chunk."""
    in_locs, in_vals, in_n, in_ovf = _pool_rows(
        [s["input_locs"] for s in samples],
        [s["input_sdf"] for s in samples],
        input_capacity,
    )
    t_locs, t_vals, t_n, t_ovf = _pool_rows(
        [s["target_locs"] for s in samples],
        [s["target_vals"] for s in samples],
        target_capacity,
    )
    nh = len(samples[0]["hier_rows"])
    assert len(hier_capacities) >= nh
    hier_locs, hier_vals, hier_num = [], [], []
    h_ovf = 0
    for h in range(nh):
        hl, hv, hn, ho = _pool_rows(
            [s["hier_rows"][h][0] for s in samples],
            [s["hier_rows"][h][1] for s in samples],
            hier_capacities[h],
        )
        hier_locs.append(hl)
        hier_vals.append(hv)
        hier_num.append(hn)
        h_ovf = max(h_ovf, ho)
    return {
        "input_locs": in_locs,
        "input_sdf": in_vals[:, None],
        "input_num_valid": in_n,
        "target_locs": t_locs,
        "target_vals": t_vals,
        "target_num_valid": t_n,
        "hier_locs": hier_locs,
        "hier_vals": hier_vals,
        "hier_num": hier_num,
        "target_pos": np.stack([s["target_pos"] for s in samples]),
        "hier_pos": [
            np.stack([s["hier_pos"][h] for s in samples]) for h in range(nh)
        ],
        "known_unk": np.stack([s["known_unk"] for s in samples]),
        "world2grid": np.stack([s["world2grid"] for s in samples]),
        "orig_dims": np.stack([s["orig_dims"] for s in samples]),
        "names": [s["name"] for s in samples],
        "input_overflow": in_ovf,
        "target_overflow": max(t_ovf, h_ovf),
    }


def collate(samples, input_capacity: int):
    """Batch samples into fixed-capacity arrays.

    Returns dict with:
        input_locs [cap, 4] int32 (z,y,x,b), input_sdf [cap, 1] float32,
        input_num_valid int32, sdf [B,Z,Y,X], known [B,Z,Y,X] uint8,
        hierarchy list of [B,z,y,x] (chunk mode), world2grid [B,4,4],
        orig_dims [B,3], names list, input_overflow int.
    """
    locs_list, feats_list = [], []
    for b, s in enumerate(samples):
        n = len(s["input_locs"])
        locs_list.append(
            np.concatenate(
                [s["input_locs"], np.full((n, 1), b, np.int32)], axis=1
            )
        )
        feats_list.append(s["input_sdf"][:, None])
    locs = np.concatenate(locs_list, 0).astype(np.int32)
    feats = np.concatenate(feats_list, 0).astype(np.float32)
    n = len(locs)
    overflow = max(0, n - input_capacity)
    if overflow:
        locs, feats = locs[:input_capacity], feats[:input_capacity]
        n = input_capacity
    pad = input_capacity - n
    locs = np.concatenate([locs, np.full((pad, 4), -1, np.int32)], 0)
    feats = np.concatenate([feats, np.zeros((pad, 1), np.float32)], 0)

    batch = {
        "input_locs": locs,
        "input_sdf": feats,
        "input_num_valid": np.int32(n),
        "sdf": np.stack([s["sdf"] for s in samples]),
        "known": np.stack([s["known"] for s in samples]),
        "world2grid": np.stack([s["world2grid"] for s in samples]),
        "orig_dims": np.stack([s["orig_dims"] for s in samples]),
        "names": [s["name"] for s in samples],
        "input_overflow": overflow,
    }
    if samples[0]["hierarchy"] is not None:
        nh = len(samples[0]["hierarchy"])
        batch["hierarchy"] = [
            np.stack([s["hierarchy"][h] for s in samples]) for h in range(nh)
        ]
    else:
        batch["hierarchy"] = None
    return batch


class BatchLoader:
    """Shuffling, batching, drop-last, background prefetch.

    Replaces torch DataLoader(num_workers=2) (train.py:102) with a thread
    pool feeding a bounded, order-preserving queue — numpy parsing releases
    the GIL in frombuffer/IO, and the consumer is a TPU step, so threads
    suffice without process overhead.

    ``transform`` (optional) runs on each collated batch INSIDE the worker
    thread — the hook the trainer uses to move per-device re-collation
    (parallel/mesh.py:device_batch) off the step critical path.
    """

    def __init__(
        self,
        dataset: SceneDataset,
        batch_size: int,
        input_capacity: int,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 4,
        transform=None,
        target_capacity: int = 0,
        hier_capacities=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.input_capacity = input_capacity
        self.target_capacity = target_capacity
        self.hier_capacities = hier_capacities
        if getattr(dataset, "sparse_targets", False):
            assert target_capacity > 0 and hier_capacities, (
                "sparse_targets dataset needs target/hier capacities "
                "(see data/capacity.py:estimate_row_capacities)"
            )
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.transform = transform

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size
        )

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        nw = min(self.num_workers, nb) or 1
        stop = threading.Event()
        # Order-preserving reassembly: workers claim batch indices from a
        # shared counter and deposit results in a slot dict; the consumer
        # drains slots in index order. `credits` bounds how far ahead of
        # the consumer workers may run (prefetch + in-flight workers).
        lock = threading.Lock()
        ready = threading.Condition(lock)
        slots: dict[int, object] = {}
        next_claim = [0]
        credits = threading.Semaphore(self.prefetch + nw)

        def worker():
            while not stop.is_set():
                credits.acquire()
                if stop.is_set():
                    return
                with lock:
                    i = next_claim[0]
                    if i >= nb:
                        return
                    next_claim[0] = i + 1
                try:
                    samples = [self.dataset[j] for j in batches[i]]
                    if getattr(self.dataset, "sparse_targets", False):
                        item = collate_sparse(
                            samples, self.input_capacity,
                            self.target_capacity, self.hier_capacities,
                        )
                    else:
                        item = collate(samples, self.input_capacity)
                    if self.transform is not None:
                        item = self.transform(item)
                except Exception as e:  # surface to the consumer
                    item = e
                with ready:
                    slots[i] = item
                    ready.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True) for _ in range(nw)
        ]
        for t in threads:
            t.start()
        try:
            for i in range(nb):
                with ready:
                    while i not in slots:
                        ready.wait()
                    item = slots.pop(i)
                credits.release()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock any worker parked on the semaphore
            for _ in threads:
                credits.release()

"""Sparse-target transfer path: loss equality vs the dense-grid transfer.

The sparse path ships the .sdfs file's native sparse target/hierarchy rows
plus a bit-packed unknown mask, and densifies on device
(train/step.py:_densify_rows). After the loss's clamping
(losses.preprocess_sdf), rows with val <= -truncation are indistinguishable
from missing voxels, so the loader's lossless thinning and the on-device
scatter must reproduce the dense path's loss EXACTLY.
"""

import numpy as np
import pytest

import jax

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.data import formats as F
from sgnn_tpu.data.capacity import estimate_row_capacities
from sgnn_tpu.data.dataset import BatchLoader, SceneDataset
from sgnn_tpu.models import sgnn as M
from sgnn_tpu.parallel import mesh as PM
from sgnn_tpu.train import step as TS
from sgnn_tpu.train.state import create_train_state

from test_train import _make_chunk


@pytest.fixture(scope="module")
def chunk_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("chunks_sparse")
    rng = np.random.RandomState(11)
    files = []
    for i in range(2):
        p = str(d / f"c{i}.sdfs")
        # scale values so target/hierarchy rows land in ALL three
        # thinning classes: <= -trunc (dropped), the open band (rows),
        # and >= +trunc (bit-plane fill) — randn*3 puts ~30% of rows in
        # each saturated tail at truncation 3
        c = _make_chunk(rng)
        c.target_sdf[np.isfinite(c.target_sdf)] *= 3.0
        for g in c.hierarchy:
            g[np.isfinite(g)] *= 3.0
        F.save_train_file(p, c)
        files.append(p)
    return files


def _batches(chunk_files, sparse, num_devices):
    ds = SceneDataset(
        chunk_files, 3.0, 3, sparse_targets=sparse,
    )
    kw = {}
    if sparse:
        tcap, hcaps = estimate_row_capacities(chunk_files, 3, 3.0, 2)
        kw = dict(target_capacity=tcap, hier_capacities=hcaps)
    loader = BatchLoader(ds, 2, 4096, shuffle=False, num_workers=1, **kw)
    return [
        PM.device_batch(b, num_devices) for b in loader
    ]


def test_sparse_transfer_loss_matches_dense(chunk_files):
    num_devices = 2
    mesh = PM.make_mesh(num_devices)
    cfg = SGNNConfig(
        encoder_dim=4, input_dim=(16, 16, 16), nf_coarse=8, nf=8,
        num_hierarchy_levels=3, batch_size=1,
        occupancy_fractions=(1.0, 1.0, 1.0), execution="dense_flow",
    )
    lw = np.ones(cfg.num_hierarchy_levels + 1, np.float32)

    results = {}
    for sparse in (False, True):
        # fresh init per run: the train step donates its state buffers
        params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
        state = create_train_state(params, stats)
        step = TS.make_train_step(
            cfg, mesh, num_refine_active=cfg.num_refine_levels,
            do_surf=True, with_metrics=True, sparse_targets=sparse,
        )
        batches = _batches(chunk_files, sparse, num_devices)
        losses = []
        for b in batches:
            state, metrics = step(state, b, lw, np.float32(1e-3))
            losses.append(float(metrics["loss"]))
        results[sparse] = (losses, jax.device_get(state.params))

    np.testing.assert_allclose(
        results[True][0], results[False][0], rtol=1e-5, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(results[False][1]),
        jax.tree_util.tree_leaves(results[True][1]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_sparse_transfer_eval_matches_dense(chunk_files):
    num_devices = 2
    mesh = PM.make_mesh(num_devices)
    cfg = SGNNConfig(
        encoder_dim=4, input_dim=(16, 16, 16), nf_coarse=8, nf=8,
        num_hierarchy_levels=3, batch_size=1,
        occupancy_fractions=(1.0, 1.0, 1.0), execution="dense_flow",
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, stats)
    lw = np.ones(cfg.num_hierarchy_levels + 1, np.float32)

    out = {}
    for sparse in (False, True):
        step = TS.make_eval_step(
            cfg, mesh, num_refine_active=cfg.num_refine_levels,
            do_surf=True, sparse_targets=sparse,
        )
        b = _batches(chunk_files, sparse, num_devices)[0]
        m = step(state, b, lw)
        out[sparse] = {
            k: np.asarray(v) for k, v in m.items()
        }
    for k in out[False]:
        np.testing.assert_allclose(
            out[True][k], out[False][k], rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_transfer_bytes_reduction(tmp_path):
    """The point of the path: on a realistically-sized chunk (floor plane
    in a 64x64x128 volume — a room chunk's surface fraction) the sparse
    schema's target-side fields ship far fewer bytes than the dense
    grids. Input rows are identical in both schemas (minus int16 locs)
    and excluded from the ratio."""
    dims = (64, 64, 128)
    Z, Y, X = dims
    zz = np.arange(Z, dtype=np.float32)[:, None, None]
    d = np.broadcast_to(zz - Z / 2.0, dims).astype(np.float32).copy()
    # floor patch over a quarter of the footprint — matches real scan
    # chunks' ~4-5% target occupancy (85,564 chunks / 88 GB,
    # /root/reference/README.md:26-29)
    patch = np.zeros(dims, bool)
    patch[:, : Y // 2, : X // 2] = True
    d = np.where(patch, d, np.inf)
    target = np.where(np.abs(d) < 6.0, d, -np.inf).astype(np.float32)
    sel = np.abs(d) < 3.0
    in_locs = np.stack(np.nonzero(sel), -1).astype(np.int32)
    in_sdf = d[sel].astype(np.float32)
    known = np.where(np.abs(d) < 8.0, 0, 3).astype(np.uint8)
    hier = []
    for f in (8, 4, 2):
        dd = d[::f, ::f, ::f] / f
        hier.append(
            np.where(np.abs(dd) < 6.0, dd, -np.inf).astype(np.float32)
        )
    chunk = F.TrainChunk(
        in_locs, in_sdf, target, dims, 0.02,
        np.eye(4, dtype=np.float32), known, hier,
    )
    files = []
    for i in range(2):
        p = str(tmp_path / f"b{i}.sdfs")
        F.save_train_file(p, chunk)
        files.append(p)

    def target_bytes(sparse):
        ds = SceneDataset(files, 3.0, 4, sparse_targets=sparse)
        kw = {}
        if sparse:
            tcap, hcaps = estimate_row_capacities(files, 4, 3.0, 2)
            kw = dict(target_capacity=tcap, hier_capacities=hcaps)
        loader = BatchLoader(
            ds, 2, len(in_locs) * 2 + 64, shuffle=False, num_workers=1,
            **kw,
        )
        b = PM.device_batch(next(iter(loader)), 1)
        keys = (
            ("target_locs", "target_vals", "hier_locs", "hier_vals",
             "target_pos", "hier_pos", "known_unk")
            if sparse else ("sdf", "known", "hierarchy")
        )
        return sum(
            np.asarray(x).nbytes
            for k in keys
            for x in jax.tree_util.tree_leaves(b[k])
        )

    assert target_bytes(True) < target_bytes(False) / 4


def test_row_capacity_overflow_counts(chunk_files):
    ds = SceneDataset(chunk_files, 3.0, 3, sparse_targets=True)
    loader = BatchLoader(
        ds, 2, 4096, shuffle=False, num_workers=1,
        target_capacity=8, hier_capacities=[8, 8],
    )
    b = next(iter(loader))
    assert b["target_overflow"] > 0
    assert int(b["target_num_valid"]) == 8

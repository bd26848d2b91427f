"""Whole-scene inference pipeline + test_scene CLI end-to-end."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.data import formats as F
from sgnn_tpu.data.dataset import SceneDataset
from sgnn_tpu.infer import SceneInferencer
from sgnn_tpu.meshing.export import save_predictions
from sgnn_tpu.models.sgnn import genmodel_init

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scene_dirs(tmp_path_factory):
    rng = np.random.RandomState(3)
    base = tmp_path_factory.mktemp("scenes")
    inp_dir, tgt_dir = base / "input", base / "target"
    inp_dir.mkdir()
    tgt_dir.mkdir()
    dims = (20, 28, 30)  # padded to (32, 32, 32) for L=3
    Z, Y, X = dims
    # sphere surface voxels
    z, y, x = np.meshgrid(*(np.arange(d) for d in dims), indexing="ij")
    d = np.sqrt((z - 10.0) ** 2 + (y - 14.0) ** 2 + (x - 15.0) ** 2) - 8.0
    m = np.abs(d) < 3.0
    locs = np.stack(np.nonzero(m), -1).astype(np.int32)
    sdf = d[m].astype(np.float32)
    for name in ("roomA", "roomB"):
        vol = F.SceneVolume(locs, sdf, dims, 0.02, np.eye(4, dtype=np.float32))
        F.save_scene(str(inp_dir / f"{name}.sdf"), vol)
        F.save_scene(str(tgt_dir / f"{name}.sdf"), vol)
        F.save_known(
            str(tgt_dir / f"{name}.knw"), dims, 0.02,
            np.eye(4, dtype=np.float32),
            (rng.rand(*dims) * 3).astype(np.uint8),
        )
    return str(inp_dir), str(tgt_dir), dims


CFG = SGNNConfig(
    encoder_dim=4, input_dim=(32, 32, 32), nf_coarse=8, nf=8,
    num_hierarchy_levels=3, batch_size=1,
    occupancy_fractions=(1.0, 1.0, 1.0),
)


def test_scene_inference_and_export(scene_dirs, tmp_path):
    inp_dir, tgt_dir, dims = scene_dirs
    ds = SceneDataset(
        [os.path.join(inp_dir, "roomA.sdf")], 3.0, 3,
        max_input_height=0, target_path=tgt_dir,
    )
    sample = ds[0]
    assert sample["sdf"].shape == (32, 32, 32)
    params, stats = genmodel_init(jax.random.PRNGKey(1), CFG)
    inf = SceneInferencer(CFG, params, stats)
    result = inf(sample)
    # padding removed: all locs within original dims
    if len(result["surf_locs"]):
        assert (result["surf_locs"] < np.asarray(dims)).all()
    assert np.isfinite(result["surf_sdf"]).all()
    assert len(result["levels"]) == 3
    assert "dense_out" in result["levels"][0]

    out_dir = str(tmp_path / "vis")
    pred_occs = [None, None, None]
    for h, lvl in enumerate(result["levels"]):
        if "locs" in lvl and len(lvl["locs"]):
            occ = 1 / (1 + np.exp(-lvl["out"][:, 0])) > 0.5
            pred_occs[h] = lvl["locs"][occ]
    save_predictions(
        out_dir, result["name"],
        result["input_locs"], result["input_sdf"], dims,
        target_for_sdf=None, target_for_occs=None,
        pred_surf=(result["surf_locs"], result["surf_sdf"]),
        pred_occ_locs=pred_occs, truncation=3.0,
    )
    files = os.listdir(out_dir)
    assert any("input-mesh" in f for f in files)


def test_compact_fetch_matches_dense(scene_dirs):
    """The on-device compact extraction must reproduce the host-side
    np.nonzero path exactly (locs sets, sdf values, level outputs)."""
    import dataclasses

    inp_dir, tgt_dir, dims = scene_dirs
    ds = SceneDataset(
        [os.path.join(inp_dir, "roomA.sdf")], 3.0, 3,
        max_input_height=0, target_path=tgt_dir,
    )
    sample = ds[0]
    # compact extraction only exists for the dense-grid executions
    cfg = dataclasses.replace(CFG, execution="dense_flow")
    params, stats = genmodel_init(jax.random.PRNGKey(1), cfg)
    ref = SceneInferencer(cfg, params, stats, compact=False)(sample)
    inf = SceneInferencer(cfg, params, stats, compact=True)
    assert inf.compact, "compact path must engage for dense_flow"
    got = inf(sample)
    assert len(got["surf_locs"]) == len(ref["surf_locs"])
    assert len(got["surf_locs"]) > 0  # non-degenerate fixture
    # nonzero order == C order both ways
    np.testing.assert_array_equal(got["surf_locs"], ref["surf_locs"])
    np.testing.assert_allclose(got["surf_sdf"], ref["surf_sdf"], atol=1e-6)
    assert len(got["levels"]) == len(ref["levels"])
    np.testing.assert_allclose(
        got["levels"][0]["dense_out"], ref["levels"][0]["dense_out"]
    )
    for g, r in zip(got["levels"][1:], ref["levels"][1:]):
        np.testing.assert_array_equal(g["locs"], r["locs"])
        np.testing.assert_allclose(g["out"], r["out"], atol=1e-6)
    # want_levels=False drops the per-level fetch but keeps the surface
    lite = SceneInferencer(
        cfg, params, stats, compact=True, want_levels=False
    )(sample)
    np.testing.assert_array_equal(lite["surf_locs"], ref["surf_locs"])
    assert len(lite["levels"]) == 1  # coarse only


def _overflow_fixture(scene_dirs):
    """(sample, reference result, undersized cfg, params, stats) where the
    compact fetch overflows its capacities on the first scene."""
    import dataclasses

    inp_dir, tgt_dir, dims = scene_dirs
    ds = SceneDataset(
        [os.path.join(inp_dir, "roomA.sdf")], 3.0, 3,
        max_input_height=0, target_path=tgt_dir,
    )
    sample = ds[0]
    cfg = dataclasses.replace(CFG, execution="dense_flow")
    params, stats = genmodel_init(jax.random.PRNGKey(1), cfg)
    ref = SceneInferencer(cfg, params, stats, compact=False)(sample)
    # shrink the compact-fetch capacities so the surface set overflows,
    # but keep the INPUT capacity intact (it defaults to the finest
    # level capacity; truncating it would corrupt the model input)
    tiny = dataclasses.replace(
        cfg, occupancy_fractions=(0.0001, 0.0001, 0.0001),
        input_capacity=cfg.for_scene(tuple(sample["sdf"].shape)).input_cap,
    )
    return sample, ref, tiny, params, stats


def test_compact_overflow_refits_bucket(scene_dirs):
    """Capacity overflow must recalibrate the shape bucket from observed
    counts (trained-checkpoint serving contract): exact result on the
    overflowing scene, and the NEXT scene in the bucket takes the compact
    fast path with no warning."""
    import warnings

    sample, ref, tiny, params, stats = _overflow_fixture(scene_dirs)
    inf = SceneInferencer(tiny, params, stats, compact=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = inf(sample)
    assert any("recalibrated" in str(x.message) for x in w)
    np.testing.assert_array_equal(got["surf_locs"], ref["surf_locs"])
    np.testing.assert_allclose(got["surf_sdf"], ref["surf_sdf"], atol=1e-6)
    dims = tuple(int(d) for d in sample["sdf"].shape)
    assert dims in inf._cap_override
    # refit capacities cover the observed counts with headroom
    for i, c in inf.observed_counts[dims].items():
        assert inf._cap_override[dims][i] >= c
    # second scene in the bucket: compact path, zero warnings
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        got2 = inf(sample)
    assert not [x for x in w2 if "overflow" in str(x.message)]
    np.testing.assert_array_equal(got2["surf_locs"], ref["surf_locs"])
    # the calibration record reports nonzero measured fractions
    fr = inf.measured_fractions()[dims]
    assert all(v > 0 for v in fr.values())


def test_compact_overflow_falls_back(scene_dirs):
    """With refit disabled, capacity overflow must refetch dense grids
    and still return the exact result (plus a warning)."""
    import warnings

    sample, ref, tiny, params, stats = _overflow_fixture(scene_dirs)
    inf = SceneInferencer(
        tiny, params, stats, compact=True, refit_capacities=False
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = inf(sample)
    assert any("overflow" in str(x.message) for x in w)
    np.testing.assert_array_equal(got["surf_locs"], ref["surf_locs"])
    np.testing.assert_allclose(got["surf_sdf"], ref["surf_sdf"], atol=1e-6)


def test_inferencer_caches_by_shape(scene_dirs):
    inp_dir, tgt_dir, _ = scene_dirs
    params, stats = genmodel_init(jax.random.PRNGKey(1), CFG)
    inf = SceneInferencer(CFG, params, stats)
    ds = SceneDataset(
        [os.path.join(inp_dir, f) for f in ("roomA.sdf", "roomB.sdf")],
        3.0, 3, target_path=tgt_dir,
    )
    inf(ds[0])
    inf(ds[1])
    assert len(inf._cache) == 1  # same padded shape -> one executable


@pytest.mark.slow
def test_cli_end_to_end(scene_dirs, tmp_path):
    inp_dir, tgt_dir, _ = scene_dirs
    # save a tiny converted-style checkpoint the CLI can load
    from sgnn_tpu.train.checkpoint import save_checkpoint
    from sgnn_tpu.train.state import create_train_state

    params, stats = genmodel_init(jax.random.PRNGKey(0), CFG)
    state = create_train_state(params, stats)
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, state, epoch=0, iteration=0)

    fl = tmp_path / "list.txt"
    fl.write_text("roomA.sdf\n")
    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "tools", "test_scene.py"),
            "--input_data_path", inp_dir,
            "--target_data_path", tgt_dir,
            "--test_file_list", str(fl),
            "--model_path", ckpt,
            "--output", str(out),
            "--num_hierarchy_levels", "3",
            "--encoder_dim", "4",
            "--coarse_feat_dim", "8",
            "--refine_feat_dim", "8",
            "--max_input_height", "0",
            "--occupancy_fractions", "1.0", "1.0", "1.0",
            "--cpu",
        ],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    files = os.listdir(out)
    assert any("input-mesh" in f for f in files), (files, r.stdout)


@pytest.mark.slow
def test_evaluate_cli(scene_dirs, tmp_path):
    from sgnn_tpu.train.checkpoint import save_checkpoint
    from sgnn_tpu.train.state import create_train_state

    inp_dir, tgt_dir, _ = scene_dirs
    params, stats = genmodel_init(jax.random.PRNGKey(0), CFG)
    state = create_train_state(params, stats)
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, state, epoch=0, iteration=0)
    fl = tmp_path / "list.txt"
    fl.write_text("roomA.sdf\n")
    out = str(tmp_path / "metrics.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "tools", "evaluate.py"),
            "--input_data_path", inp_dir,
            "--target_data_path", tgt_dir,
            "--test_file_list", str(fl),
            "--model_path", ckpt,
            "--output", out,
            "--num_hierarchy_levels", "3",
            "--encoder_dim", "4",
            "--coarse_feat_dim", "8",
            "--refine_feat_dim", "8",
            "--max_input_height", "0",
            "--occupancy_fractions", "1.0", "1.0", "1.0",
            "--cpu",
        ],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    import json as _json

    m = _json.load(open(out))
    assert "aggregate" in m and len(m["scenes"]) == 1
    s = m["scenes"][0]
    assert np.isfinite(s["l1_tgt"]) and s["l1_tgt"] >= 0

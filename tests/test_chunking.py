"""Chunk generation: TSDF downsampling + end-to-end scene -> .sdfs -> loader."""

import numpy as np

from sgnn_tpu.data import formats as F
from sgnn_tpu.data.dataset import SceneDataset
from sgnn_tpu.datagen import chunking as CH


def test_downsample_min_abs():
    d = np.full((4, 4, 4), -np.inf, np.float32)
    d[0, 0, 0] = 2.0
    d[1, 1, 1] = -0.5  # closest to surface in block (0,0,0)
    d[2, 2, 2] = 1.0   # only finite in block (1,1,1)
    out = CH.downsample_tsdf_min_abs(d)
    assert out.shape == (2, 2, 2)
    assert out[0, 0, 0] == -0.5
    assert out[1, 1, 1] == 1.0
    assert out[0, 1, 0] == -np.inf


def _sphere_scene(dims=(128, 64, 64), vs=0.02):
    z, y, x = np.meshgrid(*(np.arange(d) for d in dims), indexing="ij")
    c = np.array([d / 2 for d in dims])
    d = (np.sqrt((z - c[0]) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2) - 20.0)
    d = d * vs  # world units
    m = np.abs(d) < 6 * vs
    locs = np.stack(np.nonzero(m), -1).astype(np.int32)
    vals = (d[m] / vs).astype(np.float32)  # loader units (voxels)
    return F.SceneVolume(locs, vals, dims, vs, np.eye(4, dtype=np.float32))


def test_chunk_scene_roundtrip(tmp_path):
    vol = _sphere_scene()
    known = np.zeros(vol.dims, np.uint8)
    chunks = list(
        CH.chunk_scene(vol, vol, known, (128, 64, 64), (64, 32, 32),
                       min_target_surface=100, min_input_surface=50)
    )
    assert len(chunks) >= 1
    origin, chunk = chunks[0]
    p = str(tmp_path / "c.sdfs")
    F.save_train_file(p, chunk)
    got = F.load_train_file(p)
    assert got.dims == (128, 64, 64)
    assert len(got.hierarchy) == 3
    assert got.hierarchy[0].shape == (16, 8, 8)
    assert got.hierarchy[2].shape == (64, 32, 32)
    # chunk target matches the scene crop (voxel units)
    sl = tuple(slice(o, o + s) for o, s in zip(origin, (128, 64, 64)))
    scene_dense = F.sparse_to_dense(vol.locs, vol.sdf, vol.dims, -np.inf)
    np.testing.assert_allclose(
        got.target_sdf, scene_dense[sl], rtol=1e-4, atol=1e-4
    )
    # hierarchy zero-crossings: coarse surfaces exist where fine do
    fine_surf = np.abs(np.where(np.isfinite(got.target_sdf),
                                got.target_sdf, 1e9)) < 3
    if fine_surf.any():
        h2 = got.hierarchy[2]
        assert (np.abs(np.where(np.isfinite(h2), h2, 1e9)) < 6).any()
    # consumable by the training dataset
    ds = SceneDataset([p], truncation=3.0, num_hierarchy_levels=4)
    s = ds[0]
    assert len(s["input_locs"]) > 0
    assert s["sdf"].shape == (128, 64, 64)

"""Marching cubes: analytic-SDF golden tests + native/numpy parity + PLY."""

import os

import numpy as np
import pytest

from sgnn_tpu.meshing import marching_cubes as MC
from sgnn_tpu.meshing import native, ply


def _sphere_tsdf(n=32, r=10.0, trunc=3.0):
    z, y, x = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
    c = (n - 1) / 2.0
    d = np.sqrt((z - c) ** 2 + (y - c) ** 2 + (x - c) ** 2) - r
    return np.clip(d, -trunc + 1e-3, trunc - 1e-3).astype(np.float32)


def test_sphere_mesh_geometry():
    n, r = 32, 10.0
    tsdf = _sphere_tsdf(n, r)
    verts, cols, faces = MC.run_marching_cubes(
        tsdf, None, isovalue=0.0, truncation=3.0, thresh=10.0
    )
    assert len(verts) > 200 and len(faces) > 200
    # all vertices near the sphere surface
    c = (n - 1) / 2.0
    rad = np.linalg.norm(verts - c, axis=1)
    assert np.abs(rad - r).max() < 0.8
    assert np.abs(rad - r).mean() < 0.2
    # faces index valid vertices, no degenerates
    assert faces.min() >= 0 and faces.max() < len(verts)
    assert (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    ).all()
    # mesh is watertight-ish: every edge shared by exactly 2 faces
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], 0
    )
    edges = np.sort(edges, 1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_invalid_voxels_cut_mesh():
    tsdf = _sphere_tsdf(32, 10.0)
    tsdf[:, :, 16:] = -np.inf  # unobserved half
    verts, _, faces = MC.run_marching_cubes(tsdf, None, 0.0, 3.0, 10.0)
    assert len(verts) > 0
    assert verts[:, 0].max() < 16.0  # x beyond the cut produces nothing


def test_thresh_rejects_inconsistent_cubes():
    tsdf = _sphere_tsdf(16, 5.0, trunc=4.0)
    # huge thresh: normal mesh; tiny thresh: everything rejected
    v1, _, _ = MC.run_marching_cubes(tsdf, None, 0.0, 4.0, 10.0)
    v2, _, _ = MC.run_marching_cubes(tsdf, None, 0.0, 4.0, 1e-6)
    assert len(v1) > 0 and len(v2) == 0


def test_native_matches_numpy():
    impl = native.get_native()
    if impl is None:
        pytest.skip("native mc lib unavailable")
    tsdf = _sphere_tsdf(24, 7.5)
    tsdf[2:5, 3:9, 4:6] = -np.inf
    tv_c, tc_c = impl.run(tsdf, None, 0.0, 3.0, 10.0)
    tv_py, tc_py = MC.run_marching_cubes_numpy(tsdf, None, 0.0, 3.0, 10.0)
    assert tv_c.shape == tv_py.shape
    # order may differ (parallel scan): compare as sorted sets of triangles,
    # rounding first so fp noise can't destabilize the sort pairing
    def canon(tv):
        flat = tv.reshape(len(tv), -1).round(4)
        return flat[np.lexsort(flat.T[::-1])]

    np.testing.assert_allclose(canon(tv_c), canon(tv_py), atol=2e-4)


def test_colors_propagate():
    tsdf = _sphere_tsdf(16, 5.0)
    colors = np.zeros((16, 16, 16, 3), np.uint8)
    colors[..., 0] = 255  # red everywhere
    verts, cols, faces = MC.run_marching_cubes(tsdf, colors, 0.0, 3.0, 10.0)
    assert (cols[:, 0] == 255).all() and (cols[:, 1] == 0).all()


def test_ply_roundtrip(tmp_path):
    tsdf = _sphere_tsdf(16, 5.0)
    verts, cols, faces = MC.run_marching_cubes(tsdf, None, 0.0, 3.0, 10.0)
    p = str(tmp_path / "mesh.ply")
    ply.save_ply(p, verts, cols, faces)
    v2, c2, f2 = ply.load_ply(p)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(c2, cols)
    np.testing.assert_array_equal(f2, faces)


def test_marching_cubes_writes_file(tmp_path):
    tsdf = _sphere_tsdf(16, 5.0)
    p = str(tmp_path / "mesh.ply")
    MC.marching_cubes(tsdf, None, 0.0, 3.0, 10.0, p)
    assert os.path.getsize(p) > 100

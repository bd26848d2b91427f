"""Datagen: .sens IO, bilateral filter, TSDF fusion semantics, .knw/.sdf
round-trips through the training loaders."""

import numpy as np
import pytest

from sgnn_tpu.data import formats as F
from sgnn_tpu.datagen import camera as CAM
from sgnn_tpu.datagen import fusion as FU
from sgnn_tpu.datagen import sens as SENS


def _intrinsic(fx, fy, cx, cy):
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[0, 2], m[1, 2] = fx, fy, cx, cy
    return m


def test_sens_roundtrip(tmp_path, rng):
    W, H = 32, 24
    intr = _intrinsic(30.0, 30.0, 15.5, 11.5)
    frames = [(rng.rand(H, W) * 3000).astype(np.uint16) for _ in range(3)]
    poses = [np.eye(4, dtype=np.float32) for _ in range(3)]
    poses[1][0, 3] = 1.5
    p = str(tmp_path / "a.sens")
    SENS.write_sens(p, "testcam", intr, frames, poses, depth_shift=1000.0)
    sf = SENS.SensFile(p)
    assert sf.num_frames == 3
    assert sf.depth_width == W and sf.depth_height == H
    np.testing.assert_array_equal(sf.depth_raw(1), frames[1])
    np.testing.assert_allclose(sf.poses[1], poses[1])
    d, i2, pose = sf.depth_frame(0, W, H, min_depth=0.1, max_depth=12.0)
    valid = frames[0] > 100  # > min_depth * shift
    np.testing.assert_allclose(
        d[valid], frames[0][valid] / 1000.0, rtol=1e-6
    )
    np.testing.assert_allclose(i2, intr)  # same size -> unchanged
    # resampling halves the image and adapts intrinsics
    d2, i3, _ = sf.depth_frame(0, W // 2, H // 2, 0.1, 12.0)
    assert d2.shape == (H // 2, W // 2)
    np.testing.assert_allclose(i3[0, 0], intr[0, 0] * 0.5)
    sf.close()


def test_bilateral_filter():
    d = np.full((20, 20), 2.0, np.float32)
    d[5, 5] = -np.inf  # invalid stays invalid
    d[10, 10] = 2.05   # small noise gets smoothed toward 2.0
    d[0, 0] = 5.0      # depth edge: far outlier barely mixes
    out = CAM.bilateral_filter(d, 2.0, 0.1)
    assert out[5, 5] == -np.inf
    assert abs(out[10, 10] - 2.0) < abs(2.05 - 2.0)
    assert abs(out[0, 0] - 5.0) < 0.2  # edge preserved
    assert abs(out[15, 15] - 2.0) < 1e-5


def _wall_setup(vs=0.05):
    """Camera at origin looking +z at a wall z=2m; grid around the wall."""
    W, H = 32, 24
    intr = _intrinsic(40.0, 40.0, (W - 1) / 2, (H - 1) / 2)
    depth = np.full((H, W), 2.0, np.float32)
    pose = np.eye(4, dtype=np.float32)  # camera == world
    obb = FU.OBB(
        np.array([0.0, 0.0, 1.5]), np.eye(3), np.array([2.0, 2.0, 1.5])
    )
    grid = FU.make_grid_for_scene(
        [-0.8, -0.6, 1.0], [0.8, 0.6, 3.0], vs, obb, scene_pad=2,
        height_pad=2,
    )
    return grid, intr, pose, depth


def test_integrate_wall_sdf():
    grid, intr, pose, depth = _wall_setup()
    grid.integrate(intr, pose, depth)
    # voxel at world (0, 0, 2.0) should have sdf ~ 0
    g = grid.world2grid[:3, :3] @ np.array([0, 0, 2.0]) + grid.world2grid[:3, 3]
    gi = np.round(g).astype(int)
    v = grid.sdf[gi[0], gi[1], gi[2]]
    assert np.isfinite(v) and abs(v) < grid.voxel_size * 1.5
    # in front of the wall (z=1.8): positive sdf, free counter incremented
    g = grid.world2grid[:3, :3] @ np.array([0, 0, 1.8]) + grid.world2grid[:3, 3]
    gi = np.round(g).astype(int)
    assert grid.sdf[gi[0], gi[1], gi[2]] > 0
    assert grid.free_ctr[gi[0], gi[1], gi[2]] == 1
    # far behind the wall (z=2.5 > trunc band): untouched (-inf)
    g = grid.world2grid[:3, :3] @ np.array([0, 0, 2.5]) + grid.world2grid[:3, 3]
    gi = np.round(g).astype(int)
    assert grid.sdf[gi[0], gi[1], gi[2]] == -np.inf
    # weight update value: d=2.0 -> 4.5*(1-(2-0.4)/3.6)=2.5 -> floor 2
    g = grid.world2grid[:3, :3] @ np.array([0, 0, 2.0]) + grid.world2grid[:3, 3]
    gi = np.round(g).astype(int)
    assert grid.weight[gi[0], gi[1], gi[2]] == 2.0


def test_integrate_weighted_average():
    grid, intr, pose, depth = _wall_setup()
    grid.integrate(intr, pose, depth)
    sdf1 = grid.sdf.copy()
    # second view of a slightly shifted wall: running weighted average
    grid.integrate(intr, pose, depth + 0.02)
    moved = np.isfinite(sdf1) & np.isfinite(grid.sdf)
    assert (grid.sdf[moved] >= sdf1[moved] - 1e-6).all()
    assert (grid.sdf[moved] <= sdf1[moved] + 0.021).all()


def test_known_encoding():
    grid, intr, pose, depth = _wall_setup()
    grid.integrate(intr, pose, depth)
    known = grid.known_grid()
    vs = grid.voxel_size
    # known-empty in front of wall
    g = grid.world2grid[:3, :3] @ np.array([0, 0, 1.7]) + grid.world2grid[:3, 3]
    gi = np.round(g).astype(int)
    assert known[gi[0], gi[1], gi[2]] == 0
    # occupied at wall
    g = grid.world2grid[:3, :3] @ np.array([0, 0, 2.0]) + grid.world2grid[:3, 3]
    gi = np.round(g).astype(int)
    assert known[gi[0], gi[1], gi[2]] == 1
    # unobserved -> 255
    g = grid.world2grid[:3, :3] @ np.array([0, 0, 2.8]) + grid.world2grid[:3, 3]
    gi = np.round(g).astype(int)
    assert known[gi[0], gi[1], gi[2]] == 255
    # just-behind voxels distance-coded >= 2
    behind = grid.sdf < -vs
    finite_behind = behind & np.isfinite(grid.sdf)
    if finite_behind.any():
        assert (known[finite_behind] >= 2).all()


def test_save_roundtrip_through_training_loader(tmp_path):
    """The fusion outputs must parse with the training-side loaders and
    reproduce the in-memory grid (the reference's debug roundtrip check,
    Fuser.cpp:95-130, eps 1e-5)."""
    grid, intr, pose, depth = _wall_setup()
    grid.integrate(intr, pose, depth)
    sdf_p = str(tmp_path / "s.sdf")
    knw_p = str(tmp_path / "s.knw")
    grid.save_sdf(sdf_p, truncation_factor=6.0)
    grid.save_known(knw_p)
    vol = F.load_scene(sdf_p)
    X, Y, Z = grid.dims
    assert vol.dims == (Z, Y, X)
    # loader flips to zyx and divides by voxel size
    dense = F.sparse_to_dense(vol.locs, vol.sdf, vol.dims, -np.inf)
    m = np.abs(grid.sdf) <= 6.0 * grid.voxel_size
    x, y, z = np.nonzero(m)
    np.testing.assert_allclose(
        dense[z, y, x], grid.sdf[m] / grid.voxel_size, rtol=1e-5, atol=1e-5
    )
    known = F.load_scene_known(knw_p)
    assert known.shape == (Z, Y, X)
    np.testing.assert_array_equal(
        known, grid.known_grid().transpose(2, 1, 0)
    )


def test_frame_selection_and_drop():
    obb = FU.OBB(np.zeros(3), np.eye(3), np.array([1.0, 1.0, 1.0]))
    poses = []
    for i in range(10):
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = [0.1 * i, 0, 0]  # 0..0.9: all inside
        poses.append(p)
    for i in range(5):
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = [2.0 + i, 0, 0]  # outside
        poses.append(p)
    ids = FU.select_frames_in_obb(poses, obb, min_extra=3)
    assert set(range(10)).issubset(ids)
    assert set(ids) - set(range(10)) == {10, 11, 12}  # 3 closest outside
    inc = FU.drop_frames(list(range(100)), 0.65, seed=1)
    assert 10 < len(inc) < 60  # ~35 kept
    # deterministic given the seed
    assert inc == FU.drop_frames(list(range(100)), 0.65, seed=1)


def test_obb_zup(rng):
    # rotated box in xy
    ang = 0.7
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]]
    )
    pts = (rng.rand(500, 3) - 0.5) * np.array([4, 1, 2])
    pts = pts @ R.T + np.array([5, 3, 1])
    obb = FU.OBB.from_points_zup(pts)
    assert obb.contains(pts).all()
    # OBB is tight: volume close to the true box volume (4*1*2)
    vol = np.prod(2 * obb.half)
    assert vol < 4 * 1 * 2 * 1.3


def test_segmentation_parsers(tmp_path):
    from sgnn_tpu.datagen.segmentation import (
        SemanticSegmentation, VertexSegmentation,
    )

    vs = tmp_path / "r.vsegs.json"
    vs.write_text('{"sceneId":"s1","segIndices":[5,5,7,9,7]}')
    ss = tmp_path / "r.semseg.json"
    ss.write_text(
        '{"sceneId":"s1","segGroups":[{"id":0,"label":"chair",'
        '"segments":[5,9]},{"id":1,"label":"table","segments":[7]}]}'
    )
    v = VertexSegmentation.load(str(vs))
    s = SemanticSegmentation.load(str(ss))
    assert list(v.vertices_for_segments([7])) == [2, 4]
    labels = s.vertex_labels(v)
    assert labels.tolist() == [0, 0, 1, 0, 1]


def test_param_file_parsing(tmp_path):
    from sgnn_tpu.datagen.params import parse_param_file

    p = tmp_path / "params.txt"
    p.write_text(
        's_scanPath = "./data/scans";  // comment\n'
        "\n"
        "s_maxNumSens = 3;\n"
        "s_voxelSize = 0.02f; //in m\n"
        "s_filterDepthMap = true;\n"
        "s_chanceDropFrames = 0.65f;\n"
        "s_bUseRenderedDepth = false;\n"
    )
    d = parse_param_file(str(p))
    assert d["s_scanPath"] == "./data/scans"
    assert d["s_maxNumSens"] == 3
    assert abs(d["s_voxelSize"] - 0.02) < 1e-9
    assert d["s_filterDepthMap"] is True
    assert d["s_bUseRenderedDepth"] is False
    assert abs(d["s_chanceDropFrames"] - 0.65) < 1e-9


def test_voxelgrid_inspection_api():
    grid, intr, pose, depth = _wall_setup()
    grid.integrate(intr, pose, depth)
    locs, vals = grid.surface_voxels(weight_thresh=1)
    assert len(locs) > 0
    assert (np.abs(vals) < grid.truncation(0.0)).all()
    occ = grid.to_binary_grid_occupied()
    assert occ.any() and occ.shape == grid.dims
    free = grid.to_binary_grid_free()
    assert free.any()
    # trilinear sample near the wall center: sdf ~ 0, valid
    v, ok = grid.trilinear_sample(np.array([[0.0, 0.0, 2.0]]))
    assert ok[0] and abs(v[0]) < grid.voxel_size * 2
    # far behind: invalid
    v, ok = grid.trilinear_sample(np.array([[0.0, 0.0, 2.9]]))
    assert not ok[0]
    # normalize to voxel units
    s_before = grid.sdf[np.isfinite(grid.sdf)].copy()
    vs = grid.voxel_size
    grid.normalize_sdfs()
    np.testing.assert_allclose(
        grid.sdf[np.isfinite(grid.sdf)], s_before / vs, rtol=1e-6
    )


def test_edge_mask():
    d = np.full((16, 16), 2.0, np.float32)
    d[:, 8:] = 3.0  # depth discontinuity at column 8
    m = CAM.compute_edge_mask(d, depth_thresh=0.5, frac_thresh=0.2, radius=2)
    assert m[8, 8] or m[8, 7]  # edge detected near the jump
    assert not m[8, 2] and not m[8, 14]  # flat regions clean


def test_verify_roundtrip_and_debug_mesh(tmp_path):
    grid, intr, pose, depth = _wall_setup()
    grid.integrate(intr, pose, depth)
    p = str(tmp_path / "g.sdf")
    grid.save_sdf(p)
    assert FU.verify_roundtrip(grid, p)
    mesh = str(tmp_path / "g_debug-mesh.ply")
    FU.export_debug_mesh(grid, mesh)
    import os

    assert os.path.getsize(mesh) > 100


def test_integrate_color():
    """Color fusion: TSDF-updated voxels take the weight-matched running
    average of the sampled RGB (fills the color field the reference
    Voxel declares, VoxelGrid.h:16)."""
    grid, intr, pose, depth = _wall_setup()
    H, W = depth.shape
    red = np.zeros((H, W, 3), np.uint8)
    red[..., 0] = 255
    grid.integrate(intr, pose, depth, color=red)
    g = grid.world2grid[:3, :3] @ np.array([0, 0, 2.0]) \
        + grid.world2grid[:3, 3]
    gi = np.round(g).astype(int)
    np.testing.assert_allclose(
        grid.color[gi[0], gi[1], gi[2]], [1.0, 0.0, 0.0], atol=1e-6
    )
    # second frame in blue: color moves toward blue but stays a convex
    # average, with the same weights as the sdf update
    blue = np.zeros((H, W, 3), np.float32)
    blue[..., 2] = 1.0
    grid.integrate(intr, pose, depth, color=blue)
    c = grid.color[gi[0], gi[1], gi[2]]
    assert 0.0 < c[0] < 1.0 and 0.0 < c[2] < 1.0
    np.testing.assert_allclose(c[0] + c[2], 1.0, atol=1e-6)
    assert c[1] == 0.0
    # depth-only integrate still works after color allocation
    grid.integrate(intr, pose, depth)


def test_lighting_and_material():
    """Lighting/SimpleMaterial parity: randomizers, clamped draws,
    energy conservation, text save/load round-trips
    (Lighting.h:50-83, SimpleMaterial.h:57-134)."""
    from sgnn_tpu.datagen.lighting import (
        MAX_NUM_LIGHTS, Lighting, SimpleMaterial,
    )

    rng = np.random.RandomState(0)
    lt = Lighting.random(3, rng)
    assert lt.num_lights == 3
    np.testing.assert_allclose(
        np.linalg.norm(lt.lights[:, :3], axis=1), 1.0, rtol=1e-5
    )
    assert (lt.lights[:, 3] == 0).all()  # directional
    with pytest.raises(ValueError):
        Lighting(np.zeros((MAX_NUM_LIGHTS + 1, 4)))

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = td + "/lights.txt"
        lt.save_to_file(p)
        lt2 = Lighting.load_from_file(p)
        np.testing.assert_array_equal(lt.lights, lt2.lights)

        for maker in (SimpleMaterial.random_ward,
                      SimpleMaterial.random_phong):
            m = maker(rng)
            tot = m.ambient + m.diffuse + m.specular
            if maker is SimpleMaterial.random_ward:
                assert tot[:3].max() <= 1.0 + 1e-6  # energy conservation
                assert 1.0 <= m.shiny <= 10.0
            else:
                assert 0.5 <= m.shiny <= 50.0
            assert (m.ambient >= 0).all() and (m.diffuse <= 1).all()
            mp = td + "/mat.txt"
            m.save_to_file(mp)
            m2 = SimpleMaterial.load_from_file(mp)
            np.testing.assert_array_equal(m.diffuse, m2.diffuse)
            np.testing.assert_array_equal(m.specular, m2.specular)
            assert m.shiny == m2.shiny


def test_native_integrate_parity(rng, monkeypatch):
    """cpp/fuse.cpp == the numpy slab update, bit-for-bit (sdf, weight,
    free_ctr), with and without an OBB and across invalid/zero/out-of-
    range depth pixels."""
    if FU._get_fuse_lib() is None:
        pytest.skip("native fuse lib unavailable")
    W, H = 64, 48
    intr = _intrinsic(40.0, 40.0, (W - 1) / 2, (H - 1) / 2)
    dims = (40, 36, 30)
    w2g = np.eye(4, dtype=np.float32)
    w2g[:3, :3] *= 1.0 / 0.05
    w2g[:3, 3] = [8, 6, 4]
    for use_obb in (False, True):
        obb = None
        if use_obb:
            obb = FU.OBB(
                center=np.array([20.0, 18.0, 15.0]),
                axes=np.eye(3),
                half=np.array([25.0, 22.0, 18.0]),
            )
        grids = []
        for native in (False, True):
            if native:
                monkeypatch.delenv("SGNN_TPU_NO_NATIVE", raising=False)
            else:
                monkeypatch.setenv("SGNN_TPU_NO_NATIVE", "1")
            g = FU.VoxelGrid(dims, w2g, 0.05, obb)
            r = np.random.RandomState(7)
            for k in range(5):
                th = 2 * np.pi * k / 5
                pose = np.eye(4, dtype=np.float32)
                fwd = np.array([np.cos(th), np.sin(th), 0.0])
                up = np.array([0.0, 0.0, 1.0])
                right = np.cross(fwd, up)
                pose[:3, 0], pose[:3, 1], pose[:3, 2] = right, -up, fwd
                pose[:3, 3] = [1.1, 0.9, 0.7]
                d = r.uniform(0.2, 4.6, (H, W)).astype(np.float32)
                d[r.rand(H, W) < 0.1] = -np.inf   # invalid pixels
                d[r.rand(H, W) < 0.05] = 0.0      # below depth_min
                with np.errstate(invalid="ignore"):
                    g.integrate(intr, pose, d)
            grids.append(g)
        ref, nat = grids
        assert np.isfinite(ref.sdf).sum() > 1000  # non-trivial case
        np.testing.assert_array_equal(
            np.isfinite(ref.sdf), np.isfinite(nat.sdf)
        )
        m = np.isfinite(ref.sdf)
        np.testing.assert_array_equal(ref.sdf[m], nat.sdf[m])
        np.testing.assert_array_equal(ref.weight, nat.weight)
        np.testing.assert_array_equal(ref.free_ctr, nat.free_ctr)

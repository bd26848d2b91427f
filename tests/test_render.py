"""Software depth rasterizer: analytic scenes + native/numpy parity."""

import numpy as np
import pytest

from sgnn_tpu.datagen import render as R


def _intrinsic(fx, fy, cx, cy):
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[0, 2], m[1, 2] = fx, fy, cx, cy
    return m


def _quad(z=2.0, half=1.0):
    verts = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z],
         [-half, half, z]], np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def test_wall_depth():
    W, H = 64, 48
    intr = _intrinsic(40.0, 40.0, (W - 1) / 2, (H - 1) / 2)
    verts, faces = _quad(z=2.0, half=3.0)  # covers the whole view
    d = R.render_depth(verts, faces, np.eye(4), intr, W, H)
    assert d.shape == (H, W)
    assert np.isfinite(d).all()
    np.testing.assert_allclose(d, 2.0, rtol=1e-4)


def test_partial_coverage_and_occlusion():
    W, H = 64, 48
    intr = _intrinsic(40.0, 40.0, (W - 1) / 2, (H - 1) / 2)
    # far wall everywhere + near small quad in the center
    v1, f1 = _quad(z=3.0, half=5.0)
    v2, f2 = _quad(z=1.0, half=0.2)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    d = R.render_depth(verts, faces, np.eye(4), intr, W, H)
    cyi, cxi = H // 2, W // 2
    assert abs(d[cyi, cxi] - 1.0) < 1e-3  # near quad occludes
    assert abs(d[2, 2] - 3.0) < 1e-3      # corner sees the far wall
    # depth range filter
    d2 = R.render_depth(verts, faces, np.eye(4), intr, W, H, near=1.5)
    assert d2[cyi, cxi] == -np.inf


def test_camera_transform():
    W, H = 32, 32
    intr = _intrinsic(30.0, 30.0, (W - 1) / 2, (H - 1) / 2)
    verts, faces = _quad(z=0.0, half=4.0)  # wall at world z=0
    cam2world = np.eye(4)
    cam2world[2, 3] = -2.0  # camera at z=-2 looking +z -> distance 2
    d = R.render_depth(verts, faces, cam2world, intr, W, H)
    np.testing.assert_allclose(d[H // 2, W // 2], 2.0, rtol=1e-4)


def test_native_matches_numpy():
    if R._get_lib() is None:
        pytest.skip("native rasterizer unavailable")
    rng = np.random.RandomState(0)
    W, H = 48, 36
    intr = _intrinsic(35.0, 35.0, (W - 1) / 2, (H - 1) / 2)
    # random triangle soup in front of the camera
    verts = rng.rand(60, 3).astype(np.float32) * np.array([2, 2, 1.5]) + \
        np.array([-1, -1, 1.0])
    faces = rng.randint(0, 60, (40, 3)).astype(np.int32)
    w2c = np.eye(4, dtype=np.float32)
    a = R.render_depth(verts, faces, w2c, intr, W, H)
    b = R._render_depth_numpy(
        verts, faces, np.linalg.inv(w2c).astype(np.float32), intr, W, H,
        0.1, 10.0,
    )
    finite = np.isfinite(a) & np.isfinite(b)
    assert (np.isfinite(a) == np.isfinite(b)).mean() > 0.995
    np.testing.assert_allclose(a[finite], b[finite], rtol=1e-3, atol=1e-3)


def test_ply_mesh_loader_and_rendered_scene(tmp_path, rng):
    """End-to-end: write a PLY box room, render depth from it, fuse."""
    from sgnn_tpu.datagen import fusion as FU
    from sgnn_tpu.datagen import sens as SENS
    from sgnn_tpu.datagen.scene import Scene, ScanInfo, load_ply_mesh

    # a single wall quad at z... build in world: wall plane y=2 facing -y
    verts = np.array(
        [[-2, 2.0, 0], [2, 2.0, 0], [2, 2.0, 2.5], [-2, 2.0, 2.5]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    ply = tmp_path / "region0.reduced.ply"
    with open(ply, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
        )
        f.write(header.encode())
        f.write(verts.astype("<f4").tobytes())
        for fc in faces:
            f.write(np.uint8(3).tobytes())
            f.write(fc.astype("<i4").tobytes())
    v2, f2 = load_ply_mesh(str(ply))
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(f2, faces)

    # one camera at origin looking +y (rotate camera +z onto world +y)
    pose = np.array(
        [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 1.0], [0, 0, 0, 1]],
        np.float32,
    )  # camera z axis -> world +y, positioned at (0, 0, 1)
    W, H = 32, 24
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 30.0
    intr[0, 2], intr[1, 2] = (W - 1) / 2, (H - 1) / 2
    sens_path = tmp_path / "s_0.sens"
    SENS.write_sens(
        str(sens_path), "synth", intr,
        [np.zeros((H, W), np.uint16)], [pose],
    )
    scene = Scene(
        ScanInfo("s_room0", str(ply), [str(sens_path)]),
        use_rendered_depth=True,
    )
    out = scene.depth_frame(0, W, H)
    assert out is not None
    depth, intr2, pose2 = out
    # wall at world y=2, camera at y=0 -> depth 2 in the center
    np.testing.assert_allclose(depth[H // 2, W // 2], 2.0, rtol=1e-3)
    scene.close()


def test_ply_ascii_loader(tmp_path):
    from sgnn_tpu.datagen.scene import load_ply_mesh, load_ply_vertices

    ply = tmp_path / "m.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\n"
        "element face 1\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0 255\n1 0 0 10\n0 1 0 20\n"
        "3 0 1 2\n"
    )
    v = load_ply_vertices(str(ply))
    np.testing.assert_allclose(v, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    v2, f = load_ply_mesh(str(ply))
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_render_color_flat_provoking_vertex():
    """Flat color = first (provoking) vertex color per face, matching
    the nointerpolation annotation shader (drawAnnotations.hlsl:12)."""
    W, H = 64, 48
    intr = _intrinsic(40.0, 40.0, (W - 1) / 2, (H - 1) / 2)
    verts, faces = _quad(z=2.0, half=3.0)
    cols = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32
    )
    d, c = R.render_color(verts, faces, cols, np.eye(4), intr, W, H)
    assert np.isfinite(d).all()
    # both faces share provoking vertex 0 -> whole frame red
    np.testing.assert_allclose(c, np.broadcast_to([1, 0, 0], c.shape))
    # miss pixels are black + faceid -1
    d2, fid = R.render_faceid(verts, faces, np.eye(4), intr, W, H,
                              near=2.5)
    assert (fid == -1).all() and (d2 == -np.inf).all()


def test_render_faceid_native_matches_numpy():
    rng = np.random.RandomState(3)
    W, H = 48, 36
    intr = _intrinsic(30.0, 30.0, (W - 1) / 2, (H - 1) / 2)
    verts = rng.rand(30, 3).astype(np.float32) * 2 - 1
    verts[:, 2] = verts[:, 2] * 0.5 + 2.5
    faces = rng.randint(0, 30, (40, 3)).astype(np.int32)
    if R._get_lib() is None:
        pytest.skip("native rasterizer unavailable")
    d1, f1 = R.render_faceid(verts, faces, np.eye(4), intr, W, H)
    w2c = np.eye(4, dtype=np.float32)
    d2, f2 = R._render_faceid_numpy(
        verts, faces, w2c, intr, W, H, 0.1, 10.0
    )
    hit = (f1 >= 0) & (f2 >= 0)
    assert hit.mean() > 0.1
    np.testing.assert_allclose(d1[hit], d2[hit], rtol=1e-4, atol=1e-5)
    # face ids agree wherever the winning depths aren't a coplanar tie
    diff = f1[hit] != f2[hit]
    assert diff.mean() < 0.02


def test_render_phong_shading():
    """Wall facing the camera, light along +z toward it: diffuse fully
    lit; light at grazing angle: dimmer."""
    from sgnn_tpu.datagen.lighting import Lighting, SimpleMaterial

    W, H = 32, 32
    intr = _intrinsic(30.0, 30.0, (W - 1) / 2, (H - 1) / 2)
    verts, faces = _quad(z=2.0, half=3.0)
    mat = SimpleMaterial([0.1, 0.1, 0.1, 1], [0.6, 0.6, 0.6, 1],
                         [0, 0, 0, 1], 1.0)
    # light direction = surface -> light = -z (toward the camera)
    lit = Lighting(np.array([[0, 0, -1, 0]], np.float32))
    d, c = R.render_phong(verts, faces, np.eye(4), intr, W, H, lit, mat)
    np.testing.assert_allclose(c[H // 2, W // 2], 0.7, atol=1e-3)
    grazing = Lighting(np.array([[1, 0, 0, 0]], np.float32))
    d, cg = R.render_phong(verts, faces, np.eye(4), intr, W, H,
                           grazing, mat)
    np.testing.assert_allclose(cg[H // 2, W // 2], 0.1, atol=1e-3)

"""Format round-trips (independent struct-based oracle) + dataset/collate."""

import struct

import numpy as np
import pytest

from sgnn_tpu.data import formats as F
from sgnn_tpu.data import dataset as DS


def _make_chunk(rng, dims=(16, 8, 8), vs=0.02, n_in=30):
    Z, Y, X = dims
    flat = rng.choice(Z * Y * X, size=n_in, replace=False)
    z, rem = flat // (Y * X), flat % (Y * X)
    y, x = rem // X, rem % X
    in_locs = np.stack([z, y, x], -1).astype(np.int32)
    in_sdf = (rng.randn(n_in) * 2).astype(np.float32)
    target = np.full(dims, -np.inf, np.float32)
    tl = rng.choice(Z * Y * X, size=40, replace=False)
    tz, trem = tl // (Y * X), tl % (Y * X)
    ty, tx = trem // X, trem % X
    target[tz, ty, tx] = rng.randn(40).astype(np.float32)
    known = (rng.rand(*dims) * 4).astype(np.uint8)
    hier = []
    for f in (8, 4, 2):  # coarse -> fine
        hd = (Z // f, Y // f, X // f)
        g = np.full(hd, -np.inf, np.float32)
        m = rng.rand(*hd) > 0.5
        g[m] = rng.randn(m.sum()).astype(np.float32)
        hier.append(g)
    w2g = np.eye(4, dtype=np.float32) * 1.0 / vs
    return F.TrainChunk(in_locs, in_sdf, target, dims, vs, w2g, known, hier)


def _oracle_parse_sdfs(path, vs):
    """Independent parser following data_util.py:63-108 byte-by-byte."""
    fin = open(path, "rb")
    dimx = struct.unpack("Q", fin.read(8))[0]
    dimy = struct.unpack("Q", fin.read(8))[0]
    dimz = struct.unpack("Q", fin.read(8))[0]
    voxelsize = struct.unpack("f", fin.read(4))[0]
    assert abs(voxelsize - vs) < 1e-8
    struct.unpack("f" * 16, fin.read(64))
    num = struct.unpack("Q", fin.read(8))[0]
    locs = np.asarray(
        struct.unpack("I" * num * 3, fin.read(num * 12)), np.int32
    ).reshape(num, 3)
    locs = np.flip(locs, 1).copy()
    sdfs = np.asarray(struct.unpack("f" * num, fin.read(num * 4)), np.float32)
    sdfs /= voxelsize
    fin.close()
    return (dimz, dimy, dimx), locs, sdfs


def test_sdfs_roundtrip(tmp_path, rng):
    chunk = _make_chunk(rng)
    p = str(tmp_path / "chunk.sdfs")
    F.save_train_file(p, chunk)
    got = F.load_train_file(p)
    assert got.dims == chunk.dims
    assert abs(got.voxelsize - chunk.voxelsize) < 1e-8
    np.testing.assert_allclose(got.world2grid, chunk.world2grid)
    np.testing.assert_array_equal(got.input_locs, chunk.input_locs)
    np.testing.assert_allclose(got.input_sdf, chunk.input_sdf, rtol=1e-5)
    np.testing.assert_allclose(got.target_sdf, chunk.target_sdf, rtol=1e-5)
    np.testing.assert_array_equal(got.known, chunk.known)
    assert len(got.hierarchy) == 3
    for a, b in zip(got.hierarchy, chunk.hierarchy):
        np.testing.assert_allclose(a, b, rtol=1e-5)
    # independent struct-based oracle agrees on the input block
    dims, locs, sdfs = _oracle_parse_sdfs(p, chunk.voxelsize)
    assert dims == chunk.dims
    np.testing.assert_array_equal(locs, chunk.input_locs)
    np.testing.assert_allclose(sdfs, chunk.input_sdf, rtol=1e-5)


def test_scene_roundtrip(tmp_path, rng):
    dims = (8, 8, 8)
    n = 12
    locs = np.stack(
        [rng.randint(0, d, n) for d in dims], -1
    ).astype(np.int32)
    vol = F.SceneVolume(
        locs, rng.randn(n).astype(np.float32), dims, 0.02,
        np.eye(4, dtype=np.float32),
    )
    p = str(tmp_path / "scene.sdf")
    F.save_scene(p, vol)
    got = F.load_scene(p)
    assert got.dims == dims
    np.testing.assert_array_equal(got.locs, vol.locs)
    np.testing.assert_allclose(got.sdf, vol.sdf, rtol=1e-5)

    kp = str(tmp_path / "scene.knw")
    known = (rng.rand(*dims) * 255).astype(np.uint8)
    F.save_known(kp, dims, 0.02, np.eye(4, dtype=np.float32), known)
    np.testing.assert_array_equal(F.load_scene_known(kp), known)


def test_get_train_files(tmp_path):
    fl = tmp_path / "list.txt"
    fl.write_text("sceneA_room0\nsceneB_room1\n")
    files, _ = F.get_train_files("/data", str(fl))
    assert files == ["/data/sceneA_room0__0__.sdf", "/data/sceneB_room1__0__.sdf"]
    fl2 = tmp_path / "list2.txt"
    fl2.write_text("a.sdfs\nb.sdfs\n")
    files, val = F.get_train_files("/d", str(fl2), str(fl2))
    assert files == ["/d/a.sdfs", "/d/b.sdfs"] and val == files


@pytest.fixture
def chunk_dir(tmp_path, rng):
    for i in range(5):
        F.save_train_file(str(tmp_path / f"c{i}.sdfs"), _make_chunk(rng))
    return tmp_path


def test_dataset_and_collate(chunk_dir):
    files = sorted(str(p) for p in chunk_dir.glob("*.sdfs"))
    ds = DS.SceneDataset(files, truncation=3.0, num_hierarchy_levels=4)
    assert len(ds) == 5
    s = ds[0]
    assert (np.abs(s["input_sdf"]) < 3.0).all()
    assert len(s["hierarchy"]) == 3

    loader = DS.BatchLoader(
        ds, batch_size=2, input_capacity=256, shuffle=True, seed=1
    )
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    b = batches[0]
    assert b["input_locs"].shape == (256, 4)
    assert b["input_sdf"].shape == (256, 1)
    n = int(b["input_num_valid"])
    assert (b["input_locs"][n:] == -1).all()
    assert (b["input_locs"][:n, 3] <= 1).all()
    assert b["sdf"].shape == (2, 16, 8, 8)
    assert b["known"].dtype == np.uint8
    assert len(b["hierarchy"]) == 3
    assert b["hierarchy"][0].shape == (2, 2, 1, 1)
    assert b["input_overflow"] == 0


def test_dataset_hierarchy_truncation(chunk_dir):
    files = sorted(str(p) for p in chunk_dir.glob("*.sdfs"))
    ds = DS.SceneDataset(files, truncation=3.0, num_hierarchy_levels=3)
    s = ds[0]
    assert len(s["hierarchy"]) == 2
    # keeps the FINER two levels (scene_dataloader.py:99-100)
    assert s["hierarchy"][0].shape == (4, 2, 2)
    assert s["hierarchy"][1].shape == (8, 4, 4)


def test_scene_mode_padding(tmp_path, rng):
    dims = (40, 33, 50)  # not multiples of 32
    n = 200
    locs = np.stack([rng.randint(0, d, n) for d in dims], -1).astype(np.int32)
    sdf = rng.randn(n).astype(np.float32)
    vol = F.SceneVolume(locs, sdf, dims, 0.02, np.eye(4, dtype=np.float32))
    inp_dir = tmp_path / "input"
    tgt_dir = tmp_path / "target"
    inp_dir.mkdir()
    tgt_dir.mkdir()
    F.save_scene(str(inp_dir / "s.sdf"), vol)
    F.save_scene(str(tgt_dir / "s.sdf"), vol)
    F.save_known(
        str(tgt_dir / "s.knw"), dims, 0.02, np.eye(4, dtype=np.float32),
        (rng.rand(*dims) * 3).astype(np.uint8),
    )
    ds = DS.SceneDataset(
        [str(inp_dir / "s.sdf")], truncation=3.0, num_hierarchy_levels=4,
        max_input_height=32, target_path=str(tgt_dir),
    )
    s = ds[0]
    assert s["sdf"].shape == (32, 64, 64)  # cropped to 32, padded to x32
    assert s["known"].shape == (32, 64, 64)
    assert (s["known"][:, 33:, :] == 255).all()  # padding marked unknown
    assert (s["input_locs"][:, 0] < 32).all()
    np.testing.assert_array_equal(s["orig_dims"], dims)

    # per-axis dim_round: tight z round, coarse lateral rounds (the
    # serving bucket strategy — see tools/compile_budget.py)
    ds2 = DS.SceneDataset(
        [str(inp_dir / "s.sdf")], truncation=3.0, num_hierarchy_levels=4,
        max_input_height=32, target_path=str(tgt_dir),
        dim_round=(32, 64, 128),
    )
    s2 = ds2[0]
    assert s2["sdf"].shape == (32, 64, 128)
    assert (s2["known"][:, 33:, :] == 255).all()
    np.testing.assert_array_equal(s2["orig_dims"], dims)
    # content identical inside the original extent
    np.testing.assert_array_equal(
        s2["sdf"][:32, :33, :50], s["sdf"][:32, :33, :50]
    )

    # non-multiple-of-32 rounds are rejected
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        DS.SceneDataset(
            [str(inp_dir / "s.sdf")], truncation=3.0,
            num_hierarchy_levels=4, target_path=str(tgt_dir),
            dim_round=(32, 48, 64),
        )


def test_batchloader_multiworker_order_and_transform(chunk_dir):
    """Worker-pool loader preserves batch order deterministically and runs
    the transform hook inside the workers (the trainer moves device
    re-collation there, off the step path)."""
    files = sorted(str(p) for p in chunk_dir.glob("*.sdfs"))
    ds = DS.SceneDataset(files, truncation=3.0, num_hierarchy_levels=4)
    ref = [
        b["names"]
        for b in DS.BatchLoader(
            ds, 1, 256, shuffle=True, seed=7, num_workers=1, drop_last=False
        )
    ]
    import threading

    seen_threads = set()

    def tf(b):
        seen_threads.add(threading.get_ident())
        b["tagged"] = True
        return b

    got = list(
        DS.BatchLoader(
            ds, 1, 256, shuffle=True, seed=7, num_workers=4,
            drop_last=False, prefetch=2, transform=tf,
        )
    )
    assert [b["names"] for b in got] == ref
    assert all(b["tagged"] for b in got)
    assert threading.get_ident() not in seen_threads


def test_batchloader_worker_error_propagates(chunk_dir):
    files = sorted(str(p) for p in chunk_dir.glob("*.sdfs"))
    ds = DS.SceneDataset(files, truncation=3.0, num_hierarchy_levels=4)

    def boom(b):
        raise RuntimeError("worker failed")

    loader = DS.BatchLoader(ds, 1, 256, num_workers=3, transform=boom)
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader)


def test_capacity_autotune(chunk_dir):
    """Autotuned occupancy fractions reflect target-occupancy statistics
    and produce capacities that hold the sampled data (VERDICT item 9)."""
    from sgnn_tpu.data import capacity as CAP
    from sgnn_tpu.data import formats as F

    files = sorted(str(p) for p in chunk_dir.glob("*.sdfs"))
    fractions, input_fr = CAP.estimate_occupancy_fractions(
        files, num_hierarchy_levels=4, truncation=3.0, sample=8,
        quantile=1.0, margin=1.5,
    )
    assert len(fractions) == 4
    assert all(0.0 < f <= 1.0 for f in fractions)
    assert 0.0 < input_fr <= 1.0
    # capacities from these fractions hold every sampled chunk's targets
    for f in files:
        c = F.load_train_file(f)
        occ, fin = CAP.chunk_level_occupancy(c, 4, 3.0)
        for h in range(4):
            assert occ[h] <= fractions[h] + 1e-9

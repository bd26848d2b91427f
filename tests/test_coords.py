"""Unit tests for the coordinate-list primitives."""

import numpy as np
import jax.numpy as jnp

from sgnn_tpu.ops import coords as C


SP = (4, 5, 6)
B = 2


def _rand_locs(rng, n, cap):
    """n unique random locs padded to cap with -1."""
    total = B * SP[0] * SP[1] * SP[2]
    flat = rng.choice(total, size=n, replace=False)
    b, rem = flat // (SP[0] * SP[1] * SP[2]), flat % (SP[0] * SP[1] * SP[2])
    z, rem = rem // (SP[1] * SP[2]), rem % (SP[1] * SP[2])
    y, x = rem // SP[2], rem % SP[2]
    locs = np.stack([z, y, x, b], -1).astype(np.int32)
    pad = np.full((cap - n, 4), -1, np.int32)
    return np.concatenate([locs, pad], 0)


def test_flat_key_roundtrip(rng):
    locs = _rand_locs(rng, 20, 32)
    keys = np.asarray(C.flat_key(jnp.asarray(locs), SP, B))
    # valid rows: key reconstructs coords
    for i in range(20):
        z, y, x, b = locs[i]
        expect = ((b * SP[0] + z) * SP[1] + y) * SP[2] + x
        assert keys[i] == expect
    assert (keys[20:] == -1).all()


def test_flat_key_out_of_bounds():
    locs = jnp.asarray(
        [
            [0, 0, 0, 0],
            [SP[0], 0, 0, 0],   # z OOB
            [0, SP[1], 0, 0],   # y OOB
            [0, 0, SP[2], 0],   # x OOB
            [0, 0, 0, B],       # batch OOB
            [-1, 0, 0, 0],      # negative
            [SP[0] - 1, SP[1] - 1, SP[2] - 1, B - 1],
        ],
        dtype=jnp.int32,
    )
    keys = np.asarray(C.flat_key(locs, SP, B))
    assert keys[0] == 0
    assert (keys[1:6] == -1).all()
    assert keys[6] == B * SP[0] * SP[1] * SP[2] - 1


def test_index_grid_and_lookup(rng):
    cap = 40
    n = 25
    locs = _rand_locs(rng, n, cap)
    grid = C.build_index_grid(jnp.asarray(locs), jnp.int32(n), SP, B)
    keys = C.flat_key(jnp.asarray(locs), SP, B)
    rows = np.asarray(C.lookup(keys, grid))
    assert (rows[:n] == np.arange(1, n + 1)).all()
    assert (rows[n:] == 0).all()
    # a key not in the set maps to 0
    total = B * SP[0] * SP[1] * SP[2]
    present = set(np.asarray(keys[:n]).tolist())
    absent = [k for k in range(total) if k not in present][:5]
    got = np.asarray(C.lookup(jnp.asarray(absent, jnp.int32), grid))
    assert (got == 0).all()


def test_compact_basic():
    keep = jnp.asarray([True, False, True, True, False, False])
    locs = jnp.arange(24, dtype=jnp.int32).reshape(6, 4)
    feats = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    (olocs, ofeats), num, overflow = C.compact(keep, (locs, feats), 4)
    assert int(num) == 3 and int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(olocs[:3]), np.asarray(locs)[[0, 2, 3]])
    np.testing.assert_array_equal(np.asarray(ofeats[:3]), np.asarray(feats)[[0, 2, 3]])
    assert (np.asarray(olocs[3:]) == -1).all()
    assert (np.asarray(ofeats[3:]) == 0).all()


def test_compact_overflow():
    keep = jnp.ones(6, bool)
    locs = jnp.arange(24, dtype=jnp.int32).reshape(6, 4)
    (olocs,), num, overflow = C.compact(keep, (locs,), 4)
    assert int(num) == 4 and int(overflow) == 2
    np.testing.assert_array_equal(np.asarray(olocs), np.asarray(locs)[:4])


def test_compact_respects_num_valid():
    keep = jnp.ones(6, bool)
    locs = jnp.arange(24, dtype=jnp.int32).reshape(6, 4)
    (olocs,), num, _ = C.compact(keep, (locs,), 6, num_valid=jnp.int32(2))
    assert int(num) == 2
    assert (np.asarray(olocs[2:]) == -1).all()


def test_unique_locs(rng):
    cap = 64
    base = _rand_locs(rng, 10, 10)
    # duplicate each 3x, shuffle
    dup = np.concatenate([base, base, base], 0)
    rng.shuffle(dup)
    locs = np.concatenate([dup, np.full((cap - 30, 4), -1, np.int32)], 0)
    out, num, overflow = C.unique_locs(jnp.asarray(locs), jnp.int32(30), SP, B, 16)
    assert int(num) == 10 and int(overflow) == 0
    got = set(map(tuple, np.asarray(out[:10]).tolist()))
    expect = set(map(tuple, base.tolist()))
    assert got == expect
    assert (np.asarray(out[10:]) == -1).all()
    # output is key-sorted
    keys = np.asarray(C.flat_key(out[:10], SP, B))
    assert (np.diff(keys) > 0).all()


def test_upsample_locs_x2():
    locs = jnp.asarray([[1, 2, 3, 0], [-1, -1, -1, -1]], jnp.int32)
    feats = jnp.asarray([[5.0], [0.0]])
    nl, nf = C.upsample_locs_x2(locs, feats)
    assert nl.shape == (16, 4) and nf.shape == (16, 1)
    got = set(map(tuple, np.asarray(nl[:8]).tolist()))
    expect = {(2 + dz, 4 + dy, 6 + dx, 0) for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)}
    assert got == expect
    assert (np.asarray(nf[:8]) == 5.0).all()
    # children of padding rows remain invalid
    assert (np.asarray(nl[8:, :3]) < 0).all()


def test_parent_locs():
    locs = jnp.asarray([[4, 5, 7, 1], [0, 0, 1, 0], [-1, -1, -1, -1]], jnp.int32)
    p = np.asarray(C.parent_locs(locs))
    np.testing.assert_array_equal(p[0], [2, 2, 3, 1])
    np.testing.assert_array_equal(p[1], [0, 0, 0, 0])
    assert (p[2] == -1).all()


def test_neighbor_offsets_order():
    offs3 = np.asarray(C.neighbor_offsets(3))
    assert offs3.shape == (27, 3)
    np.testing.assert_array_equal(offs3[0], [-1, -1, -1])
    np.testing.assert_array_equal(offs3[1], [-1, -1, 0])  # x fastest
    np.testing.assert_array_equal(offs3[13], [0, 0, 0])
    offs2 = np.asarray(C.neighbor_offsets(2))
    assert offs2.shape == (8, 3)
    np.testing.assert_array_equal(offs2[0], [0, 0, 0])
    np.testing.assert_array_equal(offs2[-1], [1, 1, 1])

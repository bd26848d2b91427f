"""Coordinate-list primitives for static-shape sparse voxel compute on TPU.

Everything here is designed around XLA's static-shape compilation model:
sparse voxel sets are stored as fixed-capacity coordinate lists
``locs[int32 cap, 4]`` in ``(z, y, x, b)`` order (matching the reference's
zyx/batch-last convention, /root/reference/torch/scene_dataloader.py:17,30)
with the first ``num_valid`` rows valid and every padding row filled with
``INVALID_COORD`` (-1).

The central trick that replaces SparseConvNet's CPU hash maps + CUDA
rulebooks (/root/reference/torch/model.py:7) is the *dense index grid*: an
int32 array of shape ``[B*Z*Y*X]`` storing ``row_index + 1`` at active sites
and 0 elsewhere. Neighbor lookup then becomes a vectorized gather — the
form of "hash table" a TPU is actually fast at. SG-NN volumes are at most a
few hundred voxels per side, so the grid is tens of MB of HBM, far cheaper
than a sort-based lookup per convolution.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

INVALID_COORD = -1
# Key value that sorts after every valid key (int32 max).
_KEY_SENTINEL = np.iinfo(np.int32).max


def oob_key(keys: jax.Array) -> jax.Array:
    """Remap invalid (-1) keys to an index that is ALWAYS out of bounds.

    JAX's ``.at[]`` wraps negative indices NumPy-style (-1 = last element),
    so scatter mode='drop' / gather mode='fill' do NOT treat -1 as OOB.
    int32 max is out of bounds for any real array, so fill/drop semantics
    apply. Every scatter/gather on flat keys must go through this.
    """
    return jnp.where(keys < 0, jnp.int32(_KEY_SENTINEL), keys)


def valid_mask(num_valid: jax.Array, capacity: int) -> jax.Array:
    """Boolean mask of shape [capacity]: True for rows < num_valid."""
    return jnp.arange(capacity, dtype=jnp.int32) < num_valid


def flat_key(
    locs: jax.Array, spatial_size: tuple[int, int, int], batch_size: int
) -> jax.Array:
    """Flatten (z,y,x,b) coords to unique int32 keys; -1 for invalid/OOB rows.

    Key layout is ``b*Z*Y*X + z*Y*X + y*X + x`` so that a key doubles as an
    index into a flattened dense [B, Z, Y, X] grid.
    """
    Z, Y, X = spatial_size
    assert batch_size * Z * Y * X < np.iinfo(np.int32).max, (
        "flat key would overflow int32; shard the volume first"
    )
    z, y, x, b = locs[:, 0], locs[:, 1], locs[:, 2], locs[:, 3]
    inb = (
        (z >= 0) & (z < Z)
        & (y >= 0) & (y < Y)
        & (x >= 0) & (x < X)
        & (b >= 0) & (b < batch_size)
    )
    key = ((b * Z + z) * Y + y) * X + x
    return jnp.where(inb, key, jnp.int32(-1)).astype(jnp.int32)


def flat_key_nd(
    locs: jax.Array, spatial_size: tuple[int, int, int], batch_size: int
) -> jax.Array:
    """Like :func:`flat_key` but for arbitrary leading dims: locs [..., 4]."""
    shp = locs.shape[:-1]
    return flat_key(locs.reshape(-1, 4), spatial_size, batch_size).reshape(shp)


def build_index_grid(
    locs: jax.Array,
    num_valid: jax.Array,
    spatial_size: tuple[int, int, int],
    batch_size: int,
) -> jax.Array:
    """Scatter row indices into a dense grid: grid[key] = row + 1, 0 = empty.

    Invalid/padding rows produce key -1 and are dropped by the scatter.
    Returns an int32 array of shape [B*Z*Y*X].
    """
    Z, Y, X = spatial_size
    cap = locs.shape[0]
    keys = flat_key(locs, spatial_size, batch_size)
    keys = jnp.where(valid_mask(num_valid, cap), keys, jnp.int32(-1))
    rows = jnp.arange(1, cap + 1, dtype=jnp.int32)
    grid = jnp.zeros((batch_size * Z * Y * X,), dtype=jnp.int32)
    return grid.at[oob_key(keys)].set(rows, mode="drop")


def lookup(keys: jax.Array, index_grid: jax.Array) -> jax.Array:
    """Gather row+1 indices for flat keys; 0 for missing/invalid keys."""
    return index_grid.at[oob_key(keys)].get(mode="fill", fill_value=0)


def compact(
    keep: jax.Array,
    arrays: tuple[jax.Array, ...],
    out_capacity: int,
    num_valid: jax.Array | None = None,
) -> tuple[tuple[jax.Array, ...], jax.Array, jax.Array]:
    """Compact rows where ``keep`` is True to the front of fixed-size outputs.

    This is the static-shape replacement for the reference's boolean-mask
    pruning (``locs = locs_unfilt[mask]``, /root/reference/torch/model.py:238).

    Args:
        keep: bool [cap]. Rows at/after ``num_valid`` are ignored.
        arrays: per-row arrays [cap, ...] to compact together. Integer arrays
            are padded with INVALID_COORD, floats with 0.
        out_capacity: static output row count. Rows beyond it are dropped
            deterministically (lowest original index wins).
        num_valid: current valid-row count (optional extra mask).

    Returns:
        (compacted arrays, new num_valid (<= out_capacity), overflow count).
    """
    cap = keep.shape[0]
    if num_valid is not None:
        keep = keep & valid_mask(num_valid, cap)
    positions = jnp.cumsum(keep.astype(jnp.int32)) - 1
    total = jnp.where(keep.shape[0] > 0, positions[-1] + 1, 0).astype(jnp.int32)
    # Rows that land past out_capacity overflow and are dropped.
    dst = jnp.where(
        keep & (positions < out_capacity), positions, jnp.int32(_KEY_SENTINEL)
    )
    outs = []
    for a in arrays:
        if jnp.issubdtype(a.dtype, jnp.integer):
            fill = jnp.full((out_capacity,) + a.shape[1:], INVALID_COORD, a.dtype)
        else:
            fill = jnp.zeros((out_capacity,) + a.shape[1:], a.dtype)
        outs.append(fill.at[dst].set(a, mode="drop"))
    new_num = jnp.minimum(total, out_capacity)
    overflow = jnp.maximum(total - out_capacity, 0)
    return tuple(outs), new_num, overflow


def unique_locs(
    locs: jax.Array,
    num_valid: jax.Array,
    spatial_size: tuple[int, int, int],
    batch_size: int,
    out_capacity: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Deduplicate coordinates (sort-based), keeping key-sorted order.

    Replaces SparseConvNet's hash-based coordinate dedup for strided
    convolution outputs. Returns (locs [out_capacity,4], num_out, overflow).
    """
    cap = locs.shape[0]
    keys = flat_key(locs, spatial_size, batch_size)
    keys = jnp.where(valid_mask(num_valid, cap), keys, _KEY_SENTINEL)
    keys = jnp.where(keys < 0, _KEY_SENTINEL, keys)
    order = jnp.argsort(keys)
    sk = keys[order]
    sorted_locs = locs[order]
    prev = jnp.concatenate([jnp.full((1,), -2, sk.dtype), sk[:-1]])
    first = (sk != prev) & (sk != _KEY_SENTINEL)
    (out_locs,), num_out, overflow = compact(first, (sorted_locs,), out_capacity)
    return out_locs, num_out, overflow


def upsample_locs_x2(locs: jax.Array, feats: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Emit the 8 children of every voxel (generative 2x upsample).

    Mirrors ``Refinement.to_next_level_locs`` (/root/reference/torch/
    model.py:192-207): child coords = 2*parent + offset, offsets in C order
    over {0,1}^3; features are copied (nearest neighbor) to all 8 children.
    Padding rows (-1) stay invalid: 2*(-1)+offset < 0 for all offsets except
    (1,1,1) -> 2*(-1)+1 = -1, still invalid. Output capacity = 8*cap.
    """
    cap = locs.shape[0]
    offsets = jnp.array(
        [[dz, dy, dx] for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
        dtype=locs.dtype,
    )  # [8, 3]
    zyx = locs[:, None, :3] * 2 + offsets[None, :, :]  # [cap, 8, 3]
    b = jnp.broadcast_to(locs[:, None, 3:4], (cap, 8, 1))
    new_locs = jnp.concatenate([zyx, b], axis=-1).reshape(cap * 8, 4)
    new_feats = jnp.broadcast_to(
        feats[:, None, :], (cap, 8, feats.shape[-1])
    ).reshape(cap * 8, feats.shape[-1])
    return new_locs, new_feats


def parent_locs(locs: jax.Array) -> jax.Array:
    """Coarse-level (stride-2) parent coordinates; padding rows stay invalid.

    floor-div of INVALID_COORD (-1) by 2 is -1 in int arithmetic, so padding
    is preserved.
    """
    zyx = jnp.where(locs[:, :3] >= 0, locs[:, :3] // 2, jnp.int32(INVALID_COORD))
    return jnp.concatenate([zyx, locs[:, 3:4]], axis=-1)


def neighbor_offsets(filter_size: int, dtype=jnp.int32) -> jax.Array:
    """Kernel tap offsets in C order (z slowest, x fastest).

    For odd sizes the offsets are centered (e.g. size 3 -> {-1,0,1}^3); for
    even sizes they start at 0 (e.g. size 2 -> {0,1}^3), matching
    SparseConvNet's strided-convolution child enumeration.
    """
    if filter_size % 2 == 1:
        r = range(-(filter_size // 2), filter_size // 2 + 1)
    else:
        r = range(filter_size)
    offs = np.array(
        [[dz, dy, dx] for dz in r for dy in r for dx in r], dtype=np.int32
    )
    return jnp.asarray(offs, dtype=dtype)

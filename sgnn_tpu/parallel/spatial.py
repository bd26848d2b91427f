"""Spatial sharding for scenes too large for one chip's HBM.

SG-NN's scaling axis is spatial, not sequence (SURVEY.md §5): the TPU
analog of ring/Ulysses sequence parallelism is sharding the dense voxel
grid across devices along one spatial axis, with convolution halos
exchanged over ICI (`jax.lax.ppermute`) — boundary planes travel to the
neighboring device, interior compute overlaps nothing.

These primitives operate on the dense execution backend's channels-last
grids [B, Z, Y, X, C], sharded on Z. `halo_exchange` + `sharded_conv3d`
compose under shard_map; `test_spatial.py` verifies equality with the
unsharded op on the virtual 8-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sgnn_tpu.ops import dense as D


def halo_exchange(
    x: jax.Array, halo: int, axis_name: str, *, axis: int = 1
) -> jax.Array:
    """Append neighbors' boundary slabs along sharded dim ``axis``:
    [..., Zl, ...] -> [..., Zl + 2*halo, ...]. Edge devices get zeros."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # slab we send DOWN (to idx+1): our top; slab we send UP: our bottom
    top = jax.lax.slice_in_dim(x, x.shape[axis] - halo, x.shape[axis], axis=axis)
    bot = jax.lax.slice_in_dim(x, 0, halo, axis=axis)
    from_prev = jax.lax.ppermute(
        top, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_next = jax.lax.ppermute(
        bot, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    # zero the wrapped halos at the global boundary
    zero = jnp.zeros((), x.dtype)
    from_prev = jnp.where(idx == 0, zero, from_prev)
    from_next = jnp.where(idx == n - 1, zero, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=axis)


def sharded_conv3d(
    x: jax.Array,  # [B, Zl, Y, X, Cin] local z-slab
    weight: jax.Array,  # torch layout [Cout, Cin, k, k, k]
    axis_name: str,
    *,
    stride: int = 1,
    padding: int = 1,
) -> jax.Array:
    """3D conv over a z-sharded grid, zero-padded at global boundaries.

    Supports the model's conv shapes: k=3 s=1 p=1 (submanifold-equivalent)
    and k=2 s=2 p=0 with even local Z (strided downsample).
    """
    k = weight.shape[2]
    if stride == 1:
        halo = padding
        xh = halo_exchange(x, halo, axis_name) if halo else x
        # z already padded by halos; pad only y/x inside conv
        w = jnp.transpose(weight, (2, 3, 4, 1, 0)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            xh, w, window_strides=(1, 1, 1),
            padding=[(0, 0), (padding, padding), (padding, padding)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    # strided downsample: window k==stride==2, local Z even -> no halo needed
    assert k == stride == 2 and padding == 0
    assert x.shape[1] % 2 == 0, "local Z must be even for stride-2 conv"
    return D.conv3d(x, weight, stride=2, padding=0)


def sharded_max_pool2(x: jax.Array) -> jax.Array:
    """Stride-2 max pool on a z-sharded grid (even local Z)."""
    assert x.shape[1] % 2 == 0
    return D.max_pool3d(x)

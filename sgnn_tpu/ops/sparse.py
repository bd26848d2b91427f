"""SparseTensor: the framework's core data structure.

A fixed-capacity coordinate-list sparse voxel tensor, registered as a JAX
pytree so it flows through jit/grad/shard_map. Corresponds to the
(locs, feats) pairs the reference threads through SparseConvNet
(/root/reference/torch/model.py:371-416), but with static shapes:

    locs      int32 [capacity, 4]  (z, y, x, batch); padding rows = -1
    feats     float [capacity, C]  padding rows = 0
    num_valid int32 []             rows [0, num_valid) are valid

``spatial_size`` (Z, Y, X) and ``batch_size`` are static metadata (part of
the pytree treedef), so a jitted function specializes on them — equivalent
to the reference's per-scene ``update_sizes`` (/root/reference/torch/
model.py:357-369) but handled by XLA shape specialization + host-side
bucketing instead of mutating layer state.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from sgnn_tpu.ops import coords as C


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("locs", "feats", "num_valid"),
    meta_fields=("spatial_size", "batch_size"),
)
@dataclasses.dataclass(frozen=True)
class SparseTensor:
    locs: jax.Array
    feats: jax.Array
    num_valid: jax.Array
    spatial_size: tuple[int, int, int]
    batch_size: int

    @property
    def capacity(self) -> int:
        return self.locs.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    def valid(self) -> jax.Array:
        return C.valid_mask(self.num_valid, self.capacity)

    def with_feats(self, feats: jax.Array) -> "SparseTensor":
        assert feats.shape[0] == self.capacity
        return dataclasses.replace(self, feats=feats)

    def with_spatial_size(self, spatial_size) -> "SparseTensor":
        return dataclasses.replace(self, spatial_size=tuple(int(s) for s in spatial_size))

    def masked_feats(self) -> jax.Array:
        """Features with padding rows forced to zero."""
        return jnp.where(self.valid()[:, None], self.feats, 0)

    def index_grid(self) -> jax.Array:
        """Dense [B*Z*Y*X] int32 grid of row+1 (0 = empty). See coords.py."""
        return C.build_index_grid(
            self.locs, self.num_valid, self.spatial_size, self.batch_size
        )


def make_sparse(
    locs: jax.Array,
    feats: jax.Array,
    num_valid: jax.Array | int,
    spatial_size,
    batch_size: int,
) -> SparseTensor:
    """Construct a SparseTensor, normalizing dtypes and padding rows."""
    locs = jnp.asarray(locs, jnp.int32)
    feats = jnp.asarray(feats)
    if feats.ndim == 1:
        feats = feats[:, None]
    num_valid = jnp.asarray(num_valid, jnp.int32)
    cap = locs.shape[0]
    mask = C.valid_mask(num_valid, cap)
    locs = jnp.where(mask[:, None], locs, jnp.int32(C.INVALID_COORD))
    feats = jnp.where(mask[:, None], feats, 0)
    return SparseTensor(
        locs=locs,
        feats=feats,
        num_valid=num_valid,
        spatial_size=tuple(int(s) for s in spatial_size),
        batch_size=int(batch_size),
    )


def sparse_to_dense(st: SparseTensor, default_val: float = 0.0) -> jax.Array:
    """Scatter features into a dense [B, Z, Y, X, C] grid.

    TPU-native analog of ``scn.SparseToDense`` (/root/reference/torch/
    model.py:47) and ``data_util.sparse_to_dense_np`` (/root/reference/
    torch/data_util.py:43-53).
    """
    Z, Y, X = st.spatial_size
    B, Cn = st.batch_size, st.num_channels
    keys = C.flat_key(st.locs, st.spatial_size, st.batch_size)
    keys = jnp.where(st.valid(), keys, jnp.int32(-1))
    flat = jnp.full((B * Z * Y * X, Cn), default_val, st.feats.dtype)
    flat = flat.at[C.oob_key(keys)].set(st.feats, mode="drop")
    return flat.reshape(B, Z, Y, X, Cn)


def gather_dense(
    dense: jax.Array, locs: jax.Array, fill_value: float = 0.0
) -> jax.Array:
    """Gather per-voxel values from a dense [B, Z, Y, X, C] grid at locs.

    Invalid locs (padding) read ``fill_value``. This is the flat-index
    gather pattern the reference loss uses (/root/reference/torch/loss.py:64-65).
    """
    B, Z, Y, X = dense.shape[:4]
    keys = C.flat_key(locs, (Z, Y, X), B)
    flat = dense.reshape(B * Z * Y * X, *dense.shape[4:])
    return flat.at[C.oob_key(keys)].get(mode="fill", fill_value=fill_value)


def dense_to_sparse(
    dense: jax.Array,
    keep: jax.Array,
    capacity: int,
) -> SparseTensor:
    """Extract active sites of a dense [B, Z, Y, X, C] grid into a SparseTensor.

    Args:
        dense: [B, Z, Y, X, C] features.
        keep: [B, Z, Y, X] bool mask of sites to keep.
        capacity: static output capacity (overflow rows dropped, lowest flat
            index first).
    """
    B, Z, Y, X, Cn = dense.shape
    n = B * Z * Y * X
    flat_feats = dense.reshape(n, Cn)
    flat_keep = keep.reshape(n)
    # Decode flat index -> (z,y,x,b) without materializing [n,4] ints twice.
    idx = jnp.arange(n, dtype=jnp.int32)
    b, rem = idx // (Z * Y * X), idx % (Z * Y * X)
    z, rem = rem // (Y * X), rem % (Y * X)
    y, x = rem // X, rem % X
    locs = jnp.stack([z, y, x, b], axis=-1)
    (out_locs, out_feats), num, _ = C.compact(
        flat_keep, (locs, flat_feats), capacity
    )
    return SparseTensor(
        locs=out_locs,
        feats=out_feats,
        num_valid=num,
        spatial_size=(Z, Y, X),
        batch_size=B,
    )

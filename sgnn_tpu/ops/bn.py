"""Batch normalization over sparse (masked row) and dense tensors.

TPU-native equivalent of ``scn.BatchNormReLU`` (/root/reference/torch/
model.py:37,42,45,181) and ``nn.BatchNorm3d`` (/root/reference/torch/
model.py:91). Sparse BN normalizes over valid rows of the [cap, C] feature
matrix; dense BN over (B, Z, Y, X) of a channels-last grid. Both share one
masked-moments core.

Functional style: parameters (scale/bias) live in the params pytree,
running statistics in a separate mutable ``stats`` pytree threaded through
the train step. Under data parallelism the batch moments are synchronized
with ``psum`` over the mesh axis (``axis_name``) — the reference is
single-GPU and has no equivalent.

Defaults follow the originals: eps 1e-4 for sparse BN (SparseConvNet's
default), 1e-5 for dense BN (PyTorch's); running stats use a 0.9 retain
factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SPARSE_BN_EPS = 1e-4
DENSE_BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # retain factor: new_running = m*old + (1-m)*batch


def init_bn(num_channels: int) -> tuple[dict, dict]:
    """Returns (params, stats) for one BN layer."""
    params = {
        "scale": jnp.ones((num_channels,), jnp.float32),
        "bias": jnp.zeros((num_channels,), jnp.float32),
    }
    stats = {
        "mean": jnp.zeros((num_channels,), jnp.float32),
        "var": jnp.ones((num_channels,), jnp.float32),
    }
    return params, stats


def masked_moments(
    x: jax.Array, mask: jax.Array | None, axis_name: str | None
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(mean, biased var, count) over rows of x [N, C] where mask is True."""
    xf = x.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)[:, None]
        count = jnp.sum(m)
        s = jnp.sum(xf * m, axis=0)
        sq = jnp.sum(xf * xf * m, axis=0)
    else:
        count = jnp.asarray(x.shape[0], jnp.float32)
        s = jnp.sum(xf, axis=0)
        sq = jnp.sum(xf * xf, axis=0)
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
        s = jax.lax.psum(s, axis_name)
        sq = jax.lax.psum(sq, axis_name)
    count = jnp.maximum(count, 1.0)
    mean = s / count
    var = jnp.maximum(sq / count - mean * mean, 0.0)
    return mean, var, count


def batch_norm(
    params: dict,
    stats: dict,
    x: jax.Array,
    mask: jax.Array | None = None,
    *,
    training: bool,
    eps: float = SPARSE_BN_EPS,
    momentum: float = BN_MOMENTUM,
    relu: bool = False,
    axis_name: str | None = None,
) -> tuple[jax.Array, dict]:
    """Apply BN (optionally fused ReLU) to rows of x [N, C].

    Returns (y, new_stats). In eval mode stats pass through unchanged.
    """
    if training:
        mean, var, count = masked_moments(x, mask, axis_name)
        # Unbiased variance for the running estimate (PyTorch convention).
        unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
        new_stats = {
            "mean": momentum * stats["mean"] + (1.0 - momentum) * mean,
            "var": momentum * stats["var"] + (1.0 - momentum) * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (x - mean) * inv + params["bias"]
    if relu:
        y = jnp.maximum(y, 0)
    y = y.astype(x.dtype)
    if mask is not None:
        y = jnp.where(mask[:, None], y, 0)
    return y, new_stats


def batch_norm_dense(
    params: dict,
    stats: dict,
    x: jax.Array,  # [B, Z, Y, X, C]
    *,
    training: bool,
    eps: float = DENSE_BN_EPS,
    momentum: float = BN_MOMENTUM,
    relu: bool = False,
    axis_name: str | None = None,
) -> tuple[jax.Array, dict]:
    """BN over a dense channels-last 3D grid (nn.BatchNorm3d equivalent)."""
    shp = x.shape
    y, new_stats = batch_norm(
        params,
        stats,
        x.reshape(-1, shp[-1]),
        None,
        training=training,
        eps=eps,
        momentum=momentum,
        relu=relu,
        axis_name=axis_name,
    )
    return y.reshape(shp), new_stats

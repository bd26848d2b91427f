"""Pallas TPU kernel: lane-folded 3^3 convolution for narrow channels.

XLA runs SG-NN's narrow convs (C=16) at ~2.4% MXU utilization with heavy
layout copies (BENCH_NOTES.md); this kernel reaches full-lane MXU
occupancy by construction:

  * the input is space-to-depth folded along x: [B, Z, Y, X/8, 128] where
    lane l = xi*C + c packs 8 voxels x C=16 channels — a pure reshape, so
    every DMA is 128-lane aligned (Mosaic requires slices tiled (8, 128)
    in the minor two dims, with 8-aligned offsets).
  * the three x-tap shifts are precomputed AT XLA LEVEL as three folded
    HBM arrays (lane roll by +-C with cross-block carries — cheap fused
    elementwise work), so the kernel never slices unaligned minor dims:
    per tap it takes leading-(z,y)-dim slices of an aligned tile, a
    layout-trivial reshape, and one GEMM.
  * each of the 27 taps is one [R, 128] x [128, 128] GEMM with a
    BLOCK-DIAGONAL weight (8 copies of the [16,16] tap matrix). The zero
    blocks cost nothing: a narrow N=16 GEMM would idle the same 112
    lanes, so this runs at the full-MXU rate.

Constraints: C == 16, X % 64 == 0 (folded block count 8-aligned),
C_out <= 16. Callers fall back to the XLA conv otherwise.

STATUS: see BENCH_NOTES.md for measured numbers vs the XLA conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FOLD = 8
LANES = 128


def _kernel(xm_ref, x0_ref, xp_ref, w_ref, out_ref,
            tm_ref, t0_ref, tp_ref, sems, *, tz, ty, xq, acc_dtype):
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    copies = []
    for i, (src, dst) in enumerate(
        ((xm_ref, tm_ref), (x0_ref, t0_ref), (xp_ref, tp_ref))
    ):
        dma = pltpu.make_async_copy(
            src.at[b, pl.ds(iz * tz, tz + 2), pl.ds(iy * ty, ty + 2), :, :],
            dst,
            sems.at[i],
        )
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()

    rows = tz * ty * xq
    acc = jnp.zeros((rows, LANES), acc_dtype)
    tiles = {-1: tm_ref, 0: t0_ref, 1: tp_ref}
    for dz in range(3):
        for dy in range(3):
            for dx in (-1, 0, 1):
                lhs = tiles[dx][dz:dz + tz, dy:dy + ty].reshape(rows, LANES)
                # tap order must match coords.neighbor_offsets: x fastest
                tap = dz * 9 + dy * 3 + (dx + 1)
                acc = acc + jnp.dot(
                    lhs, w_ref[tap], preferred_element_type=acc_dtype
                )
    out_ref[0] = acc.reshape(tz, ty, xq, LANES).astype(out_ref.dtype)


def _block_diag_weights(weight27: jax.Array, dtype) -> jax.Array:
    """[27, Cin, Cout] -> [27, 128, 128] block-diagonal (8 voxel slots)."""
    K, cin, cout = weight27.shape
    w = jnp.zeros((K, LANES, LANES), jnp.float32)
    for i in range(FOLD):
        w = w.at[:, i * cin:(i + 1) * cin, i * cin:i * cin + cout].set(
            weight27
        )
    return w.astype(dtype)


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _x_shift_variants(xf: jax.Array, cin: int):
    """xf [B, Zp, Yp, xq, 128] -> (minus, base, plus) where plus[..., b, l]
    holds the value one ORIGINAL voxel to the right (lane +cin with a
    carry from block b+1), and minus one to the left. Pure XLA elementwise
    + pad/slice work, fused cheaply."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, LANES), 4)
    nxt = jnp.pad(xf[:, :, :, 1:], ((0, 0),) * 3 + ((0, 1), (0, 0)))
    prv = jnp.pad(xf[:, :, :, :-1], ((0, 0),) * 3 + ((1, 0), (0, 0)))
    plus = jnp.where(
        lane < LANES - cin,
        jnp.roll(xf, -cin, axis=4),
        jnp.roll(nxt, -cin, axis=4),
    )
    minus = jnp.where(
        lane >= cin,
        jnp.roll(xf, cin, axis=4),
        jnp.roll(prv, cin, axis=4),
    )
    return minus, xf, plus


def conv3d_3x3x3_folded(x: jax.Array, weight27: jax.Array) -> jax.Array:
    """conv3x3x3(x, w) with zero padding via the lane-folded kernel.

    x [B, Z, Y, X, C] channels-last, C == 16, X % 64 == 0;
    weight27 [27, Cin, Cout] with Cout <= Cin. Raises ValueError when the
    shape constraints don't hold (caller falls back to the XLA conv).
    """
    B, Z, Y, X, C = x.shape
    K, cin, cout = weight27.shape
    if C != 16 or cin != C or cout > cin or X % 64 or LANES // C != FOLD:
        raise ValueError(f"unsupported shapes x={x.shape} w={weight27.shape}")
    tz = max(t for t in (4, 3, 2, 1) if Z % t == 0)
    ty = max(t for t in (8, 6, 4, 2, 1) if Y % t == 0)
    xb = X // FOLD
    xq = _round_up(xb, 8)
    xf = x.reshape(B, Z, Y, xb, LANES)
    xf = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, xq - xb), (0, 0)))
    xm, x0, xp = _x_shift_variants(xf, C)
    w = _block_diag_weights(weight27, x.dtype)
    grid = (B, Z // tz, Y // ty)
    tile = pltpu.VMEM((tz + 2, ty + 2, xq, LANES), x.dtype)
    out = pl.pallas_call(
        functools.partial(
            _kernel, tz=tz, ty=ty, xq=xq, acc_dtype=jnp.float32
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tz, ty, xq, LANES),
            lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Z, Y, xq, LANES), x.dtype),
        scratch_shapes=[tile, tile, tile, pltpu.SemaphoreType.DMA((3,))],
    )(xm, x0, xp, w)
    y = out[:, :, :, :xb, :].reshape(B, Z, Y, X, C)
    return y[..., :cout]

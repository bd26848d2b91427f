"""Pallas TPU kernel: lane-folded 3^3 convolution for narrow channels.

XLA runs SG-NN's narrow convs (C=16) at ~2.4% MXU utilization with heavy
layout copies (BENCH_NOTES.md); this kernel reaches full-lane MXU
occupancy by construction:

  * the input is space-to-depth folded along x: [B, Z, Y, X/8, 128] where
    lane l = xi*C + c packs 8 voxels x C=16 channels — a pure reshape, so
    every DMA is 128-lane aligned (Mosaic requires slices tiled (8, 128)
    in the minor two dims).
  * each of the 27 taps is one [R, 128] x [128, 128] GEMM with a
    BLOCK-DIAGONAL weight (8 copies of the [16,16] tap matrix). The zero
    blocks cost nothing: a narrow N=16 GEMM would idle the same 112 lanes,
    so this runs at the full-MXU rate.
  * x-axis tap shifts are lane rolls by +-C with cross-block carries taken
    from block-shifted DMA slabs (prev/base/next), avoiding both sublane
    rolls and unaligned VMEM slices. bf16 rolls go through a bitcast int32
    view (Mosaic's rotate is 32-bit only).
  * z/y shifts are plain leading-dim slices of the halo'd slabs.

Constraints: C == 16, X % 64 == 0 (so the folded block count is 8-aligned),
C_out <= 16. The caller falls back to the XLA conv otherwise.

STATUS: lowers and runs CORRECTLY on v5e (bf16 rel err ~2.6e-3 vs the XLA
conv). Measured 17 ms vs XLA's 10.5 ms on the 96x192x192 C=16 benchmark
conv: the GEMMs are ~2.5 ms of that; Mosaic relayouts for the unaligned
block-shifted views and the per-tap slice+reshape dominate. Kept
experimental (not wired into dense_flow) as the foundation for round 2:
the remaining step is to assemble the 27 shifted operands via strided
copies into an aligned scratch (or double-buffered DMAs with 8-aligned
offsets) instead of relayout-heavy vector slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FOLD = 8
LANES = 128


def _kernel(xf_ref, w_ref, out_ref, tile_ref, sems, *,
            tz, ty, xq, cin, acc_dtype):
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    # one aligned slab DMA (full minor-2 dims); prev/base/next are
    # block-shifted in-VMEM views
    dma = pltpu.make_async_copy(
        xf_ref.at[b, pl.ds(iz * tz, tz + 2), pl.ds(iy * ty, ty + 2), :, :],
        tile_ref,
        sems,
    )
    dma.start()
    dma.wait()

    xbp = xq - 2
    rows = tz * ty * xbp
    full = tz + 2
    fully = ty + 2
    frows = full * fully * xbp
    dtype = tile_ref.dtype

    def lane_roll(a, shift):
        shift = shift % LANES
        if dtype == jnp.float32:
            return pltpu.roll(a, shift, 1)
        a32 = pltpu.bitcast(a, jnp.int32)
        return pltpu.bitcast(pltpu.roll(a32, shift, 1), dtype)

    # hoist the three x-shift variants to whole-tile precomputation (the
    # unaligned block slices + rolls are the expensive relayouts; doing
    # them once instead of per-(dz,dy) is ~9x less shift work)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (frows, LANES), 1)
    prev_t = tile_ref[:, :, 0:xbp].reshape(frows, LANES)
    base_t = tile_ref[:, :, 1:1 + xbp].reshape(frows, LANES)
    next_t = tile_ref[:, :, 2:2 + xbp].reshape(frows, LANES)
    s_minus = jnp.where(
        lane_f >= cin, lane_roll(base_t, cin), lane_roll(prev_t, cin)
    ).reshape(full, fully, xbp, LANES)
    s_plus = jnp.where(
        lane_f < LANES - cin, lane_roll(base_t, -cin),
        lane_roll(next_t, -cin),
    ).reshape(full, fully, xbp, LANES)
    base_4d = base_t.reshape(full, fully, xbp, LANES)
    variants = {-1: s_minus, 0: base_4d, 1: s_plus}

    acc = jnp.zeros((rows, LANES), acc_dtype)
    for dz in range(3):
        for dy in range(3):
            for dx in (-1, 0, 1):
                lhs = variants[dx][dz:dz + tz, dy:dy + ty].reshape(
                    rows, LANES
                )
                # tap order must match coords.neighbor_offsets: x fastest
                tap = dz * 9 + dy * 3 + (dx + 1)
                acc = acc + jnp.dot(
                    lhs, w_ref[tap], preferred_element_type=acc_dtype
                )
    out_ref[0] = acc.reshape(tz, ty, xbp, LANES).astype(out_ref.dtype)


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
    xq = _round_up(xb + 4, 8)  # stored slab width in blocks (8-aligned DMA)
    xbp = xq - 2               # rows spanned by the base view
    # fold + pad: z/y by 1; x-blocks: 2 left, rest right (zeros)
    xf = x.reshape(B, Z, Y, xb, LANES)
    xf = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (2, xq - 2 - xb), (0, 0)))
    w = _block_diag_weights(weight27, x.dtype)
    grid = (B, Z // tz, Y // ty)
    out = pl.pallas_call(
        functools.partial(
            _kernel, tz=tz, ty=ty, xq=xq, cin=C, acc_dtype=jnp.float32
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tz, ty, xbp, LANES),
            lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Z, Y, xbp, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tz + 2, ty + 2, xq, LANES), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xf, w)
    # base view covers xf blocks [1, 1+xbp): real block j sits at index j+1
    y = out[:, :, :, 1:1 + xb, :].reshape(B, Z, Y, X, C)
    return y[..., :cout]

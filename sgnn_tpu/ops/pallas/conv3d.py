"""Pallas TPU kernel: 3^3 convolution for narrow channel counts.

XLA's 3D conv lowering runs SG-NN's narrow convs (C=8..48) at ~2.4% MXU
utilization and surrounds them with layout copies (BENCH_NOTES.md). This
kernel streams each spatial tile + 1-voxel halo from HBM to VMEM once,
assembles the 27 taps into four [M, 8*C] tap-group operands IN VMEM, and
contracts them on the MXU — HBM traffic is one read of x and one write of
y, and the contraction dim is 8*C (>=128 for C=16).

STATUS: EXPERIMENTAL — correct under interpret mode (tests), but Mosaic
(jax 0.9 / v5e) rejects the HBM->VMEM tile DMA: slices of refs must be
tiled (8, 128) in their minor two dims, and channels-last C=16 can never
satisfy the 128-lane granularity ("Slice shape along dimension 4 must be
aligned to tiling (128), but is 16") — even with fully-contiguous trailing
dims. The viable formulation (round 2) folds x into lanes
([B,Z,Y,X/8,8C=128] space-to-depth) and performs the x-tap shifts with
pltpu.roll + cross-block lane carries instead of slicing. Until then the
XLA conv path stays in production; this file preserves the working
interpret-mode kernel and the constraint notes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# taps in C order (z,y,x), grouped 8+8+8+3 (last group padded with center
# taps whose weights are zero)
_TAPS = [(dz, dy, dx) for dz in range(3) for dy in range(3) for dx in range(3)]
_GROUPS = [_TAPS[0:8], _TAPS[8:16], _TAPS[16:24],
           _TAPS[24:27] + [(1, 1, 1)] * 5]


def _kernel(xp_ref, w_ref, out_ref, tile_ref, lhs_ref, sem, *,
            tz, ty, X, cin, cout, acc_dtype):
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    # DMA whole padded-x rows (trailing two dims full => row-contiguous
    # copies, no partial-tile DMA constraints); grid covers (b, z, y)
    dma = pltpu.make_async_copy(
        xp_ref.at[
            b,
            pl.ds(iz * tz, tz + 2),
            pl.ds(iy * ty, ty + 2),
            :,
            :,
        ],
        tile_ref,
        sem,
    )
    dma.start()
    dma.wait()
    m = tz * ty * X
    acc = jnp.zeros((m, cout), acc_dtype)
    for g, taps in enumerate(_GROUPS):
        for j, (dz, dy, dx) in enumerate(taps):
            view = tile_ref[dz:dz + tz, dy:dy + ty, dx:dx + X, :]
            lhs_ref[:, j * cin:(j + 1) * cin] = view.reshape(m, cin)
        acc = acc + jnp.dot(
            lhs_ref[:], w_ref[g], preferred_element_type=acc_dtype
        )
    out_ref[0] = acc.reshape(tz, ty, X, cout).astype(out_ref.dtype)


def _pick_tile(n, targets):
    for t in targets:
        if n % t == 0:
            return t
    return None


def conv3d_3x3x3_pallas(x: jax.Array, weight27: jax.Array) -> jax.Array:
    """y = conv3x3x3(x, w) with zero padding; x [B,Z,Y,X,C] channels-last,
    weight27 [27, Cin, Cout]. Returns None-equivalent fallback via raising
    ValueError when shapes don't tile (caller falls back to XLA conv)."""
    B, Z, Y, X, C = x.shape
    _, _, cout = weight27.shape
    tz = _pick_tile(Z, (4, 3, 2, 6, 8, 1))
    ty = _pick_tile(Y, (8, 16, 12, 6, 4, 24, 2, 1))
    if tz is None or ty is None:
        raise ValueError(f"no tiling for {x.shape}")
    if tz * ty * X % 8:
        raise ValueError("tile rows must be a sublane multiple")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 7), (0, 0)))
    # padded tap-group weights [4, 8*Cin, Cout]
    w_groups = []
    for g, taps in enumerate(_GROUPS):
        rows = []
        for j, t in enumerate(taps):
            k = _TAPS.index(t) if t in _TAPS else 13
            real = g * 8 + j < 27
            wk = weight27[k] if real else jnp.zeros_like(weight27[0])
            rows.append(wk)
        w_groups.append(jnp.concatenate(rows, axis=0))  # [8*Cin, Cout]
    w_packed = jnp.stack(w_groups).astype(x.dtype)  # [4, 8C, Cout]

    grid = (B, Z // tz, Y // ty)
    out = pl.pallas_call(
        functools.partial(
            _kernel, tz=tz, ty=ty, X=X, cin=C, cout=cout,
            acc_dtype=jnp.float32,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed weights
        ],
        out_specs=pl.BlockSpec(
            (1, tz, ty, X, cout),
            lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Z, Y, X, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tz + 2, ty + 2, X + 8, C), x.dtype),
            pltpu.VMEM((tz * ty * X, 8 * C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, w_packed)
    return out

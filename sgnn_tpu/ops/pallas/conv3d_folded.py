"""Pallas TPU kernel: lane-folded 3^3 convolution for narrow channels.

XLA runs SG-NN's narrow convs (C=8/16) at ~2.4% MXU utilization with heavy
layout copies (BENCH_NOTES.md); this kernel reaches high MXU occupancy by
construction. v2 design (round 2):

  * the input is space-to-depth folded along x: [B, Z, Y, X/F, 128] where
    lane l = xi*C + c packs F = 128/C voxels x C channels — a pure reshape,
    so every DMA is 128-lane aligned (Mosaic requires slices tiled (8, 128)
    in the minor two dims).
  * ALL 3 x-taps of a (dz, dy) tap column are folded into ONE 128x128
    weight: out fold-slot i consumes in slots i-1, i, i+1, so the three
    x-taps occupy the sub/main/super block-diagonals of a single matrix.
    9 main GEMMs replace 27.
  * the two cross-block carries (out slot 0 needs the previous x-block's
    slot F-1 for dx=-1; out slot F-1 needs the next block's slot 0 for
    dx=+1) use DISJOINT lhs lanes and disjoint output columns, so both fit
    in ONE additional GEMM per (dz, dy) against a "carry" lhs built
    IN-KERNEL from the same tile (one x-block shift + lane select — no
    XLA-side variant arrays, no extra HBM traffic). 18 GEMMs total, each
    [rows, 128] x [128, 128] with rows = tz*ty*xq.
  * z/y halos come from the DMA'd tile; slicing them only touches leading
    (non-minor) dims, which is address arithmetic, not relayout.

Supported: C in {8, 16, 32}, X % (128/C) == 0, Cout <= C, bf16/f32.
Backward: custom VJP — dx reuses this kernel with the flipped-transposed
weight; dW uses XLA's conv weight-gradient (tiny output, [27, C, C]).

Replaces scn's fused gather-GEMM-scatter role (/root/reference/torch/
model.py:7) for the dense-flow execution's submanifold convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def supported(x_shape, w_shape) -> bool:
    """True when conv3d_3x3x3_folded handles this (x, weight27) pair."""
    if len(x_shape) != 5 or len(w_shape) != 3:
        return False
    B, Z, Y, X, C = x_shape
    K, cin, cout = w_shape
    if K != 27 or cin != C or cout > cin:
        return False
    if C not in (8, 16, 32):
        return False
    fold = LANES // C
    return X % fold == 0 and Z >= 1 and Y >= 1


def _pick_tile(n, candidates):
    for t in candidates:
        if n % t == 0:
            return t
    return 1


def _kernel(xf_ref, wm_ref, wc_ref, out_ref, t_ref, sems, *,
            tz, ty, xq, cin, acc_dtype):
    nz = pl.num_programs(1)
    ny = pl.num_programs(2)
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    k = (b * nz + iz) * ny + iy
    total = pl.num_programs(0) * nz * ny

    def dma_for(step, slot):
        bb = step // (nz * ny)
        r = step % (nz * ny)
        return pltpu.make_async_copy(
            xf_ref.at[
                bb,
                pl.ds((r // ny) * tz, tz + 2),
                pl.ds((r % ny) * ty, ty + 2),
                :, :,
            ],
            t_ref.at[slot],
            sems.at[slot],
        )

    # double-buffered input: program k computes on slot k%2 (started by
    # program k-1) and prefetches program k+1 into the other slot
    @pl.when(k == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(k + 1 < total)
    def _():
        dma_for(k + 1, (k + 1) % 2).start()

    dma_for(k, k % 2).wait()
    t = t_ref[k % 2]  # [tz+2, ty+2, xq, 128]
    # carry lhs: lanes < cin take the NEXT x-block (for the dx=+1 carry
    # into out slot F-1), lanes >= 128-cin take the PREVIOUS x-block (for
    # the dx=-1 carry into out slot 0). Middle lanes are never read by the
    # carry weights (zero rows), so the select can leave anything there.
    zrow = jnp.zeros_like(t[:, :, :1])
    nxt = jnp.concatenate([t[:, :, 1:], zrow], axis=2)
    prv = jnp.concatenate([zrow, t[:, :, :-1]], axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, LANES), 3)
    carry = jnp.where(lane < cin, nxt, prv)

    rows = tz * ty * xq
    acc = jnp.zeros((rows, LANES), acc_dtype)
    for dz in range(3):
        for dy in range(3):
            k = dz * 3 + dy
            lhs_m = t[dz:dz + tz, dy:dy + ty].reshape(rows, LANES)
            acc = acc + jnp.dot(
                lhs_m, wm_ref[k], preferred_element_type=acc_dtype
            )
            lhs_c = carry[dz:dz + tz, dy:dy + ty].reshape(rows, LANES)
            acc = acc + jnp.dot(
                lhs_c, wc_ref[k], preferred_element_type=acc_dtype
            )
    out_ref[0] = acc.reshape(tz, ty, xq, LANES).astype(out_ref.dtype)


def _fold_weights(weight27: jax.Array, cin: int, dtype):
    """[27, Cin, Cout<=Cin] -> (w_main [9, 128, 128], w_carry [9, 128, 128]).

    w_main[dz*3+dy] carries the three x-taps of the (dz, dy) column on the
    sub/main/super block-diagonals: rows (i+dx)*C..(+C) x cols i*C..(+C)
    hold W[tap(dz, dy, dx)]. w_carry holds the two cross-x-block terms:
    rows 0..C (next block's slot 0) -> cols of out slot F-1 for dx=+1, and
    rows 128-C.. (previous block's slot F-1) -> cols of out slot 0 for
    dx=-1. Tap order matches coords.neighbor_offsets (x fastest).
    """
    K, ci, co = weight27.shape
    fold = LANES // cin
    w = weight27.astype(jnp.float32)
    if co < cin:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin - co)))
    # constant slot-wiring patterns; the traced weights enter via ONE
    # einsum each (no per-block dynamic-update-slices in the graph: at
    # ~250 DUS per conv those cost ~10 ms/scene, measured round 2)
    eye = np.eye(fold, dtype=np.float32)
    diags = np.stack(  # [3, fold, fold]: D_dx[j, i] = 1 iff j == i + dx
        [np.diag(np.ones(fold - abs(k), np.float32), k)
         for k in (1, 0, -1)]  # np.diag k: M[r, r+k]=1 -> j = i - k = i + dx
    )
    carry = np.zeros((3, fold, fold), np.float32)
    carry[2, 0, fold - 1] = 1.0  # dx=+1: next block's slot 0 -> slot F-1
    carry[0, fold - 1, 0] = 1.0  # dx=-1: prev block's slot F-1 -> slot 0
    w9 = w.reshape(9, 3, cin, cin)  # [(dz,dy), dx, Cin, Cout]
    dj = jnp.asarray(diags)
    cj = jnp.asarray(carry)
    # block-kron: out[k, j*cin+c, i*cin+c'] = sum_dx D[dx, j, i] * w9[k, dx, c, c']
    wm = jnp.einsum("dji,kdco->kjcio", dj, w9).reshape(9, LANES, LANES)
    wc = jnp.einsum("dji,kdco->kjcio", cj, w9).reshape(9, LANES, LANES)
    return wm.astype(dtype), wc.astype(dtype)


def _conv_impl(x: jax.Array, weight27: jax.Array) -> jax.Array:
    B, Z, Y, X, C = x.shape
    K, cin, cout = weight27.shape
    fold = LANES // C
    xb = X // fold
    xq = _round_up(xb, 8)
    xf = x.reshape(B, Z, Y, xb, LANES)
    xf = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, xq - xb), (0, 0)))
    wm, wc = _fold_weights(weight27, C, x.dtype)
    tz = _pick_tile(Z, (8, 4, 2, 1) if Z % 8 else (8,))
    ty = _pick_tile(Y, (16, 8, 4, 2, 1))
    grid = (B, Z // tz, Y // ty)
    tile = pltpu.VMEM((2, tz + 2, ty + 2, xq, LANES), x.dtype)
    out = pl.pallas_call(
        functools.partial(
            _kernel, tz=tz, ty=ty, xq=xq, cin=C, acc_dtype=jnp.float32
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tz, ty, xq, LANES),
            lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Z, Y, xq, LANES), x.dtype),
        scratch_shapes=[tile, pltpu.SemaphoreType.DMA((2,))],
    )(xf, wm, wc)
    y = out[:, :, :, :xb, :].reshape(B, Z, Y, X, C)
    return y[..., :cout]


def conv_folded_raw(xf: jax.Array, weight27: jax.Array, cpad: int,
                    dims: tuple) -> jax.Array:
    """Folded-I/O entry: xf [B, Z+2, Y+2, xq, 128] (zero halo ring, lane
    l = xi*cpad + c, dead lanes zero) -> UNPADDED folded output
    [B, Z, Y, xq, 128]. The caller re-halos fused with its mask multiply.

    weight27 [27, real_cin <= cpad, cout <= cpad]; dead input lanes hit
    zero weight rows, dead output lanes get zero columns.
    """
    B, Zp, Yp, xq, _ = xf.shape
    Z, Y = Zp - 2, Yp - 2
    K, cin, cout = weight27.shape
    assert K == 27 and cin <= cpad and cout <= cpad, (K, cin, cout, cpad)
    w = weight27
    if cin < cpad:
        w = jnp.pad(w, ((0, 0), (0, cpad - cin), (0, 0)))
    wm, wc = _fold_weights(w, cpad, xf.dtype)
    tz = _pick_tile(Z, (8, 6, 4, 3, 2, 1))
    ty = _pick_tile(Y, (16, 12, 8, 6, 4, 3, 2, 1))
    grid = (B, Z // tz, Y // ty)
    tile = pltpu.VMEM((2, tz + 2, ty + 2, xq, LANES), xf.dtype)
    return pl.pallas_call(
        functools.partial(
            _kernel, tz=tz, ty=ty, xq=xq, cin=cpad, acc_dtype=jnp.float32
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tz, ty, xq, LANES),
            lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Z, Y, xq, LANES), xf.dtype),
        scratch_shapes=[tile, pltpu.SemaphoreType.DMA((2,))],
    )(xf, wm, wc)


def _xla_conv(x, weight27):
    """Reference XLA lowering (also the dW path of the VJP)."""
    w = weight27.reshape(3, 3, 3, *weight27.shape[1:]).astype(x.dtype)
    kw = (
        {} if jnp.dtype(x.dtype) == jnp.bfloat16
        else {"preferred_element_type": jnp.float32}
    )
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), **kw,
    ).astype(x.dtype)


@jax.custom_vjp
def conv3d_3x3x3_folded(x: jax.Array, weight27: jax.Array) -> jax.Array:
    """conv3x3x3(x, w) with zero padding via the lane-folded kernel.

    x [B, Z, Y, X, C] channels-last; weight27 [27, Cin=C, Cout <= C].
    Check eligibility with supported() first; raises ValueError otherwise.
    """
    if not supported(x.shape, weight27.shape):
        raise ValueError(f"unsupported shapes x={x.shape} w={weight27.shape}")
    return _conv_impl(x, weight27)


def _conv_fwd(x, weight27):
    return conv3d_3x3x3_folded(x, weight27), (x, weight27)


def _conv_bwd(res, g):
    x, w = res
    K, cin, cout = w.shape
    # dx = conv(g, flip-transpose(w)): flip taps spatially, swap in/out
    wt = jnp.flip(w.reshape(3, 3, 3, cin, cout), (0, 1, 2))
    wt = wt.reshape(27, cin, cout).transpose(0, 2, 1)  # [27, Cout, Cin]
    g = g.astype(x.dtype)
    if supported(g.shape, wt.shape):
        dx = _conv_impl(g, wt)
    else:  # Cout != Cin: fall back to XLA for the input gradient
        dx = _xla_conv(g, wt)
    # dW via XLA's conv weight-gradient (output is tiny: [27, Cin, Cout])
    _, vjp_w = jax.vjp(lambda ww: _xla_conv(x, ww), w)
    (dw,) = vjp_w(g)
    return dx, dw


conv3d_3x3x3_folded.defvjp(_conv_fwd, _conv_bwd)

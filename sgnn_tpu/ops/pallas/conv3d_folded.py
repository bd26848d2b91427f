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


@functools.lru_cache(maxsize=None)
def _slot_patterns(fold: int):
    """Constant x-fold slot-wiring patterns shared by _fold_weights and
    the training conv's dW adjoint (ops/folded.py:_conv_train_bwd):
    diags[dx_idx][j, i] = 1 iff input slot j == output slot i + dx, for
    dx in (-1, 0, +1) at indices (0, 1, 2); carry holds the two
    cross-x-block terms."""
    diags = np.stack(
        [np.diag(np.ones(fold - abs(k), np.float32), k)
         for k in (1, 0, -1)]  # np.diag k: M[r, r+k]=1 -> j = i + dx
    )
    carry = np.zeros((3, fold, fold), np.float32)
    carry[2, 0, fold - 1] = 1.0  # dx=+1: next block's slot 0 -> F-1
    carry[0, fold - 1, 0] = 1.0  # dx=-1: prev block's slot F-1 -> 0
    return diags, carry


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
    diags, carry = _slot_patterns(fold)
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


# --------------------------------------------------------- fused kernel (v3)
#
# One kernel per conv SITE instead of per channel group, with the
# surrounding elementwise ops folded in. Removes, per conv, every XLA-side
# full-grid pass the v2 path needed: (G-1) partial-sum read+writes, the
# BN-eval affine+ReLU pass feeding the conv, the output mask multiply, and
# the re-halo pad. HBM traffic becomes the floor: read G tiles + mask,
# write one halo'd masked output.
#
#   out[b, 1+z, 1+y, :, :] = mask * sum_g conv3(in_g'), where
#   in_g' = relu(in_g * a_g + b_g) * mask    (a, b optional: BN-eval affine)
#
# and the output's one-voxel halo ring is written ZERO by the edge
# programs, so the result is directly the next conv's operand.


def _kernel_fused(*refs, G, tz, ty, xq, cpad, relu, has_affine, has_resid,
                  acc_dtype, quant=False):
    xrefs = refs[:G]
    i = G
    if has_resid:
        mask_ref, resid_ref = refs[i], refs[i + 1]
        i += 2
    else:
        mask_ref = refs[i]
        resid_ref = None
        i += 1
    wm_ref, wc_ref, ab_ref = refs[i:i + 3]
    i += 3
    if quant:
        ws_ref = refs[i]
        i += 1
    else:
        ws_ref = None
    out_ref = refs[i]
    i += 1
    if has_resid:
        (tbuf, rbuf, obuf, zb_z, zb_y, zb_c, in_sems, out_sems,
         ring_sems) = refs[i:]
    else:
        (tbuf, obuf, zb_z, zb_y, zb_c, in_sems, out_sems,
         ring_sems) = refs[i:]
        rbuf = None

    nz = pl.num_programs(1)
    ny = pl.num_programs(2)
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    k = (b * nz + iz) * ny + iy
    total = pl.num_programs(0) * nz * ny

    def in_dmas(step, slot):
        bb = step // (nz * ny)
        r = step % (nz * ny)
        z0 = (r // ny) * tz
        y0 = (r % ny) * ty
        dmas = []
        for g in range(G):
            dmas.append(pltpu.make_async_copy(
                xrefs[g].at[bb, pl.ds(z0, tz + 2), pl.ds(y0, ty + 2), :, :],
                tbuf.at[slot, g],
                in_sems.at[slot, g],
            ))
        dmas.append(pltpu.make_async_copy(
            mask_ref.at[bb, pl.ds(z0, tz + 2), pl.ds(y0, ty + 2), :, :],
            tbuf.at[slot, G],
            in_sems.at[slot, G],
        ))
        if has_resid:
            dmas.append(pltpu.make_async_copy(
                resid_ref.at[bb, pl.ds(z0 + 1, tz), pl.ds(y0 + 1, ty),
                             :, :],
                rbuf.at[slot],
                in_sems.at[slot, G + 1],
            ))
        return dmas

    @pl.when(k == 0)
    def _():
        for d in in_dmas(0, 0):
            d.start()

    @pl.when(k + 1 < total)
    def _():
        for d in in_dmas(k + 1, (k + 1) % 2):
            d.start()

    # the output DMA two programs back must land before its slot is reused
    @pl.when(k > 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[k % 2], obuf.at[k % 2], out_sems.at[k % 2]
        ).wait()

    for d in in_dmas(k, k % 2):
        d.wait()

    slot = k % 2
    mt = tbuf[slot, G]  # [tz+2, ty+2, xq, 128] 0/1 (halo ring zero)
    rows = tz * ty * xq
    acc = jnp.zeros((rows, LANES), jnp.float32 if quant else acc_dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, LANES), 3)
    for g in range(G):
        t = tbuf[slot, g]
        if has_affine:
            tf = t.astype(jnp.float32) * ab_ref[0, g] + ab_ref[1, g]
            if relu:
                tf = jnp.maximum(tf, 0.0)
            tf = tf * mt.astype(jnp.float32)
            t = tf.astype(t.dtype)
        elif quant:
            tf = t.astype(jnp.float32)
        if quant:
            # dynamic per-(tile, group) symmetric int8: q = round(x/s),
            # s = amax/127. int8 GEMMs accumulate exactly in int32; the
            # only error is the activation rounding (~0.4% RMS/conv).
            # Weight columns carry their own static scales (ws_ref).
            amax = jnp.max(jnp.abs(tf))
            scale = jnp.maximum(amax, 1e-8) / 127.0
            q = jnp.clip(
                jnp.round(tf * (1.0 / scale)), -127.0, 127.0
            ).astype(jnp.int8)
            t = q
        # carry lhs: lanes < cpad take the NEXT x-block (dx=+1 carry into
        # out slot F-1), lanes >= 128-cpad the PREVIOUS (dx=-1 into slot
        # 0); middle lanes hit zero weight rows (see _fold_weights)
        zrow = jnp.zeros_like(t[:, :, :1])
        nxt = jnp.concatenate([t[:, :, 1:], zrow], axis=2)
        prv = jnp.concatenate([zrow, t[:, :, :-1]], axis=2)
        carry = jnp.where(lane < cpad, nxt, prv)
        if quant:
            iacc = jnp.zeros((rows, LANES), jnp.int32)
            for dz in range(3):
                for dy in range(3):
                    kk = dz * 3 + dy
                    lhs_m = t[dz:dz + tz, dy:dy + ty].reshape(rows, LANES)
                    iacc = iacc + jnp.dot(
                        lhs_m, wm_ref[g, kk],
                        preferred_element_type=jnp.int32,
                    )
                    lhs_c = carry[dz:dz + tz, dy:dy + ty].reshape(
                        rows, LANES)
                    iacc = iacc + jnp.dot(
                        lhs_c, wc_ref[g, kk],
                        preferred_element_type=jnp.int32,
                    )
            # dequant: activation scale (scalar) x per-column weight scale
            acc = acc + iacc.astype(jnp.float32) * (scale * ws_ref[g])
        else:
            for dz in range(3):
                for dy in range(3):
                    kk = dz * 3 + dy
                    lhs_m = t[dz:dz + tz, dy:dy + ty].reshape(rows, LANES)
                    acc = acc + jnp.dot(
                        lhs_m, wm_ref[g, kk],
                        preferred_element_type=acc_dtype
                    )
                    lhs_c = carry[dz:dz + tz, dy:dy + ty].reshape(
                        rows, LANES)
                    acc = acc + jnp.dot(
                        lhs_c, wc_ref[g, kk],
                        preferred_element_type=acc_dtype
                    )

    om = mt[1:1 + tz, 1:1 + ty].reshape(rows, LANES).astype(acc_dtype)
    res = (acc * om).astype(out_ref.dtype)
    if has_resid:
        # residual is already masked upstream, so add after the mask
        res = res + rbuf[slot].reshape(rows, LANES)
    obuf[slot] = res.reshape(tz, ty, xq, LANES)
    out_dma = pltpu.make_async_copy(
        obuf.at[slot],
        out_ref.at[b, pl.ds(1 + iz * tz, tz), pl.ds(1 + iy * ty, ty), :, :],
        out_sems.at[slot],
    )
    out_dma.start()

    # ---- zero halo ring (edge programs; disjoint regions)
    Zp = out_ref.shape[1]
    Yp = out_ref.shape[2]
    zb_z[...] = jnp.zeros_like(zb_z)
    zb_y[...] = jnp.zeros_like(zb_y)
    zb_c[...] = jnp.zeros_like(zb_c)

    def ring(cond, src, dst_slice, sem_i):
        @pl.when(cond)
        def _():
            d = pltpu.make_async_copy(src, dst_slice, ring_sems.at[sem_i])
            d.start()
            d.wait()

    ring(iz == 0, zb_z,
         out_ref.at[b, pl.ds(0, 1), pl.ds(1 + iy * ty, ty), :, :], 0)
    ring(iz == nz - 1, zb_z,
         out_ref.at[b, pl.ds(Zp - 1, 1), pl.ds(1 + iy * ty, ty), :, :], 1)
    ring(iy == 0, zb_y,
         out_ref.at[b, pl.ds(1 + iz * tz, tz), pl.ds(0, 1), :, :], 2)
    ring(iy == ny - 1, zb_y,
         out_ref.at[b, pl.ds(1 + iz * tz, tz), pl.ds(Yp - 1, 1), :, :], 3)
    ring((iz == 0) & (iy == 0), zb_c,
         out_ref.at[b, pl.ds(0, 1), pl.ds(0, 1), :, :], 4)
    ring((iz == 0) & (iy == ny - 1), zb_c,
         out_ref.at[b, pl.ds(0, 1), pl.ds(Yp - 1, 1), :, :], 5)
    ring((iz == nz - 1) & (iy == 0), zb_c,
         out_ref.at[b, pl.ds(Zp - 1, 1), pl.ds(0, 1), :, :], 6)
    ring((iz == nz - 1) & (iy == ny - 1), zb_c,
         out_ref.at[b, pl.ds(Zp - 1, 1), pl.ds(Yp - 1, 1), :, :], 7)

    # final programs: wait the last two output DMAs (no successor waits)
    @pl.when(k == total - 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[slot], obuf.at[slot], out_sems.at[slot]
        ).wait()

    @pl.when((k == total - 2) & (total > 1))
    def _():
        pltpu.make_async_copy(
            obuf.at[slot], obuf.at[slot], out_sems.at[slot]
        ).wait()


def _pick_tiles_budget(Z, Y, xq, G, itemsize, budget_bytes=12_500_000,
                       extra_interior_bytes=0, quant=False):
    """Largest (tz, ty) divisors of (Z, Y) fitting Mosaic's ~16 MB scoped
    VMEM, accounting for the DMA buffers AND the kernel-body stack: the
    f32 affine temporary, the carry shift copies, and the f32 accumulator
    (measured: the first cut counted DMA buffers only and OOM'd at 17 MB).
    """
    best = (1, 1)
    for tz in (16, 12, 8, 6, 4, 3, 2, 1):
        if Z % tz:
            continue
        for ty in (32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
            if Y % ty:
                continue
            T = (tz + 2) * (ty + 2) * xq * LANES   # halo'd tile elements
            R = tz * ty * xq * LANES               # interior elements
            cost = 2 * (G + 1) * T * itemsize      # tbuf (2 slots)
            cost += 2 * R * itemsize               # obuf (2 slots)
            cost += R * extra_interior_bytes       # e.g. residual rbuf
            cost += T * (4 + 3 * itemsize)         # affine f32 + shifts
            cost += R * 4                          # f32 accumulator
            if quant:
                cost += R * 4                      # int32 accumulator
                cost += T * 3                      # int8 q + shift copies
            cost += (tz + ty + 1) * xq * LANES * itemsize  # zero ring bufs
            cost += G * 2 * 9 * LANES * LANES * itemsize   # folded weights
            if cost <= budget_bytes and tz * ty > best[0] * best[1]:
                best = (tz, ty)
    return best


def prep_conv_weights(w27s: list, cpad: int, dt, quantize: bool) -> dict:
    """Kernel-ready folded weights for fused_conv_folded: pad + tap-fold
    (+ int8 quantization). Depends only on the weights, so production
    serving hoists it out of the per-forward graph (a device trace showed
    these einsums rerunning every forward, ~1.3 ms at headline dims —
    BENCH_NOTES round-5 roofline table)."""
    wms, wcs = [], []
    for w in w27s:
        K, cin, cout = w.shape
        assert K == 27 and cin <= cpad and cout <= cpad
        if cin < cpad:
            w = jnp.pad(w, ((0, 0), (0, cpad - cin), (0, 0)))
        wm, wc = _fold_weights(w.astype(jnp.float32), cpad, dt)
        wms.append(wm)
        wcs.append(wc)
    wm = jnp.stack(wms)  # [G, 9, 128, 128]
    wc = jnp.stack(wcs)
    if quantize:
        # symmetric per-(group, output-column) weight scales shared by the
        # main and carry matrices (their columns feed the same output)
        amax = jnp.maximum(
            jnp.max(jnp.abs(wm.astype(jnp.float32)), axis=(1, 2)),
            jnp.max(jnp.abs(wc.astype(jnp.float32)), axis=(1, 2)),
        )  # [G, 128]
        ws = jnp.maximum(amax, 1e-8) / 127.0
        inv = (1.0 / ws)[:, None, None, :]
        wm = jnp.clip(
            jnp.round(wm.astype(jnp.float32) * inv), -127.0, 127.0
        ).astype(jnp.int8)
        wc = jnp.clip(
            jnp.round(wc.astype(jnp.float32) * inv), -127.0, 127.0
        ).astype(jnp.int8)
        return {"wm": wm, "wc": wc, "ws": ws}
    return {"wm": wm, "wc": wc}


def fused_conv_folded(
    xs: list,            # G halo'd folded grids [B, Z+2, Y+2, xq, 128]
    mask: jax.Array,     # [B, Z+2, Y+2, xq, 128] 0/1, halo ring zero
    w27s: list | None,   # G weights [27, real_c_g, cout], cout <= cpad
    cpad: int,
    *,
    affines: list | None = None,  # G (scale[128] f32, bias[128] f32) pairs
    relu: bool = True,
    residual: jax.Array | None = None,  # halo'd grid added to the output
    quantize: bool = False,  # int8 GEMMs (static per-column weight scales
                             # + dynamic per-tile activation scales)
    prew: dict | None = None,  # prep_conv_weights output (skips folding)
) -> jax.Array:
    """Fused folded conv site -> HALO'D masked output [B, Z+2, Y+2, xq, 128].

    out_interior = mask * sum_g conv3(in_g') [+ residual], halo ring
    written zero; in_g' = relu(in_g * scale_g + bias_g) * mask when
    affines are given (BN-eval fused), else in_g as-is (inputs already
    masked). ``residual`` must be masked upstream (it is added after the
    output mask — the resblock's identity branch, nn/blocks semantics).
    """
    G = len(xs)
    assert G >= 1 and (prew is not None or len(w27s) == G)
    x0 = xs[0]
    B, Zp, Yp, xq, _ = x0.shape
    Z, Y = Zp - 2, Yp - 2
    dt = x0.dtype
    if prew is None:
        prew = prep_conv_weights(w27s, cpad, dt, quantize)
    wm, wc, ws = prew["wm"], prew["wc"], prew.get("ws")
    assert wm.shape[0] == G
    has_affine = affines is not None
    if has_affine:
        ab = jnp.stack([
            jnp.stack([a.astype(jnp.float32), b.astype(jnp.float32)])
            for a, b in affines
        ], axis=1)  # [2, G, 128]
    else:
        ab = jnp.zeros((2, G, LANES), jnp.float32)

    has_resid = residual is not None
    tz, ty = _pick_tiles_budget(
        Z, Y, xq, G, jnp.dtype(dt).itemsize,
        extra_interior_bytes=2 * jnp.dtype(dt).itemsize if has_resid else 0,
        quant=quantize,
    )
    grid = (B, Z // tz, Y // ty)
    kernel = functools.partial(
        _kernel_fused, G=G, tz=tz, ty=ty, xq=xq, cpad=cpad,
        relu=relu, has_affine=has_affine, has_resid=has_resid,
        acc_dtype=jnp.float32, quant=quantize,
    )
    n_in = G + 1 + (1 if has_resid else 0)
    scratch = [
        pltpu.VMEM((2, G + 1, tz + 2, ty + 2, xq, LANES), dt),  # tbuf
    ]
    if has_resid:
        scratch.append(pltpu.VMEM((2, tz, ty, xq, LANES), dt))  # rbuf
    scratch += [
        pltpu.VMEM((2, tz, ty, xq, LANES), dt),                 # obuf
        pltpu.VMEM((1, ty, xq, LANES), dt),                     # zb_z
        pltpu.VMEM((tz, 1, xq, LANES), dt),                     # zb_y
        pltpu.VMEM((1, 1, xq, LANES), dt),                      # zb_c
        pltpu.SemaphoreType.DMA((2, n_in)),                     # in_sems
        pltpu.SemaphoreType.DMA((2,)),                          # out_sems
        pltpu.SemaphoreType.DMA((8,)),                          # ring_sems
    ]
    operands = [*xs, mask]
    if has_resid:
        operands.append(residual.astype(dt))
    w_operands = [wm, wc, ab]
    w_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wm
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wc
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ab
    ]
    if quantize:
        w_operands.append(ws)
        w_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # ws
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in + w_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, Zp, Yp, xq, LANES), dt),
        scratch_shapes=scratch,
    )(*operands, *w_operands)


# ------------------------------------------------- fused upsample-conv (v3)
#
# out = mask_fine * conv3(nn_upsample2(sum-of-groups)), computed DIRECTLY
# from the coarse grids: out(f) = sum_d W[d] z((f+d)//2), so each fine
# voxel reads 2 coarse taps per axis with parity-dependent combined
# weights (8 effective taps instead of 27 — 3.4x fewer MACs than conv on
# the upsampled grid), and the G upsampled fine grids (8x the coarse
# bytes, written + re-read by the conv in the composed path) are never
# materialized. Optional per-group input affine folds the preceding
# BN-eval + ReLU + coarse-mask in (models/folded_flow.py refine_level's
# p3 -> upsample -> n1 chain, /root/reference/torch/model.py:192-207).

# per-axis tap-membership: A[p, e, d+1] = 1 iff original tap d lands on
# the coarse neighbor e (0: lower, 1: upper) for fine parity p
_UP_A = np.array(
    [[[1, 0, 0], [0, 1, 1]],   # p=0: e0 <- {-1};   e1 <- {0, +1}
     [[1, 1, 0], [0, 0, 1]]],  # p=1: e0 <- {-1, 0}; e1 <- {+1}
    np.float32,
)


@functools.lru_cache(maxsize=None)
def _up_place(cpad: int):
    """Constant x-axis placement patterns for the fused upsample-conv.

    Pm[dx, s, o]: weight of original x-tap dx from in-block coarse slot s
    onto fine pair-offset o (16 fine voxels per coarse block pair).
    Pc[dx, src, o]: same for the two cross-block carries (src 0: next
    block's slot 0 read from carry lanes [0, cpad); src 1: previous
    block's slot F-1 read from lanes [128-cpad, 128))."""
    F = LANES // cpad
    Pm = np.zeros((3, F, 2 * F), np.float32)
    Pc = np.zeros((3, 2, 2 * F), np.float32)
    for o in range(2 * F):
        px = o & 1
        for ex in range(2):
            s = (o - 1) // 2 + ex
            for dxi in range(3):
                a = _UP_A[px, ex, dxi]
                if a == 0:
                    continue
                if 0 <= s < F:
                    Pm[dxi, s, o] += a
                elif s == -1:
                    Pc[dxi, 1, o] += a  # prev block's slot F-1
                else:  # s == F
                    Pc[dxi, 0, o] += a  # next block's slot 0
    return Pm, Pc


def _fold_upsample_weights(weight27: jax.Array, cpad: int, dtype):
    """[27, cpad, cout] -> (wm, wc) [2, 2, 2, 2, 128, 256]: per (pz, py)
    fine parity and (ez, ey) coarse z/y-neighbor, the lane matrix taking a
    coarse block (8 voxels x cpad) to a fine block PAIR (16 voxels)."""
    F = LANES // cpad
    w = weight27.astype(jnp.float32).reshape(3, 3, 3, cpad, -1)
    cout = w.shape[-1]
    if cout < cpad:
        w = jnp.pad(w, ((0, 0),) * 4 + ((0, cpad - cout),))
    A = jnp.asarray(_UP_A)
    Pm, Pc = _up_place(cpad)
    # combine z/y memberships with the x placement; output col layout is
    # (hi = o // F, lo = o % F, co) -> hi * 128 + lo * cpad + co
    def build(P):
        # m[pz, py, ez, ey, s, o, cin, cout] =
        #   sum_d A[pz, ez, dz] A[py, ey, dy] P[dx, s, o] w[dz, dy, dx, :, :]
        m = jnp.einsum(
            "azA,byB,dso,ABdce->abzysoce", A, A, jnp.asarray(P), w
        )
        # m: [pz, py, ez, ey, s, o, cin, cout] -> rows (s, cin), cols
        # (o_hi, o_lo, cout)
        P2 = m.shape[4]
        m = m.transpose(0, 1, 2, 3, 4, 6, 5, 7)  # [..., s, cin, o, cout]
        m = m.reshape(2, 2, 2, 2, P2 * cpad, 2 * F, cpad)
        m = m.reshape(2, 2, 2, 2, P2 * cpad, 2, F, cpad)
        return m.reshape(2, 2, 2, 2, P2 * cpad, 2 * LANES)

    wm = build(Pm)           # rows = 8 slots * cpad = 128
    wc_small = build(Pc)     # rows = 2 srcs * cpad
    # expand carry rows to the 128-lane carry layout: src 0 (next slot 0)
    # at lanes [0, cpad); src 1 (prev slot F-1) at lanes [128-cpad, 128)
    wc = jnp.zeros((2, 2, 2, 2, LANES, 2 * LANES), jnp.float32)
    wc = wc.at[:, :, :, :, :cpad, :].set(wc_small[:, :, :, :, :cpad])
    wc = wc.at[:, :, :, :, LANES - cpad:, :].set(
        wc_small[:, :, :, :, cpad:]
    )
    return wm.astype(dtype), wc.astype(dtype)


def _kernel_upconv(*refs, G, tzf, tyf, xqf, xqc, cpad, relu, has_affine,
                   acc_dtype, quant=False, has_fmask=True):
    xrefs = refs[:G]
    i = G
    if has_fmask:
        cmask_ref, fmask_ref, wm_ref, wc_ref, ab_ref = refs[i:i + 5]
        i += 5
        dup_ref = None
    else:
        # fine mask expanded in-register from the coarse tile (one
        # exact 0/1 lane-dup GEMM); no fine-mask grid exists in HBM
        cmask_ref, wm_ref, wc_ref, ab_ref, dup_ref = refs[i:i + 5]
        i += 5
        fmask_ref = None
    if quant:
        ws_ref = refs[i]
        i += 1
    else:
        ws_ref = None
    out_ref = refs[i]
    i += 1
    if has_fmask:
        (tbuf, mbuf, obuf, zb_z, zb_y, zb_c,
         in_sems, out_sems, ring_sems) = refs[i:]
    else:
        (tbuf, obuf, zb_z, zb_y, zb_c,
         in_sems, out_sems, ring_sems) = refs[i:]
        mbuf = None
    tzc, tyc = tzf // 2, tyf // 2

    nz = pl.num_programs(1)
    ny = pl.num_programs(2)
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    k = (b * nz + iz) * ny + iy
    total = pl.num_programs(0) * nz * ny

    def in_dmas(step, slot):
        bb = step // (nz * ny)
        r = step % (nz * ny)
        zc0 = (r // ny) * tzc
        yc0 = (r % ny) * tyc
        zf0 = (r // ny) * tzf
        yf0 = (r % ny) * tyf
        dmas = []
        for g in range(G):
            dmas.append(pltpu.make_async_copy(
                xrefs[g].at[bb, pl.ds(zc0, tzc + 2), pl.ds(yc0, tyc + 2),
                            :, :],
                tbuf.at[slot, g],
                in_sems.at[slot, g],
            ))
        dmas.append(pltpu.make_async_copy(
            cmask_ref.at[bb, pl.ds(zc0, tzc + 2), pl.ds(yc0, tyc + 2), :, :],
            tbuf.at[slot, G],
            in_sems.at[slot, G],
        ))
        if has_fmask:
            dmas.append(pltpu.make_async_copy(
                fmask_ref.at[bb, pl.ds(1 + zf0, tzf), pl.ds(1 + yf0, tyf),
                             :, :],
                mbuf.at[slot],
                in_sems.at[slot, G + 1],
            ))
        return dmas

    @pl.when(k == 0)
    def _():
        for d in in_dmas(0, 0):
            d.start()

    @pl.when(k + 1 < total)
    def _():
        for d in in_dmas(k + 1, (k + 1) % 2):
            d.start()

    @pl.when(k > 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[k % 2], obuf.at[k % 2], out_sems.at[k % 2]
        ).wait()

    for d in in_dmas(k, k % 2):
        d.wait()

    slot = k % 2
    cm = tbuf[slot, G]
    rows_c = tzc * tyc * xqc
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, LANES), 3)
    # per-(pz, py) fine-parity accumulators over the coarse tile
    subs = []
    ts, carries, scales = [], [], []
    for g in range(G):
        t = tbuf[slot, g]
        if has_affine:
            tf = t.astype(jnp.float32) * ab_ref[0, g] + ab_ref[1, g]
            if relu:
                tf = jnp.maximum(tf, 0.0)
            tf = tf * cm.astype(jnp.float32)
            t = tf.astype(t.dtype)
        elif quant:
            tf = t.astype(jnp.float32)
        if quant:
            amax = jnp.max(jnp.abs(tf))
            scale = jnp.maximum(amax, 1e-8) / 127.0
            t = jnp.clip(
                jnp.round(tf * (1.0 / scale)), -127.0, 127.0
            ).astype(jnp.int8)
            scales.append(scale)
        zrow = jnp.zeros_like(t[:, :, :1])
        nxt = jnp.concatenate([t[:, :, 1:], zrow], axis=2)
        prv = jnp.concatenate([zrow, t[:, :, :-1]], axis=2)
        ts.append(t)
        carries.append(jnp.where(lane < cpad, nxt, prv))
    for pz in range(2):
        for py in range(2):
            acc = jnp.zeros((rows_c, 2 * LANES),
                            jnp.float32 if quant else acc_dtype)
            for g in range(G):
                if quant:
                    gacc = jnp.zeros((rows_c, 2 * LANES), jnp.int32)
                else:
                    gacc = None
                for ez in range(2):
                    for ey in range(2):
                        lhs_m = ts[g][
                            pz + ez:pz + ez + tzc, py + ey:py + ey + tyc
                        ].reshape(rows_c, LANES)
                        lhs_c = carries[g][
                            pz + ez:pz + ez + tzc, py + ey:py + ey + tyc
                        ].reshape(rows_c, LANES)
                        if quant:
                            gacc = gacc + jnp.dot(
                                lhs_m, wm_ref[g, pz, py, ez, ey],
                                preferred_element_type=jnp.int32,
                            )
                            gacc = gacc + jnp.dot(
                                lhs_c, wc_ref[g, pz, py, ez, ey],
                                preferred_element_type=jnp.int32,
                            )
                        else:
                            acc = acc + jnp.dot(
                                lhs_m, wm_ref[g, pz, py, ez, ey],
                                preferred_element_type=acc_dtype,
                            )
                            acc = acc + jnp.dot(
                                lhs_c, wc_ref[g, pz, py, ez, ey],
                                preferred_element_type=acc_dtype,
                            )
                if quant:
                    acc = acc + gacc.astype(jnp.float32) * (
                        scales[g] * ws_ref[g]
                    )
            # [rows_c, 256] -> fine blocks [tzc, tyc, 2 xqc, 128] -> crop
            sub = acc.reshape(tzc, tyc, xqc * 2, LANES)[:, :, :xqf]
            subs.append(sub)
    if not has_fmask:
        # mco[q, qy] == fine mask at every (2q+pz, 2qy+py): multiply the
        # parity accumulators by the SAME dup'd coarse interior (0/1
        # one-hot GEMM — exact in any dtype), bitwise-equal to the
        # composed fine-mask multiply
        mco = jnp.dot(
            cm[1:1 + tzc, 1:1 + tyc].reshape(rows_c, LANES),
            dup_ref[...].astype(cm.dtype),
            preferred_element_type=acc_dtype,
        ).reshape(tzc, tyc, xqc * 2, LANES)[:, :, :xqf]
        subs = [s * mco for s in subs]
    full = jnp.stack(subs).reshape(2, 2, tzc, tyc, xqf, LANES)
    full = full.transpose(2, 0, 3, 1, 4, 5).reshape(tzf, tyf, xqf, LANES)
    if has_fmask:
        full = full * mbuf[slot].astype(acc_dtype)
    obuf[slot] = full.astype(out_ref.dtype)
    pltpu.make_async_copy(
        obuf.at[slot],
        out_ref.at[b, pl.ds(1 + iz * tzf, tzf), pl.ds(1 + iy * tyf, tyf),
                   :, :],
        out_sems.at[slot],
    ).start()

    # ---- zero halo ring (edge programs; disjoint regions)
    Zp = out_ref.shape[1]
    Yp = out_ref.shape[2]
    zb_z[...] = jnp.zeros_like(zb_z)
    zb_y[...] = jnp.zeros_like(zb_y)
    zb_c[...] = jnp.zeros_like(zb_c)

    def ring(cond, src, dst_slice, sem_i):
        @pl.when(cond)
        def _():
            d = pltpu.make_async_copy(src, dst_slice, ring_sems.at[sem_i])
            d.start()
            d.wait()

    ring(iz == 0, zb_z,
         out_ref.at[b, pl.ds(0, 1), pl.ds(1 + iy * tyf, tyf), :, :], 0)
    ring(iz == nz - 1, zb_z,
         out_ref.at[b, pl.ds(Zp - 1, 1), pl.ds(1 + iy * tyf, tyf), :, :], 1)
    ring(iy == 0, zb_y,
         out_ref.at[b, pl.ds(1 + iz * tzf, tzf), pl.ds(0, 1), :, :], 2)
    ring(iy == ny - 1, zb_y,
         out_ref.at[b, pl.ds(1 + iz * tzf, tzf), pl.ds(Yp - 1, 1), :, :], 3)
    ring((iz == 0) & (iy == 0), zb_c,
         out_ref.at[b, pl.ds(0, 1), pl.ds(0, 1), :, :], 4)
    ring((iz == 0) & (iy == ny - 1), zb_c,
         out_ref.at[b, pl.ds(0, 1), pl.ds(Yp - 1, 1), :, :], 5)
    ring((iz == nz - 1) & (iy == 0), zb_c,
         out_ref.at[b, pl.ds(Zp - 1, 1), pl.ds(0, 1), :, :], 6)
    ring((iz == nz - 1) & (iy == ny - 1), zb_c,
         out_ref.at[b, pl.ds(Zp - 1, 1), pl.ds(Yp - 1, 1), :, :], 7)

    @pl.when(k == total - 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[slot], obuf.at[slot], out_sems.at[slot]
        ).wait()

    @pl.when((k == total - 2) & (total > 1))
    def _():
        pltpu.make_async_copy(
            obuf.at[slot], obuf.at[slot], out_sems.at[slot]
        ).wait()


def _pick_tiles_upconv(Zf, Yf, xqf, xqc, G, itemsize,
                       budget_bytes=12_000_000):
    """(tzf, tyf) for the fused upsample-conv under the VMEM budget: fine
    mask/out/assembly buffers + coarse DMA tiles + the [G, 16, 128, 256]
    folded weights (the dominant fixed cost)."""
    best = (2, 2)
    wbytes = G * 2 * 16 * LANES * 2 * LANES * itemsize
    for tzf in (16, 12, 8, 6, 4, 2):
        if Zf % tzf or tzf % 2:
            continue
        for tyf in (32, 24, 16, 12, 8, 6, 4, 2):
            if Yf % tyf or tyf % 2:
                continue
            tzc, tyc = tzf // 2, tyf // 2
            Tf = tzf * tyf * xqf * LANES
            Tc = (tzc + 2) * (tyc + 2) * xqc * LANES
            cost = wbytes
            cost += 2 * 2 * Tf * itemsize          # mbuf + obuf (2 slots)
            cost += 2 * (G + 1) * Tc * itemsize    # coarse tbuf
            cost += Tc * (4 + 3 * itemsize)        # affine f32 + shifts
            cost += tzc * tyc * xqc * 2 * LANES * 4  # f32 accumulator
            cost += Tf * (4 + itemsize)            # parity stack + mask f32
            cost += (tzf + tyf + 1) * xqf * LANES * itemsize  # ring bufs
            if cost <= budget_bytes and tzf * tyf > best[0] * best[1]:
                best = (tzf, tyf)
    return best


def prep_upconv_weights(w27s: list, cpad: int, dt, quantize: bool) -> dict:
    """Kernel-ready upsample-folded weights for fused_upconv_folded
    (pad + parity fold + int8 quantization) — weight-only, hoistable
    like prep_conv_weights."""
    wms, wcs = [], []
    for w in w27s:
        K, cin, cout = w.shape
        assert K == 27 and cin <= cpad and cout <= cpad
        if cin < cpad:
            w = jnp.pad(w, ((0, 0), (0, cpad - cin), (0, 0)))
        wm, wc = _fold_upsample_weights(w, cpad, dt)
        wms.append(wm)
        wcs.append(wc)
    wm = jnp.stack(wms)  # [G, 2, 2, 2, 2, 128, 256]
    wc = jnp.stack(wcs)
    if quantize:
        amax = jnp.maximum(
            jnp.max(jnp.abs(wm.astype(jnp.float32)), axis=(1, 2, 3, 4, 5)),
            jnp.max(jnp.abs(wc.astype(jnp.float32)), axis=(1, 2, 3, 4, 5)),
        )  # [G, 256]
        ws = jnp.maximum(amax, 1e-8) / 127.0
        inv = (1.0 / ws)[:, None, None, None, None, None, :]
        wm = jnp.clip(
            jnp.round(wm.astype(jnp.float32) * inv), -127.0, 127.0
        ).astype(jnp.int8)
        wc = jnp.clip(
            jnp.round(wc.astype(jnp.float32) * inv), -127.0, 127.0
        ).astype(jnp.int8)
        return {"wm": wm, "wc": wc, "ws": ws}
    return {"wm": wm, "wc": wc}


def fused_upconv_folded(
    xs: list,            # G COARSE halo'd grids [B, Zc+2, Yc+2, xqc, 128]
    cmask: jax.Array,    # coarse mask, same shape
    fmask: jax.Array | None,  # FINE mask [B, 2Zc+2, 2Yc+2, xqf, 128];
                         # None: expand the coarse mask in-register (the
                         # NN-dup'd coarse mask IS the fine mask here —
                         # no fine-mask grid need exist in HBM)
    w27s: list | None,   # G weights [27, real_c_g, cout <= cpad]
    cpad: int,
    *,
    affines: list | None = None,
    relu: bool = True,
    quantize: bool = False,
    xqf: int | None = None,  # required when fmask is None
    prew: dict | None = None,  # prep_upconv_weights output
) -> jax.Array:
    """fmask * conv3(nn_up2(sum_g in_g')) as a halo'd FINE folded grid;
    in_g' = relu(in_g * a + b) * cmask when affines given (fused BN-eval).
    quantize: int8 GEMMs (same scheme as fused_conv_folded).
    """
    G = len(xs)
    x0 = xs[0]
    B, Zcp, Ycp, xqc, _ = x0.shape
    Zc, Yc = Zcp - 2, Ycp - 2
    Zf, Yf = 2 * Zc, 2 * Yc
    has_fmask = fmask is not None
    if has_fmask:
        _, Zfp, Yfp, xqf, _ = fmask.shape
        assert (Zfp, Yfp) == (Zf + 2, Yf + 2), (fmask.shape, x0.shape)
    else:
        assert xqf is not None
    dt = x0.dtype
    if prew is None:
        prew = prep_upconv_weights(w27s, cpad, dt, quantize)
    wm, wc, ws = prew["wm"], prew["wc"], prew.get("ws")
    assert wm.shape[0] == G
    has_affine = affines is not None
    if has_affine:
        ab = jnp.stack([
            jnp.stack([a.astype(jnp.float32), b.astype(jnp.float32)])
            for a, b in affines
        ], axis=1)
    else:
        ab = jnp.zeros((2, G, LANES), jnp.float32)

    tzf, tyf = _pick_tiles_upconv(Zf, Yf, xqf, xqc, G,
                                  jnp.dtype(dt).itemsize)
    tzc, tyc = tzf // 2, tyf // 2
    grid = (B, Zf // tzf, Yf // tyf)
    kernel = functools.partial(
        _kernel_upconv, G=G, tzf=tzf, tyf=tyf, xqf=xqf, xqc=xqc, cpad=cpad,
        relu=relu, has_affine=has_affine, acc_dtype=jnp.float32,
        quant=quantize, has_fmask=has_fmask,
    )
    w_operands = [wm, wc, ab]
    w_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wm
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wc
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ab
    ]
    if not has_fmask:
        w_operands.append(jnp.asarray(_dup_matrix_local(cpad), jnp.float32))
        w_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # dup
    if quantize:
        w_operands.append(ws)
        w_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # ws
    scratch = [
        pltpu.VMEM((2, G + 1, tzc + 2, tyc + 2, xqc, LANES), dt),
        *((pltpu.VMEM((2, tzf, tyf, xqf, LANES), dt),)   # mbuf (fine mask)
          if has_fmask else ()),
        pltpu.VMEM((2, tzf, tyf, xqf, LANES), dt),       # obuf
        pltpu.VMEM((1, tyf, xqf, LANES), dt),            # zb_z
        pltpu.VMEM((tzf, 1, xqf, LANES), dt),            # zb_y
        pltpu.VMEM((1, 1, xqf, LANES), dt),              # zb_c
        pltpu.SemaphoreType.DMA((2, G + 2 if has_fmask else G + 1)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((8,)),
    ]
    m_operands = (cmask, fmask) if has_fmask else (cmask,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        * (G + len(m_operands)) + w_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, Zf + 2, Yf + 2, xqf, LANES), dt),
        scratch_shapes=scratch,
    )(*xs, *m_operands, *w_operands)


# --------------------------------------------- fused strided downsample (v3)
#
# One kernel for the encoder/U-Net down paths: [optional eval-BN affine +
# ReLU + fine mask] -> stride-2 2^3 conv -> coarse mask (maxpool2 of the
# fine mask, computed in the SAME pass) -> masked, halo'd coarse grid.
# Replaces, per site, the XLA chain of 8 strided slices + 4 conv dots +
# 4 mask-down dots + mask multiply + 2 re-halo pads (+ the BN pass where
# the BN fed only this conv). x taps+stride are a [256 -> 128] lane matrix
# on merged fine block pairs; z/y taps+stride are leading-dim strided
# reads of the DMA'd tile. Matches scn.Convolution (2, 2) semantics
# (/root/reference/torch/model.py:44).


def _kernel_downconv(*refs, tzc, tyc, xqf, xqc, relu, has_affine,
                     cross, acc_dtype, quant=False):
    if quant:
        (x_ref, fmask_ref, w_ref, md_ref, ab_ref, ws_ref,
         out_ref, mout_ref) = refs[:8]
        rest = refs[8:]
    else:
        (x_ref, fmask_ref, w_ref, md_ref, ab_ref,
         out_ref, mout_ref) = refs[:7]
        ws_ref = None
        rest = refs[7:]
    (tbuf, obuf, mobuf, zb_z, zb_y, zb_c,
     in_sems, out_sems, ring_sems) = rest

    nz = pl.num_programs(1)
    ny = pl.num_programs(2)
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    k = (b * nz + iz) * ny + iy
    total = pl.num_programs(0) * nz * ny

    def in_dmas(step, slot):
        bb = step // (nz * ny)
        r = step % (nz * ny)
        zf0 = 1 + (r // ny) * tzc * 2
        yf0 = 1 + (r % ny) * tyc * 2
        return [
            pltpu.make_async_copy(
                x_ref.at[bb, pl.ds(zf0, 2 * tzc), pl.ds(yf0, 2 * tyc), :, :],
                tbuf.at[slot, 0], in_sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                fmask_ref.at[bb, pl.ds(zf0, 2 * tzc), pl.ds(yf0, 2 * tyc),
                             :, :],
                tbuf.at[slot, 1], in_sems.at[slot, 1],
            ),
        ]

    @pl.when(k == 0)
    def _():
        for d in in_dmas(0, 0):
            d.start()

    @pl.when(k + 1 < total)
    def _():
        for d in in_dmas(k + 1, (k + 1) % 2):
            d.start()

    @pl.when(k > 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[k % 2], obuf.at[k % 2], out_sems.at[k % 2, 0]
        ).wait()
        pltpu.make_async_copy(
            mobuf.at[k % 2], mobuf.at[k % 2], out_sems.at[k % 2, 1]
        ).wait()

    for d in in_dmas(k, k % 2):
        d.wait()

    slot = k % 2
    t = tbuf[slot, 0]   # [2 tzc, 2 tyc, xqf, 128] fine tile (no halo)
    mt = tbuf[slot, 1]
    if has_affine:
        tf = t.astype(jnp.float32) * ab_ref[0] + ab_ref[1]
        if relu:
            tf = jnp.maximum(tf, 0.0)
        tf = tf * mt.astype(jnp.float32)
        t = tf.astype(t.dtype)
    elif quant:
        tf = t.astype(jnp.float32)
    if quant:
        # same scheme as _kernel_fused: dynamic per-tile symmetric
        # activation scale x static per-column weight scales (ws_ref)
        amax = jnp.max(jnp.abs(tf))
        scale = jnp.maximum(amax, 1e-8) / 127.0
        t = jnp.clip(
            jnp.round(tf * (1.0 / scale)), -127.0, 127.0
        ).astype(jnp.int8)
    # cross mode (cpad widening): one fine block maps onto one coarse
    # block, so rows keep the 128-lane width and blocks map 1:1
    lw = LANES if cross else 2 * LANES
    nb = xqf if cross else xqf // 2
    rows_c = tzc * tyc * nb
    acc = jnp.zeros((rows_c, LANES),
                    jnp.int32 if quant else acc_dtype)
    macc = jnp.zeros((rows_c, LANES), acc_dtype)
    # parity reads via reshape + static index (a [dz::2] strided slice
    # lowers to a >2D gather Mosaic rejects; this is plain slicing)
    t4 = t.reshape(tzc, 2, tyc, 2, xqf, LANES)
    mt4 = mt.reshape(tzc, 2, tyc, 2, xqf, LANES)
    for dz in range(2):
        for dy in range(2):
            lhs = t4[:, dz, :, dy].reshape(rows_c, lw)
            acc = acc + jnp.dot(
                lhs, w_ref[dz, dy],
                preferred_element_type=jnp.int32 if quant else acc_dtype,
            )
            mlhs = mt4[:, dz, :, dy].reshape(rows_c, lw)
            macc = macc + jnp.dot(
                mlhs, md_ref[0], preferred_element_type=acc_dtype
            )
    if quant:
        acc = acc.astype(jnp.float32) * (scale * ws_ref[0])
    mcoarse = jnp.minimum(macc, 1.0)
    res = (acc * mcoarse).astype(out_ref.dtype)
    mres = mcoarse.astype(mout_ref.dtype)
    # pad coarse x blocks up to xqc with zeros
    res = res.reshape(tzc, tyc, nb, LANES)
    mres = mres.reshape(tzc, tyc, nb, LANES)
    if nb < xqc:
        pad = jnp.zeros((tzc, tyc, xqc - nb, LANES), out_ref.dtype)
        res = jnp.concatenate([res, pad], axis=2)
        mres = jnp.concatenate([mres, pad.astype(mout_ref.dtype)], axis=2)
    elif nb > xqc:
        res = res[:, :, :xqc]
        mres = mres[:, :, :xqc]
    obuf[slot] = res
    mobuf[slot] = mres
    pltpu.make_async_copy(
        obuf.at[slot],
        out_ref.at[b, pl.ds(1 + iz * tzc, tzc), pl.ds(1 + iy * tyc, tyc),
                   :, :],
        out_sems.at[slot, 0],
    ).start()
    pltpu.make_async_copy(
        mobuf.at[slot],
        mout_ref.at[b, pl.ds(1 + iz * tzc, tzc), pl.ds(1 + iy * tyc, tyc),
                    :, :],
        out_sems.at[slot, 1],
    ).start()

    # ---- zero halo rings on BOTH outputs
    Zp = out_ref.shape[1]
    Yp = out_ref.shape[2]
    zb_z[...] = jnp.zeros_like(zb_z)
    zb_y[...] = jnp.zeros_like(zb_y)
    zb_c[...] = jnp.zeros_like(zb_c)

    def ring(cond, src, oref, zsl, ysl, sem_i):
        @pl.when(cond)
        def _():
            d = pltpu.make_async_copy(
                src, oref.at[b, zsl, ysl, :, :], ring_sems.at[sem_i]
            )
            d.start()
            d.wait()

    for j, oref in enumerate((out_ref, mout_ref)):
        o = 8 * j
        ring(iz == 0, zb_z, oref,
             pl.ds(0, 1), pl.ds(1 + iy * tyc, tyc), o + 0)
        ring(iz == nz - 1, zb_z, oref,
             pl.ds(Zp - 1, 1), pl.ds(1 + iy * tyc, tyc), o + 1)
        ring(iy == 0, zb_y, oref,
             pl.ds(1 + iz * tzc, tzc), pl.ds(0, 1), o + 2)
        ring(iy == ny - 1, zb_y, oref,
             pl.ds(1 + iz * tzc, tzc), pl.ds(Yp - 1, 1), o + 3)
        ring((iz == 0) & (iy == 0), zb_c, oref,
             pl.ds(0, 1), pl.ds(0, 1), o + 4)
        ring((iz == 0) & (iy == ny - 1), zb_c, oref,
             pl.ds(0, 1), pl.ds(Yp - 1, 1), o + 5)
        ring((iz == nz - 1) & (iy == 0), zb_c, oref,
             pl.ds(Zp - 1, 1), pl.ds(0, 1), o + 6)
        ring((iz == nz - 1) & (iy == ny - 1), zb_c, oref,
             pl.ds(Zp - 1, 1), pl.ds(Yp - 1, 1), o + 7)

    @pl.when(k == total - 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[slot], obuf.at[slot], out_sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            mobuf.at[slot], mobuf.at[slot], out_sems.at[slot, 1]
        ).wait()

    @pl.when((k == total - 2) & (total > 1))
    def _():
        pltpu.make_async_copy(
            obuf.at[slot], obuf.at[slot], out_sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            mobuf.at[slot], mobuf.at[slot], out_sems.at[slot, 1]
        ).wait()


def prep_downconv_weights(w8: jax.Array, cpad: int, cpad_out: int | None,
                          dt, quantize: bool) -> dict:
    """Kernel-ready strided weights + mask-down matrix for
    fused_downconv_folded — weight-only, hoistable like
    prep_conv_weights."""
    from sgnn_tpu.ops.folded import (
        _mask_down_cross, _mask_down_matrix, _strided_w, _strided_w_cross,
    )

    K, cin, cout = w8.shape
    cross = cpad_out is not None and cpad_out != cpad
    if cross:
        assert cpad_out == 2 * cpad and K == 8
        assert cin <= cpad and cout <= cpad_out
        W = _strided_w_cross(w8, cpad, cpad_out, cin, cout).astype(dt)
        MD = jnp.asarray(_mask_down_cross(cpad, cpad_out), dt)[None]
    else:
        assert K == 8 and cin <= cpad and cout <= cpad
        W = _strided_w(w8, cpad, 0, cin, cout).astype(dt)  # [2,2,256,128]
        MD = jnp.asarray(_mask_down_matrix(cpad), dt)[None]
    if quantize:
        amax = jnp.max(jnp.abs(W.astype(jnp.float32)), axis=(0, 1, 2))
        ws = (jnp.maximum(amax, 1e-8) / 127.0)[None]  # [1, 128]
        W = jnp.clip(
            jnp.round(W.astype(jnp.float32) * (1.0 / ws[0])), -127.0, 127.0
        ).astype(jnp.int8)
        return {"W": W, "MD": MD, "ws": ws}
    return {"W": W, "MD": MD}


def fused_downconv_folded(
    x: jax.Array,        # fine halo'd grid [B, Zf+2, Yf+2, xqf, 128]
    fmask: jax.Array,    # fine mask, same shape
    w8: jax.Array | None,  # [8, real_c, cout], tap order (dz, dy, dx)
    cpad: int,
    *,
    affine: tuple | None = None,  # (scale[128], bias[128]) f32
    relu: bool = True,
    cpad_out: int | None = None,  # widen the lane budget across the stride
    quantize: bool = False,  # int8 GEMMs (same scheme as fused_conv_folded)
    prew: dict | None = None,  # prep_downconv_weights output
) -> tuple[jax.Array, jax.Array]:
    """Stride-2 2^3 conv site -> (coarse masked halo'd grid, coarse mask),
    both [B, Zf/2+2, Yf/2+2, xqc, 128]. coarse mask = maxpool2(fine mask);
    the input affine (optional) applies eval-BN + ReLU + fine mask first.
    With ``cpad_out == 2 * cpad`` the output is emitted at the wider lane
    budget directly (one fine block -> one coarse block, no pair merge).
    ``quantize``: int8 conv GEMMs (dynamic per-tile activation scale,
    static per-column weight scales); the mask-down GEMM stays exact.
    """
    from sgnn_tpu.ops.folded import _xq_for

    B, Zfp, Yfp, xqf, _ = x.shape
    Zf, Yf = Zfp - 2, Yfp - 2
    Zc, Yc = Zf // 2, Yf // 2
    dt = x.dtype
    cross = cpad_out is not None and cpad_out != cpad
    if cross:
        xqc = xqf
    else:
        Xc_blocks_logical = xqf // 2
        xqc = _xq_for(Xc_blocks_logical * (LANES // cpad), cpad)
    if prew is None:
        prew = prep_downconv_weights(w8, cpad, cpad_out, dt, quantize)
    W, MD, ws = prew["W"], prew["MD"], prew.get("ws")
    has_affine = affine is not None
    if has_affine:
        ab = jnp.stack([affine[0].astype(jnp.float32),
                        affine[1].astype(jnp.float32)])
    else:
        ab = jnp.zeros((2, LANES), jnp.float32)

    # tile sizes: fine tiles are 4x the coarse tile footprint
    best = (1, 1)
    for tzc in (8, 6, 4, 3, 2, 1):
        if Zc % tzc:
            continue
        for tyc in (16, 12, 8, 6, 4, 3, 2, 1):
            if Yc % tyc:
                continue
            Tf = 4 * tzc * tyc * xqf * LANES
            Rc = tzc * tyc * xqc * LANES
            cost = 2 * 2 * Tf * 2 + 4 * Rc * 2 + Tf * (4 + 2) + 2 * Rc * 4
            if quantize:
                cost += Tf * (4 + 1) + 4 * Rc  # f32+int8 copies, i32 acc
            if cost <= 11_000_000 and tzc * tyc > best[0] * best[1]:
                best = (tzc, tyc)
    tzc, tyc = best
    grid = (B, Zc // tzc, Yc // tyc)
    kernel = functools.partial(
        _kernel_downconv, tzc=tzc, tyc=tyc, xqf=xqf, xqc=xqc,
        relu=relu, has_affine=has_affine, cross=cross,
        acc_dtype=jnp.float32, quant=quantize,
    )
    w_operands = [W, MD, ab]
    w_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # W
        pl.BlockSpec(memory_space=pltpu.VMEM),  # MD
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ab
    ]
    if quantize:
        w_operands.append(ws)
        w_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # ws
    out_shape = jax.ShapeDtypeStruct((B, Zc + 2, Yc + 2, xqc, LANES), dt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x
            pl.BlockSpec(memory_space=pl.ANY),      # fmask
        ] + w_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 2 * tzc, 2 * tyc, xqf, LANES), dt),  # tbuf
            pltpu.VMEM((2, tzc, tyc, xqc, LANES), dt),             # obuf
            pltpu.VMEM((2, tzc, tyc, xqc, LANES), dt),             # mobuf
            pltpu.VMEM((1, tyc, xqc, LANES), dt),                  # zb_z
            pltpu.VMEM((tzc, 1, xqc, LANES), dt),                  # zb_y
            pltpu.VMEM((1, 1, xqc, LANES), dt),                    # zb_c
            pltpu.SemaphoreType.DMA((2, 2)),                       # in
            pltpu.SemaphoreType.DMA((2, 2)),                       # out
            pltpu.SemaphoreType.DMA((16,)),                        # rings
        ],
    )(x, fmask, *w_operands)


# ------------------------------------------------------- fused head site (v3)
#
# One kernel for the per-voxel tail of a refinement level (and the surface
# block): [eval-BN affine + ReLU + mask] -> head linear (occ|sdf lane GEMM)
# -> occupancy gate sigmoid(occ)>0.5 -> three masked, halo'd outputs
# (post-BN feats, head outputs, new mask) + the raw f32 head grid for the
# per-level output contract. Replaces, per level, the XLA chain
# [BN pass -> linear GEMM pass -> occ-replicate GEMM pass -> 3 elementwise
# mask passes] with a single HBM round trip. The occ gate replicate rides
# the precomposed matrix Wocc = Wh @ R (bitwise equal to GEMM-then-
# replicate since R only copies the occ column). Matches the reference's
# head + sparsify step (/root/reference/torch/model.py:189-190,233-246).


def _kernel_head(*refs, G, tz, ty, xq, relu, gate, acc_dtype,
                 emit_raw=True, mask_scale=1, xqc=0):
    xrefs = refs[:G]
    mask_ref = refs[G]
    ms = mask_scale
    if ms == 1:
        wh_ref, wocc_ref, ab_ref, bias_ref = refs[G + 1:G + 5]
        dup_ref = None
        i = G + 5
    else:
        # mask_ref is the COARSE level mask; the fine mask is its
        # in-register NN expansion (exact 0/1 lane-dup GEMM + sublane
        # repeats) — the fine-mask grid never exists in HBM
        wh_ref, wocc_ref, ab_ref, bias_ref, dup_ref = refs[G + 1:G + 6]
        i = G + 6
    raw = emit_raw or not gate
    if gate:
        if raw:
            (up_ref, o2_ref, fm_ref, f32_ref) = refs[i:i + 4]
            scratch = refs[i + 4:]
            (tbuf, mbuf, upb, o2b, fmb, f32b, zb_z, zb_y, zb_c,
             in_sems, out_sems, ring_sems) = scratch
        else:
            # production inference never reads the raw f32 head grid
            # (the finest level's is 128-lane f32 — by far the largest
            # write of the whole forward); skip the buffer and the DMA
            (up_ref, o2_ref, fm_ref) = refs[i:i + 3]
            f32_ref = None
            scratch = refs[i + 3:]
            (tbuf, mbuf, upb, o2b, fmb, zb_z, zb_y, zb_c,
             in_sems, out_sems, ring_sems) = scratch
            f32b = None
        orefs = (up_ref, o2_ref, fm_ref)
        obufs = (upb, o2b, fmb)
    else:
        f32_ref = refs[i]
        scratch = refs[i + 1:]
        (tbuf, mbuf, f32b, in_sems, out_sems) = scratch
        orefs = ()
        obufs = ()

    nz = pl.num_programs(1)
    ny = pl.num_programs(2)
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    k = (b * nz + iz) * ny + iy
    total = pl.num_programs(0) * nz * ny
    bufs = (*obufs, f32b) if raw else obufs
    nout = len(bufs)

    def in_dmas(step, slot):
        bb = step // (nz * ny)
        r = step % (nz * ny)
        z0 = 1 + (r // ny) * tz
        y0 = 1 + (r % ny) * ty
        dmas = []
        for g in range(G):
            dmas.append(pltpu.make_async_copy(
                xrefs[g].at[bb, pl.ds(z0, tz), pl.ds(y0, ty), :, :],
                tbuf.at[slot, g], in_sems.at[slot, g],
            ))
        dmas.append(pltpu.make_async_copy(
            mask_ref.at[bb, pl.ds(1 + (z0 - 1) // ms, tz // ms),
                        pl.ds(1 + (y0 - 1) // ms, ty // ms), :, :],
            mbuf.at[slot], in_sems.at[slot, G],
        ))
        return dmas

    @pl.when(k == 0)
    def _():
        for d in in_dmas(0, 0):
            d.start()

    @pl.when(k + 1 < total)
    def _():
        for d in in_dmas(k + 1, (k + 1) % 2):
            d.start()

    @pl.when(k > 1)
    def _():
        for j in range(nout):
            pltpu.make_async_copy(
                bufs[j].at[k % 2], bufs[j].at[k % 2], out_sems.at[k % 2, j]
            ).wait()

    for d in in_dmas(k, k % 2):
        d.wait()

    slot = k % 2
    if ms == 1:
        mt = mbuf[slot]  # [tz, ty, xq, 128] 0/1
    else:
        mc = mbuf[slot]  # [tz/ms, ty/ms, xqc, 128] coarse 0/1
        m = jnp.dot(
            mc.reshape((tz // ms) * (ty // ms) * xqc, LANES),
            dup_ref[...].astype(mc.dtype),
            preferred_element_type=acc_dtype,
        ).reshape(tz // ms, ty // ms, xqc * 2, LANES)[:, :, :xq]
        m = jnp.repeat(m, ms, axis=0)
        m = jnp.repeat(m, ms, axis=1)
        mt = m.astype(mc.dtype)
    rows = tz * ty * xq
    acc2 = jnp.zeros((rows, LANES), acc_dtype)
    accoc = jnp.zeros((rows, LANES), acc_dtype)
    up_lhs = None
    for g in range(G):
        t = tbuf[slot, g]
        tf = t.astype(jnp.float32) * ab_ref[0, g] + ab_ref[1, g]
        if relu:
            tf = jnp.maximum(tf, 0.0)
        lhs = (tf * mt.astype(jnp.float32)).astype(t.dtype).reshape(
            rows, LANES
        )
        if gate:
            up_lhs = lhs
        acc2 = acc2 + jnp.dot(
            lhs, wh_ref[g], preferred_element_type=acc_dtype
        )
        if gate:
            accoc = accoc + jnp.dot(
                lhs, wocc_ref[g], preferred_element_type=acc_dtype
            )
    out2 = acc2 + bias_ref[0]
    if raw:
        f32b[slot] = out2.reshape(tz, ty, xq, LANES)
        pltpu.make_async_copy(
            f32b.at[slot],
            f32_ref.at[b, pl.ds(1 + iz * tz, tz), pl.ds(1 + iy * ty, ty),
                       :, :],
            out_sems.at[slot, nout - 1],
        ).start()

    if gate:
        occ_l = accoc + bias_ref[1]
        mrow = mt.reshape(rows, LANES)
        fmn = jnp.where(occ_l > 0.0, mrow, jnp.zeros_like(mrow))
        upm = (up_lhs * fmn).astype(up_ref.dtype)
        o2m = (out2.astype(o2_ref.dtype) * fmn)
        res = (upm, o2m, fmn.astype(fm_ref.dtype))
        for j in range(3):
            obufs[j][slot] = res[j].reshape(tz, ty, xq, LANES)
            pltpu.make_async_copy(
                obufs[j].at[slot],
                orefs[j].at[b, pl.ds(1 + iz * tz, tz),
                            pl.ds(1 + iy * ty, ty), :, :],
                out_sems.at[slot, j],
            ).start()

        # ---- zero halo rings on the three halo'd outputs (the f32 grid
        # is only ever unfolded, which slices the interior)
        Zp = up_ref.shape[1]
        Yp = up_ref.shape[2]
        zb_z[...] = jnp.zeros_like(zb_z)
        zb_y[...] = jnp.zeros_like(zb_y)
        zb_c[...] = jnp.zeros_like(zb_c)

        def ring(cond, src, oref, zsl, ysl, sem_i):
            @pl.when(cond)
            def _():
                d = pltpu.make_async_copy(
                    src, oref.at[b, zsl, ysl, :, :], ring_sems.at[sem_i]
                )
                d.start()
                d.wait()

        for j, oref in enumerate(orefs):
            o = 8 * j
            ring(iz == 0, zb_z, oref,
                 pl.ds(0, 1), pl.ds(1 + iy * ty, ty), o + 0)
            ring(iz == nz - 1, zb_z, oref,
                 pl.ds(Zp - 1, 1), pl.ds(1 + iy * ty, ty), o + 1)
            ring(iy == 0, zb_y, oref,
                 pl.ds(1 + iz * tz, tz), pl.ds(0, 1), o + 2)
            ring(iy == ny - 1, zb_y, oref,
                 pl.ds(1 + iz * tz, tz), pl.ds(Yp - 1, 1), o + 3)
            ring((iz == 0) & (iy == 0), zb_c, oref,
                 pl.ds(0, 1), pl.ds(0, 1), o + 4)
            ring((iz == 0) & (iy == ny - 1), zb_c, oref,
                 pl.ds(0, 1), pl.ds(Yp - 1, 1), o + 5)
            ring((iz == nz - 1) & (iy == 0), zb_c, oref,
                 pl.ds(Zp - 1, 1), pl.ds(0, 1), o + 6)
            ring((iz == nz - 1) & (iy == ny - 1), zb_c, oref,
                 pl.ds(Zp - 1, 1), pl.ds(Yp - 1, 1), o + 7)

    @pl.when(k == total - 1)
    def _():
        for j in range(nout):
            pltpu.make_async_copy(
                bufs[j].at[slot], bufs[j].at[slot], out_sems.at[slot, j]
            ).wait()

    @pl.when((k == total - 2) & (total > 1))
    def _():
        for j in range(nout):
            pltpu.make_async_copy(
                bufs[j].at[slot], bufs[j].at[slot], out_sems.at[slot, j]
            ).wait()


def fused_head_folded(
    xs: list,            # G halo'd folded grids [B, Z+2, Y+2, xq, 128]
    mask: jax.Array,     # 0/1 level mask, zero ring: same shape
                         # (mask_scale=1) or the COARSE level's grid
                         # [B, Z/2+2, Y/2+2, xqc, 128] (mask_scale=2 —
                         # expanded in-register; the fine mask never
                         # exists in HBM)
    whs: jax.Array,      # [G, 128, 128] per-group head lane matrices
    bias2: jax.Array,    # [2, 128] f32: (head bias tile, occ-replicated)
    *,
    affines: jax.Array,  # [2, G, 128] f32 (scale, bias)
    woccs: jax.Array | None = None,  # [G, 128, 128] Wh @ R (gate mode)
    relu: bool = True,
    gate: bool = True,
    emit_raw: bool = True,
    mask_scale: int = 1,
    mask_cpad: int = 16,
):
    """Fused per-voxel head site. gate=True (G==1): returns (masked
    post-BN feats bf16, masked head grid bf16, new mask bf16, raw head
    grid f32). gate=False: returns the raw f32 head grid only (surface).
    ``emit_raw=False`` (gate mode only) drops the raw f32 grid — a
    3-tuple return. Production inference never reads it, and at the
    finest level it is the single largest HBM write of the forward
    (128-lane f32); Pallas outputs are opaque to XLA DCE, so the skip
    must happen here."""
    G = len(xs)
    x0 = xs[0]
    B, Zp, Yp, xq, _ = x0.shape
    Z, Y = Zp - 2, Yp - 2
    dt = x0.dtype
    isz = jnp.dtype(dt).itemsize
    ms = mask_scale
    assert ms in (1, 2)
    xqc = mask.shape[3]
    if ms == 1:
        assert mask.shape == x0.shape, (mask.shape, x0.shape)
    else:
        assert mask.shape[1] == Z // ms + 2, (mask.shape, x0.shape)
        assert xqc * 2 >= xq
    if gate:
        assert G == 1 and woccs is not None
    else:
        woccs = jnp.zeros_like(whs)

    best = (ms, ms)
    nraw = 1 if (emit_raw or not gate) else 0
    nob = (3 * isz + 4 * nraw) if gate else 4
    for tz in (16, 12, 8, 6, 4, 3, 2, 1):
        if Z % tz or tz % ms:
            continue
        for ty in (32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
            if Y % ty or ty % ms:
                continue
            R = tz * ty * xq * LANES
            Rm = (tz // ms) * (ty // ms) * xqc * LANES
            cost = 2 * G * R * isz + 2 * Rm * isz + 2 * R * nob
            cost += R * 4 * (3 if gate else 2) + R * isz
            cost += (tz + ty + 1) * xq * LANES * isz
            cost += 3 * G * LANES * LANES * isz
            if cost <= 11_000_000 and tz * ty > best[0] * best[1]:
                best = (tz, ty)
    tz, ty = best
    assert Z % tz == 0 and Y % ty == 0, (Z, Y, tz, ty, ms)
    grid = (B, Z // tz, Y // ty)
    kernel = functools.partial(
        _kernel_head, G=G, tz=tz, ty=ty, xq=xq, relu=relu, gate=gate,
        acc_dtype=jnp.float32, emit_raw=emit_raw, mask_scale=ms, xqc=xqc,
    )
    shp = (B, Zp, Yp, xq, LANES)
    f32_shape = jax.ShapeDtypeStruct(shp, jnp.float32)
    mbuf = pltpu.VMEM((2, tz // ms, ty // ms, xqc, LANES), dt)
    if gate:
        out_shape = (
            jax.ShapeDtypeStruct(shp, dt),   # masked post-BN feats
            jax.ShapeDtypeStruct(shp, dt),   # masked head outputs
            jax.ShapeDtypeStruct(shp, dt),   # new mask
            *((f32_shape,) if emit_raw else ()),  # raw head grid
        )
        scratch = [
            pltpu.VMEM((2, G, tz, ty, xq, LANES), dt),      # tbuf
            mbuf,                                           # mask tile
            pltpu.VMEM((2, tz, ty, xq, LANES), dt),         # upb
            pltpu.VMEM((2, tz, ty, xq, LANES), dt),         # o2b
            pltpu.VMEM((2, tz, ty, xq, LANES), dt),         # fmb
            *((pltpu.VMEM((2, tz, ty, xq, LANES), jnp.float32),)
              if emit_raw else ()),                         # f32b
            pltpu.VMEM((1, ty, xq, LANES), dt),             # zb_z
            pltpu.VMEM((tz, 1, xq, LANES), dt),             # zb_y
            pltpu.VMEM((1, 1, xq, LANES), dt),              # zb_c
            pltpu.SemaphoreType.DMA((2, G + 1)),            # in
            pltpu.SemaphoreType.DMA((2, 3 + nraw)),         # out
            pltpu.SemaphoreType.DMA((24,)),                 # rings
        ]
    else:
        out_shape = f32_shape
        scratch = [
            pltpu.VMEM((2, G, tz, ty, xq, LANES), dt),
            mbuf,
            pltpu.VMEM((2, tz, ty, xq, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, G + 1)),
            pltpu.SemaphoreType.DMA((2, 1)),
        ]
    w_operands = [whs, woccs, affines, bias2]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    if ms > 1:
        w_operands.append(
            jnp.asarray(_dup_matrix_local(mask_cpad), jnp.float32)
        )
        w_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (G + 1) + w_specs,
        out_specs=(
            tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in out_shape)
            if gate else pl.BlockSpec(memory_space=pl.ANY)
        ),
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(*xs, mask, *w_operands)


# ----------------------------------- multi-scale packed surface head (v4)
#
# The surface block's input groups are the unet's pyramid levels; the
# composed path NN-upsamples the two deep groups to FULL resolution
# (ops/folded.py:upsample2_folded — at headline dims two ~117 MB bf16
# materializations, each written then re-read) and the head kernel then
# GEMMs every group at full-resolution row count. This kernel reads each
# group at its NATIVE resolution: the per-group head GEMM runs on the
# coarse rows (s^3 fewer), and the NN expansion happens in-register
# (x: one-hot lane-dup GEMMs, z/y: sublane repeats) on the GEMM RESULTS.
# The packed outputs replace the 128-lane f32 raw grid (the largest HBM
# write of the forward) with slot-resolution [B, Z, Y, xq, F] grids that
# reshape to [B, Z, Y, X] for free — no strided lane-extraction unfold
# on the fetch path. Bitwise-equal to the composed path (one-hot
# contractions run at Precision.HIGHEST; NN copies and 0/1 masks are
# exact in every dtype). Matches the reference's SurfacePrediction head
# (/root/reference/torch/model.py:257,270) + the surface export slice of
# test_scene.py:90-100.


@functools.lru_cache(maxsize=None)
def _pack_matrix(cpad: int) -> np.ndarray:
    """[128, F] one-hot: lane (slot, channel 0) -> packed slot lane."""
    F = LANES // cpad
    P = np.zeros((LANES, F), np.float32)
    for s in range(F):
        P[s * cpad, s] = 1.0
    return P


@functools.lru_cache(maxsize=None)
def _dup_matrix_local(cpad: int) -> np.ndarray:
    """[128, 256] x-dup: coarse slot s -> fine pair offsets 2s, 2s+1
    (same constant as ops/folded.py:_dup_matrix; duplicated here to keep
    this module import-independent of ops/folded)."""
    F = LANES // cpad
    M = np.zeros((LANES, 2 * LANES), np.float32)
    for s in range(F):
        for c in range(cpad):
            for px in (0, 1):
                o = 2 * s + px
                M[s * cpad + c, (o // F) * LANES + (o % F) * cpad + c] = 1
    return M


def _kernel_surfpack(*refs, G, scales, tz, ty, xq, xqs, xbs, relu):
    xrefs = refs[:G]
    mask_ref = refs[G]
    wh_ref, ab_ref, bias_ref, dup_ref = refs[G + 1:G + 5]
    out_ref = refs[G + 5]
    scr = refs[G + 6:]
    tbufs = scr[:G]
    mbuf = scr[G]
    obuf = scr[G + 1]
    in_sems, out_sems = scr[G + 2:]

    nz = pl.num_programs(1)
    ny = pl.num_programs(2)
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    k = (b * nz + iz) * ny + iy
    total = pl.num_programs(0) * nz * ny

    def in_dmas(step, slot):
        bb = step // (nz * ny)
        r = step % (nz * ny)
        z0 = (r // ny) * tz
        y0 = (r % ny) * ty
        dmas = []
        for g, s in enumerate(scales):
            dmas.append(pltpu.make_async_copy(
                xrefs[g].at[bb, pl.ds(1 + z0 // s, tz // s),
                            pl.ds(1 + y0 // s, ty // s), :, :],
                tbufs[g].at[slot], in_sems.at[slot, g],
            ))
        dmas.append(pltpu.make_async_copy(
            mask_ref.at[bb, pl.ds(1 + z0, tz), pl.ds(1 + y0, ty), :, :],
            mbuf.at[slot], in_sems.at[slot, G],
        ))
        return dmas

    @pl.when(k == 0)
    def _():
        for d in in_dmas(0, 0):
            d.start()

    @pl.when(k + 1 < total)
    def _():
        for d in in_dmas(k + 1, (k + 1) % 2):
            d.start()

    @pl.when(k > 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[k % 2], obuf.at[k % 2], out_sems.at[k % 2]
        ).wait()

    for d in in_dmas(k, k % 2):
        d.wait()

    slot = k % 2
    mt = mbuf[slot]  # [tz, ty, xq, 128] 0/1
    acc = None
    for g, s in enumerate(scales):
        t = tbufs[g][slot]  # [tz/s, ty/s, xqs_g, 128]
        tzc, tyc = tz // s, ty // s
        tf = t.astype(jnp.float32) * ab_ref[0, g] + ab_ref[1, g]
        if relu:
            tf = jnp.maximum(tf, 0.0)
        lhs = tf.astype(t.dtype)
        h = jnp.dot(
            lhs.reshape(tzc * tyc * xqs[g], LANES), wh_ref[g],
            preferred_element_type=jnp.float32,
        ).reshape(tzc, tyc, xqs[g], LANES)
        # NN-expand the per-voxel head values to the fine tile. The same
        # value lands on every child, so expansion AFTER the GEMM is
        # bitwise-equal to the composed upsample-then-GEMM path.
        xb = xbs[g]
        steps = s.bit_length() - 1
        for _ in range(steps):
            hp = jnp.dot(
                h[:, :, :xb].reshape(-1, LANES), dup_ref[...],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # one-hot x-dup: coarse slot -> fine pair offsets, exact
            xb *= 2
            h = hp.reshape(h.shape[0], h.shape[1], xb, LANES)
            h = jnp.repeat(h, 2, axis=0)
            h = jnp.repeat(h, 2, axis=1)
        if h.shape[2] < xq:
            h = jnp.pad(
                h, ((0, 0), (0, 0), (0, xq - h.shape[2]), (0, 0))
            )
        elif h.shape[2] > xq:
            h = h[:, :, :xq]
        acc = h if acc is None else acc + h
    # the composed path masks each group's activations BEFORE its GEMM;
    # with the block-diagonal head matrix and a per-voxel 0/1 mask that
    # commutes to one multiply on the summed result (bitwise: x*1 == x,
    # masked-out voxels hold exactly `bias`, matching the raw contract)
    out2 = acc * mt.astype(jnp.float32) + bias_ref[0]
    obuf[slot] = out2
    # interior-only write: the halo ring is never read (the consumer is
    # unfold, which slices the interior)
    pltpu.make_async_copy(
        obuf.at[slot],
        out_ref.at[b, pl.ds(1 + iz * tz, tz), pl.ds(1 + iy * ty, ty),
                   :, :],
        out_sems.at[slot],
    ).start()

    @pl.when(k == total - 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[slot], obuf.at[slot], out_sems.at[slot]
        ).wait()

    @pl.when((k == total - 2) & (total > 1))
    def _():
        pltpu.make_async_copy(
            obuf.at[slot], obuf.at[slot], out_sems.at[slot]
        ).wait()


def fused_surf_head_ms(
    xs: list,            # G folded grids, group g at 1/scales[g] res
    scales: tuple,       # per-group NN-upsample factor to full res (1/2/4)
    mask: jax.Array,     # FINE mask [B, Z+2, Y+2, xq, 128], 0/1
    whs: jax.Array,      # [G, 128, 128] per-group head lane matrices
    bias_t: jax.Array,   # [128] f32 head bias tile
    cpad: int,
    *,
    affines: jax.Array,  # [2, G, 128] f32 (scale, bias)
    relu: bool = True,
):
    """Multi-scale surface head -> halo'd folded f32 grid.

    Each group's head GEMM runs on its NATIVE (coarse) rows — s^3 fewer
    for a scale-s group — and the NN expansion to full resolution happens
    in-register on the GEMM RESULTS (x: one-hot lane-dup GEMMs at
    Precision.HIGHEST, z/y: sublane repeats), so the upsampled group
    grids never exist in HBM. Bitwise-equal to
    [upsample2_folded* -> fused_head_folded(gate=False)] on the interior;
    the halo ring is NOT written (the only consumer, unfold, slices the
    interior). Output lanes match the composed path (the sdf value on
    each slot's channel-0 lane, bias-only on dead/masked lanes).
    """
    G = len(xs)
    assert len(scales) == G and scales[0] == 1
    B, Zp, Yp, xq, _ = mask.shape
    Z, Y = Zp - 2, Yp - 2
    dt = xs[0].dtype
    smax = max(scales)
    xqs = []
    for x, s in zip(xs, scales):
        assert x.shape[0] == B and x.shape[1] == Z // s + 2, (
            x.shape, (B, Z, s)
        )
        xqs.append(x.shape[3])
    # real (non-tail-pad) block count per group: the expansion doubles it
    # per step and the result must cover the fine grid's real blocks.
    # The scale-1 group's own grid defines xq; coarser grids may carry
    # tail-pad blocks beyond xq // s (xq rounds up to 8) — never read.
    xbs = [-(-xq // s) for s in scales]
    for g in range(G):
        assert xbs[g] <= xqs[g], (g, xbs[g], xqs[g], scales)

    best = (smax, smax)
    isz = jnp.dtype(dt).itemsize
    for tz in (16, 12, 8, 4):
        if Z % tz or tz % smax:
            continue
        for ty in (32, 24, 16, 8, 4):
            if Y % ty or ty % smax:
                continue
            R = tz * ty * xq
            cost = 2 * R * LANES * isz          # mask tiles (2 slots)
            for g, s in enumerate(scales):
                cost += 2 * (tz // s) * (ty // s) * xqs[g] * LANES * isz
            cost += R * LANES * 4 * 2           # acc f32 + expand temps
            cost += 2 * R * LANES * 4           # f32 obuf (2 slots)
            cost += G * LANES * LANES * isz + LANES * 2 * LANES * 4
            if cost <= 11_000_000 and tz * ty > best[0] * best[1]:
                best = (tz, ty)
    tz, ty = best
    assert Z % tz == 0 and Y % ty == 0, (Z, Y, tz, ty, smax)
    grid = (B, Z // tz, Y // ty)
    kernel = functools.partial(
        _kernel_surfpack, G=G, scales=tuple(scales), tz=tz, ty=ty, xq=xq,
        xqs=tuple(xqs), xbs=tuple(xbs), relu=relu,
    )
    dup = jnp.asarray(_dup_matrix_local(cpad), jnp.float32)
    scratch = [
        *[pltpu.VMEM((2, tz // s, ty // s, xqs[g], LANES), dt)
          for g, s in enumerate(scales)],
        pltpu.VMEM((2, tz, ty, xq, LANES), dt),      # mask tiles
        pltpu.VMEM((2, tz, ty, xq, LANES), jnp.float32),  # obuf
        pltpu.SemaphoreType.DMA((2, G + 1)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (G + 1) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # affines
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dup
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, Zp, Yp, xq, LANES),
                                       jnp.float32),
        scratch_shapes=scratch,
    )(*xs, mask, whs, affines, bias_t[None], dup)

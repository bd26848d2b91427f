"""Folded (lane-dense) grid representation and ops.

THE core TPU layout decision of this framework. XLA:TPU tiles a
channels-last [B, Z, Y, X, C] array with C in the 128-lane minor
dimension; for SG-NN's narrow channels (C = 1..16) that physically
inflates every buffer 8-128x and makes every elementwise pass and layout
copy pay the inflation (measured in round 2: a whole-scene forward spent
~200 ms in elementwise fusions + 50 ms in layout copies that are ~0.5 ms
of real bandwidth). The fix is representational: fold F = 128/C voxels
along x into the lane dimension,

    fgrid [B, Z+2, Y+2, xq, 128]     lane l = xi * cpad + c

so every vector register is fully dense. All ops below stay in this
layout end-to-end:

  * 3^3 submanifold convs run in the lane-folded Pallas kernel
    (ops/pallas/conv3d_folded.py), whose operands/results are this exact
    layout — zero boundary relayouts.
  * stride-2 convs, 2x upsampling, channel-mixing linears, and occupancy
    broadcasts are LANE-ALGEBRA: constant 0/1 (or weight-derived) 128- or
    256-wide matrices applied on the MXU, plus leading-dim (z, y) slicing
    that costs only address arithmetic.
  * batch norm reduces to [128] lane moments folded to [C] by a reshape.

Conventions:
  * cpad in {8, 16, 32} is the per-voxel lane budget; real_c <= cpad
    channels are live, dead lanes are kept at 0.0 by construction.
  * a one-voxel zero HALO ring in z and y is part of the buffer (so the
    conv kernel never needs an XLA-side pad), and the x-block dim is
    padded to xq = roundup(ceil(X/F), 8) with zero tail blocks. Every op
    here preserves halo/tail/dead-lane zeros.
  * masks are FGrids too, with the voxel's 0/1 value replicated across
    its cpad lanes (so data * mask.data needs no lane arithmetic).

The reference has no counterpart — this replaces SparseConvNet's
coordinate-list machinery (/root/reference/torch/model.py:7) with a
formulation the TPU vector/matrix units execute at full width.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


# -------------------------------------------------- prepared serving weights
#
# A device trace of the headline forward (BENCH_NOTES round-5 roofline
# table) showed ~1.3 ms/forward of pure weight preparation re-running on
# device every call: tap-fold einsums (conv/upconv), strided-weight DUS
# chains (downconv), int8 weight quantization, and the BN eval-affine
# builds. All of it depends only on (params, stats, cfg) — never on the
# scene — so serving hoists it: models/folded_flow.py:
# prepare_folded_weights() runs the forward once in RECORD mode (each
# fused site computes its kernel-ready weight pytree, appends it here,
# and returns a zeros dummy instead of running its Pallas kernel), and
# production forwards then run in USE mode, consuming the prepared list
# as ordinary jit inputs. Order is the forward's deterministic site-call
# order, so record and use must run with identical cfg/flag branches.

class _PrepState:
    __slots__ = ("mode", "items", "i")

    def __init__(self, mode, items=None):
        assert mode in ("record", "use")
        self.mode = mode
        self.items = list(items) if items is not None else []
        self.i = 0


_prep_state: _PrepState | None = None


def _prep_site(build):
    """(prepared_weights, skip_kernel) for one fused-site call.

    ``build``: zero-arg closure computing the site's kernel-ready weight
    pytree. Inline (no prep): build and run. Record: build, stash, skip
    the kernel (caller returns dummies). Use: consume the next stashed
    pytree without building."""
    s = _prep_state
    if s is None:
        return build(), False
    if s.mode == "record":
        v = build()
        s.items.append(v)
        return v, True
    assert s.i < len(s.items), (
        f"prep stream exhausted at site {s.i}: the prepared list was "
        f"built with different cfg/flags than this forward"
    )
    v = s.items[s.i]
    s.i += 1
    return v, False


def _prep_recording() -> bool:
    return _prep_state is not None and _prep_state.mode == "record"


def _round_up(v, m):
    return ((v + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("data",),
    meta_fields=("dims", "real_c", "cpad"),
)
@dataclasses.dataclass
class FGrid:
    """A folded grid. data [B, Z+2, Y+2, xq, 128]; see module docstring."""
    data: jax.Array
    dims: tuple  # logical (Z, Y, X)
    real_c: int
    cpad: int

    @property
    def fold(self):
        return LANES // self.cpad

    @property
    def xb(self):
        return -(-self.dims[2] // self.fold)  # ceil

    @property
    def batch(self):
        return self.data.shape[0]

    def with_data(self, data):
        return FGrid(data, self.dims, self.real_c, self.cpad)


def _xq_for(X, cpad):
    return _round_up(-(-X // (LANES // cpad)), 8)


# ------------------------------------------------------------ fold / unfold


def fold(dense: jax.Array, cpad: int = 16) -> FGrid:
    """[B, Z, Y, X, C] -> FGrid (adds halo, x tail, dead lanes)."""
    B, Z, Y, X, C = dense.shape
    F = LANES // cpad
    xb = -(-X // F)
    xq = _xq_for(X, cpad)
    x = dense
    if C < cpad:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, cpad - C),))
    if xb * F > X:
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, xb * F - X), (0, 0)))
    d = x.reshape(B, Z, Y, xb, LANES)
    d = jnp.pad(d, ((0, 0), (1, 1), (1, 1), (0, xq - xb), (0, 0)))
    return FGrid(d, (Z, Y, X), C, cpad)


def unfold(fg: FGrid) -> jax.Array:
    """FGrid -> [B, Z, Y, X, real_c].

    Order matters: the lane split (xq, 128) -> (xq*F, cpad) is a
    contiguous trailing-dim reshape — a free bitcast on the FULL array —
    so reshaping FIRST leaves ONE strided slice that XLA lowers as a
    single gather of the live bytes. Slicing first (the naive order)
    materializes the interior copy at full 128-lane width before the
    lane extraction: ~16x the HBM traffic at real_c=1 (measured 2.2 ms
    -> ~0.3 ms per forward on the surf/mask unfolds, BENCH_NOTES r3).
    """
    Z, Y, X = fg.dims
    B = fg.batch
    Zp, Yp = fg.data.shape[1], fg.data.shape[2]
    d = fg.data.reshape(B, Zp, Yp, fg.data.shape[3] * fg.fold, fg.cpad)
    return d[:, 1:Z + 1, 1:Y + 1, :X, :fg.real_c]


def fold_mask(mask: jax.Array, cpad: int = 16, dtype=jnp.bfloat16) -> FGrid:
    """[B, Z, Y, X] bool -> 0/1 FGrid replicated across each voxel's lanes."""
    m = jnp.broadcast_to(
        mask[..., None].astype(dtype), (*mask.shape, cpad)
    )
    return fold(m, cpad)


def scatter_sparse(
    locs: jax.Array,     # [cap, 4] zyxb, -1 padded
    feats: jax.Array,    # [cap, Cin]
    num_valid: jax.Array,
    dims: tuple,         # (Z, Y, X)
    batch_size: int,
    cpad: int = 16,
    dtype=jnp.bfloat16,
    feat_bound: float | None = None,
    presorted: bool = False,
) -> tuple[FGrid, FGrid]:
    """Sparse rows -> (feature FGrid, mask FGrid), the input boundary of
    the folded execution (replaces sparse_to_dense + fold; the reference's
    scn.InputLayer, model.py:31).

    TPU scatter costs ~10 ns per update row regardless of width, so the
    scatter COUNT is the cost. With ``feat_bound`` B (a static bound with
    |feats| < B, e.g. the SDF truncation) and Cin == 1, features and mask
    are ONE f32 scatter: value = feat + K (K = next pow2 > B, so valid
    voxels are strictly positive and the f32 bias round-trip loses only
    ulp(K)/2 ~ 5e-7); the mask is decoded by sign and the bias removed in
    one cheap grid pass. Without ``feat_bound``: two scatters (exact).

    On TPU that single scatter runs as the binned Pallas kernel
    (ops/pallas/scatter_folded.py) — MXU one-hot contractions instead of
    XLA's ~35 ns/update lowering. ``presorted=True`` asserts rows are
    already in (b, z, y, x) C-order with all padding at the tail
    (np.nonzero-derived dataset rows), skipping the device sort.
    """
    Z, Y, X = dims
    F = LANES // cpad
    if _prep_recording():
        # weight-prep record pass: no weights here, skip the kernel
        xq = _xq_for(X, cpad)
        z5 = jnp.zeros((batch_size, Z + 2, Y + 2, xq, LANES), dtype)
        return (FGrid(z5, dims, feats.shape[1], cpad),
                FGrid(z5, dims, cpad, cpad))
    xq = _xq_for(X, cpad)
    B = batch_size
    cap, Cin = feats.shape
    z, y, x, b = locs[:, 0], locs[:, 1], locs[:, 2], locs[:, 3]
    valid = jnp.arange(cap) < num_valid
    # one update per row (input voxels are unique): XLA lowers scatter via
    # sort, so keep the update count at cap, not cap * lanes
    assert Cin <= cpad
    # Scatter DIRECTLY into the folded layout's flat index space (lane
    # l = (x % F) * cpad + c), 1-D buffers only: a [nslots, C] scatter
    # target gets its minor dim lane-padded C -> 128 by XLA:TPU, which
    # physically inflates the buffer (and every pass over it) ~128/C x —
    # measured as the dominant input-boundary cost. 1-D buffers tile
    # dense; the reshape to [B, Z+2, Y+2, xq, 128] is layout-free.
    base = ((((b * (Z + 2) + z + 1) * (Y + 2) + y + 1) * xq + x // F)
            * LANES + (x % F) * cpad)
    base = jnp.where(valid, base, jnp.int32(-(1 << 30)))
    nflat = B * (Z + 2) * (Y + 2) * xq * LANES
    shape5 = (B, Z + 2, Y + 2, xq, LANES)
    if feat_bound is not None and Cin == 1:
        K = float(2 ** int(np.ceil(np.log2(feat_bound + 1e-6))))
        if K <= feat_bound:
            K *= 2.0
        # scatter into a SLOT-resolution buffer (one f32 per voxel slot,
        # 1/cpad the bytes of the lane-padded grid): scatter cost scales
        # with the zero-initialized target it materializes; the expansion
        # to full lanes is a zero-pad + reshape (features: slot s -> lane
        # s*cpad) and a broadcast + reshape (mask), one output pass each
        base_s = (((b * (Z + 2) + z + 1) * (Y + 2) + y + 1) * xq * F
                  + x)
        base_s = jnp.where(valid, base_s, jnp.int32(-(1 << 30)))
        nsmall = B * (Z + 2) * (Y + 2) * xq * F
        from sgnn_tpu.ops.pallas.scatter_folded import (
            scatter_slots_folded, supported_scatter,
        )

        use_kernel = (
            jax.default_backend() == "tpu"
            and not os.environ.get("SGNN_NO_SCATTERK")
            and supported_scatter(Z + 2, Y + 2, xq, F)
        )
        if use_kernel:
            enc = scatter_slots_folded(
                base_s, feats[:, 0].astype(jnp.float32) + K,
                B * (Z + 2), (Y + 2) * xq * F, presorted=presorted,
            ).reshape(B, Z + 2, Y + 2, xq, F)
        else:
            enc = jnp.zeros((nsmall,), jnp.float32).at[base_s].set(
                feats[:, 0].astype(jnp.float32) + K,
                mode="drop", unique_indices=True,
            ).reshape(B, Z + 2, Y + 2, xq, F)
        occ = enc > 0
        small = (enc - K * occ).astype(dtype)
        ms = occ.astype(dtype)
        # expand slot s -> lane s*cpad (features: zeros on channel lanes
        # c>0) / all lanes of the slot (mask): pure pad/broadcast +
        # reshape over the minor dims, one output pass each
        data = jnp.pad(
            small[..., None], ((0, 0),) * 5 + ((0, cpad - 1),)
        ).reshape(shape5)
        mdata = jnp.broadcast_to(
            ms[..., None], (*ms.shape, cpad)
        ).reshape(shape5)
        return (
            FGrid(data, dims, Cin, cpad),
            FGrid(mdata, dims, cpad, cpad),
        )
    else:
        if Cin == 1:
            fflat = jnp.zeros((nflat,), dtype).at[base].set(
                feats[:, 0].astype(dtype), mode="drop", unique_indices=True
            )
        else:
            idx = (base[:, None] + jnp.arange(Cin)[None, :]).reshape(-1)
            fflat = jnp.zeros((nflat,), dtype).at[idx].set(
                feats.astype(dtype).reshape(-1), mode="drop",
                unique_indices=True,
            )
        data = fflat.reshape(shape5)
        mflat = jnp.zeros((nflat,), dtype).at[base].set(
            jnp.ones((cap,), dtype), mode="drop", unique_indices=True
        )
        m0 = mflat.reshape(shape5)
    # mask: 1.0 at each voxel's lane 0, replicated to all cpad lanes with
    # one constant lane-GEMM (same matrix as the occupancy broadcast)
    R = jnp.asarray(_occ_replicate(cpad), dtype)
    mdata = jax.lax.dot_general(
        m0, R,
        dimension_numbers=(((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    return (
        FGrid(data, dims, Cin, cpad),
        FGrid(mdata, dims, cpad, cpad),
    )


# -------------------------------------------------------- constant matrices


@lru_cache(maxsize=None)
def _dup_matrix(cpad: int) -> np.ndarray:
    """[128, 256]: coarse slot s -> fine pair-offsets 2s, 2s+1 (x-double)."""
    F = LANES // cpad
    M = np.zeros((LANES, 2 * LANES), np.float32)
    for s in range(F):
        for c in range(cpad):
            for px in (0, 1):
                o = 2 * s + px
                M[s * cpad + c, (o // F) * LANES + (o % F) * cpad + c] = 1
    return M


@lru_cache(maxsize=None)
def _occ_replicate(cpad: int) -> np.ndarray:
    """[128, 128]: lane (s, 0) broadcast to lanes (s, *)."""
    F = LANES // cpad
    M = np.zeros((LANES, LANES), np.float32)
    for s in range(F):
        for c in range(cpad):
            M[s * cpad, s * cpad + c] = 1
    return M


@lru_cache(maxsize=None)
def _mask_down_matrix(cpad: int) -> np.ndarray:
    """[256, 128]: fine pair-offset o -> coarse slot o//2 (any lane of the
    voxel -> all lanes of the coarse voxel). Used with clamp for maxpool2
    of 0/1 masks."""
    F = LANES // cpad
    M = np.zeros((2 * LANES, LANES), np.float32)
    for o in range(2 * F):
        i = o // 2
        for c in range(cpad):
            for c2 in range(cpad):
                M[(o // F) * LANES + (o % F) * cpad + c, i * cpad + c2] = 1
    return M


def _linear_tile(W: jax.Array, cpad: int, cout: int) -> jax.Array:
    """[Cin, Cout] -> [128, 128] block-diagonal over fold slots."""
    F = LANES // cpad
    cin = W.shape[0]
    base = jnp.zeros((cpad, cpad), jnp.float32)
    base = base.at[:cin, :cout].set(W.astype(jnp.float32))
    return jax.scipy.linalg.block_diag(*([base] * F))


def _strided_w(w8: jax.Array, cpad: int, cin_off: int, cin_g: int,
               cout: int) -> jax.Array:
    """w8 [8, Cin_total, Cout] tap block (dz, dy) x-pair matrices:
    returns [2, 2, 256, 128] mapping fine pair lanes -> coarse lanes."""
    F = LANES // cpad
    w = w8[:, cin_off:cin_off + cin_g, :].astype(jnp.float32)
    out = jnp.zeros((2, 2, 2 * LANES, LANES), jnp.float32)
    for dz in range(2):
        for dy in range(2):
            for dx in range(2):
                tap = dz * 4 + dy * 2 + dx
                for i in range(F):
                    o = 2 * i + dx
                    r0 = (o // F) * LANES + (o % F) * cpad
                    out = out.at[
                        dz, dy, r0:r0 + cin_g, i * cpad:i * cpad + cout
                    ].set(w[tap])
    return out


# ------------------------------------------------------------- grid algebra


def _rehalo(interior: jax.Array, xq: int) -> jax.Array:
    """[B, Z, Y, xb', 128] -> halo-padded [B, Z+2, Y+2, xq, 128]."""
    pad_x = xq - interior.shape[3]
    return jnp.pad(
        interior, ((0, 0), (1, 1), (1, 1), (0, pad_x), (0, 0))
    )


def _pairs(x: jax.Array) -> jax.Array:
    """[..., n, 128] -> [..., n//2, 256] merging consecutive x-blocks."""
    s = x.shape
    return x.reshape(*s[:-2], s[-2] // 2, 2 * LANES)


def _unpairs(x: jax.Array) -> jax.Array:
    s = x.shape
    return x.reshape(*s[:-2], s[-2] * 2, LANES)


def mask_and(a: FGrid, b: FGrid) -> FGrid:
    return a.with_data(a.data * b.data)


def strided_conv_folded(groups: list, w8: jax.Array, cout: int) -> FGrid:
    """Stride-2 2^3 convolution of grouped FGrids -> coarse FGrid.

    z/y taps+stride are leading-dim strided slices; the x tap+stride is a
    [256 -> 128] lane matrix on merged fine block pairs (all MXU work).
    Matches ops/conv.py:strided_conv3d_down semantics (scn.Convolution
    (2, 2), /root/reference/torch/model.py:44).
    """
    fg0 = groups[0]
    Z, Y, X = fg0.dims
    Zc, Yc, Xc = Z // 2, Y // 2, X // 2
    cpad = fg0.cpad
    xqc = _xq_for(Xc, cpad)
    acc = None
    off = 0
    for fg in groups:
        dt = fg.data.dtype
        for dz in range(2):
            for dy in range(2):
                sl = fg.data[
                    :, 1 + dz:1 + dz + 2 * Zc:2, 1 + dy:1 + dy + 2 * Yc:2
                ]
                p = _pairs(sl)  # [B, Zc, Yc, xq/2, 256]
                W = _strided_w(w8, cpad, off, fg.real_c, cout)[dz, dy]
                y = jax.lax.dot_general(
                    p, W.astype(dt),
                    dimension_numbers=(((4,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = y if acc is None else acc + y
        off += fg.real_c
    acc = acc.astype(groups[0].data.dtype)
    nb = acc.shape[3]
    if nb < xqc:
        acc = jnp.pad(acc, ((0, 0),) * 3 + ((0, xqc - nb), (0, 0)))
    elif nb > xqc:
        acc = acc[:, :, :, :xqc]
    return FGrid(_rehalo(acc, xqc), (Zc, Yc, Xc), cout, cpad)


def mask_down_folded(fm: FGrid) -> FGrid:
    """maxpool2 of a 0/1 mask FGrid (any active child -> active parent)."""
    Z, Y, X = fm.dims
    Zc, Yc, Xc = Z // 2, Y // 2, X // 2
    cpad = fm.cpad
    xqc = _xq_for(Xc, cpad)
    M = jnp.asarray(_mask_down_matrix(cpad), fm.data.dtype)
    acc = None
    for dz in range(2):
        for dy in range(2):
            sl = fm.data[
                :, 1 + dz:1 + dz + 2 * Zc:2, 1 + dy:1 + dy + 2 * Yc:2
            ]
            y = jax.lax.dot_general(
                _pairs(sl), M,
                dimension_numbers=(((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    acc = jnp.minimum(acc, 1.0).astype(fm.data.dtype)
    nb = acc.shape[3]
    if nb < xqc:
        acc = jnp.pad(acc, ((0, 0),) * 3 + ((0, xqc - nb), (0, 0)))
    elif nb > xqc:
        acc = acc[:, :, :, :xqc]
    return FGrid(_rehalo(acc, xqc), (Zc, Yc, Xc), cpad, cpad)


def upsample2_folded(fg: FGrid) -> FGrid:
    """2x nearest-neighbor upsample (z/y: leading repeats; x: lane dup)."""
    Z, Y, X = fg.dims
    Zf, Yf, Xf = Z * 2, Y * 2, X * 2
    cpad = fg.cpad
    xqf = _xq_for(Xf, cpad)
    i = fg.data[:, 1:Z + 1, 1:Y + 1]
    D = jnp.asarray(_dup_matrix(cpad), fg.data.dtype)
    y = jax.lax.dot_general(
        i, D, dimension_numbers=(((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(fg.data.dtype)
    y = _unpairs(y)  # [B, Z, Y, 2 xq, 128]
    y = jnp.repeat(y, 2, axis=1)
    y = jnp.repeat(y, 2, axis=2)
    if y.shape[3] > xqf:
        y = y[:, :, :, :xqf]
    return FGrid(_rehalo(y, xqf), (Zf, Yf, Xf), fg.real_c, cpad)


def linear_folded(fg: FGrid, W: jax.Array, b: jax.Array | None,
                  out_dtype=jnp.float32) -> FGrid:
    """Per-voxel channel mix: concat-groups handled by the caller summing.
    W [Cin, Cout]; output FGrid with real_c=Cout (dead lanes zero)."""
    cout = W.shape[1]
    Wt = _linear_tile(W, fg.cpad, cout).astype(fg.data.dtype)
    y = jax.lax.dot_general(
        fg.data, Wt, dimension_numbers=(((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
    if b is not None:
        F = LANES // fg.cpad
        bl = jnp.zeros((fg.cpad,), jnp.float32).at[:cout].set(
            b.astype(jnp.float32)
        )
        bt = jnp.tile(bl, F).astype(out_dtype)
        # keep halo/dead zeros: bias only lands where we later mask; the
        # caller MUST mask the result (heads always are)
        y = y + bt
    return FGrid(y, fg.dims, cout, fg.cpad)


def subm_conv_folded(groups: list, fm: FGrid, w27: jax.Array,
                     cout: int) -> FGrid:
    """Submanifold 3^3 conv of grouped FGrids: per-group lane-folded Pallas
    kernels summed, then one fused re-halo + mask multiply."""
    from sgnn_tpu.ops.pallas.conv3d_folded import conv_folded_raw

    acc = None
    off = 0
    for fg in groups:
        y = conv_folded_raw(
            fg.data, w27[:, off:off + fg.real_c, :].astype(fg.data.dtype),
            fg.cpad, fg.dims,
        )
        acc = y if acc is None else acc + y
        off += fg.real_c
    assert off == w27.shape[1], (off, w27.shape)
    fg0 = groups[0]
    out = _rehalo(acc, fg0.data.shape[3]) * fm.data
    return FGrid(out, fg0.dims, cout, fg0.cpad)


def occ_mask_folded(out_fg: FGrid, dtype=jnp.bfloat16) -> FGrid:
    """sigmoid(occ) > 0.5 as a replicated 0/1 mask FGrid; occ is channel 0
    of out_fg (model.py:233: the pruning criterion)."""
    R = jnp.asarray(_occ_replicate(out_fg.cpad), out_fg.data.dtype)
    logits = jax.lax.dot_general(
        out_fg.data, R, dimension_numbers=(((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dead lanes of out_fg are 0 -> logits 0; halo likewise. Strict >
    # keeps zeros inactive (sigmoid(x) > 0.5 <=> x > 0).
    m = (logits > 0.0).astype(dtype)
    return FGrid(m, out_fg.dims, out_fg.cpad, out_fg.cpad)


def _bn_moments(fg: FGrid, fm: FGrid, axis_name=None):
    """Masked per-channel batch moments of a folded grid (f32):
    (mean[C], var[C], count). Differentiable XLA reductions; psum over
    the DP axis when given (BN over the global batch)."""
    C = fg.real_c
    cpad = fg.cpad
    F = LANES // cpad
    xf = fg.data.astype(jnp.float32) * fm.data.astype(jnp.float32)
    s = jnp.sum(xf, axis=(0, 1, 2, 3))            # [128]
    sq = jnp.sum(xf * xf, axis=(0, 1, 2, 3))
    cnt = jnp.sum(fm.data.astype(jnp.float32)) / cpad
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        sq = jax.lax.psum(sq, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    mean_c = (s.reshape(F, cpad).sum(0) / cnt)[:C]
    var_c = jnp.maximum(
        (sq.reshape(F, cpad).sum(0) / cnt)[:C] - mean_c * mean_c, 0.0
    )
    return mean_c, var_c, cnt


def _bn_stats_update(stats, mean_c, var_c, cnt, momentum):
    unbiased = var_c * (cnt / jnp.maximum(cnt - 1.0, 1.0))
    return {
        "mean": momentum * stats["mean"] + (1 - momentum) * mean_c,
        "var": momentum * stats["var"] + (1 - momentum) * unbiased,
    }


def bn_folded(params: dict, stats: dict, fg: FGrid, fm: FGrid, *,
              training: bool, relu: bool = True, eps: float = 1e-4,
              momentum: float = 0.9, axis_name=None) -> tuple[FGrid, dict]:
    """Masked batch norm in folded layout (ops/bn.py semantics)."""
    C = fg.real_c
    cpad = fg.cpad
    F = LANES // cpad

    def tile(vec, fill=0.0):
        v = jnp.full((cpad,), fill, jnp.float32).at[:C].set(
            vec.astype(jnp.float32)
        )
        return jnp.tile(v, F)

    if training:
        mean_c, var_c, cnt = _bn_moments(fg, fm, axis_name)
        new_stats = _bn_stats_update(stats, mean_c, var_c, cnt, momentum)
        mean, var = mean_c, var_c
    else:
        mean, var = stats["mean"][:C], stats["var"][:C]
        new_stats = stats
    inv = jax.lax.rsqrt(var + eps) * params["scale"][:C]
    mean_t = tile(mean)
    inv_t = tile(inv)
    bias_t = tile(params["bias"][:C])
    y = (fg.data.astype(jnp.float32) - mean_t) * inv_t + bias_t
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.astype(fg.data.dtype) * fm.data
    return fg.with_data(y), new_stats


def subm_conv_fused(groups: list, fm: FGrid, w27: jax.Array, cout: int, *,
                    bn_params: dict | None = None,
                    bn_stats: dict | None = None,
                    relu: bool = True, eps: float = 1e-4,
                    residual: FGrid | None = None,
                    quantize: bool = False) -> FGrid:
    """Fused conv SITE: one Pallas kernel for [optional eval-BN affine +
    ReLU + input mask] -> multi-group 3^3 conv -> output mask -> halo'd
    output (ops/pallas/conv3d_folded.py:fused_conv_folded kernel v3).

    Replaces the v2 composition [bn_folded -> per-group subm_conv_folded
    partial sums -> rehalo*mask], which paid one full-grid XLA pass per
    elementwise stage; here HBM traffic is the floor (read G grids + mask,
    write one grid). BN params/stats are FULL-WIDTH vectors sliced per
    group, exactly like _bn_groups (models/folded_flow.py).
    """
    from sgnn_tpu.ops.pallas.conv3d_folded import (
        fused_conv_folded, prep_conv_weights,
    )

    fg0 = groups[0]
    cpad = fg0.cpad
    F = LANES // cpad
    dt = fg0.data.dtype

    def build():
        ws, affines = [], []
        off = 0
        for fg in groups:
            c = fg.real_c
            ws.append(w27[:, off:off + c, :])
            if bn_params is not None:
                inv = jax.lax.rsqrt(
                    bn_stats["var"][off:off + c].astype(jnp.float32) + eps
                ) * bn_params["scale"][off:off + c].astype(jnp.float32)
                beta = bn_params["bias"][off:off + c].astype(jnp.float32) \
                    - bn_stats["mean"][off:off + c].astype(jnp.float32) \
                    * inv
                a = jnp.zeros((cpad,), jnp.float32).at[:c].set(inv)
                b = jnp.zeros((cpad,), jnp.float32).at[:c].set(beta)
                affines.append((jnp.tile(a, F), jnp.tile(b, F)))
            off += c
        assert off == w27.shape[1], (off, w27.shape)
        return {
            "k": prep_conv_weights(ws, cpad, dt, quantize),
            "aff": affines if bn_params is not None else None,
        }

    prew, skip = _prep_site(build)
    if skip:
        return FGrid(jnp.zeros_like(fg0.data), fg0.dims, cout, cpad)
    out = fused_conv_folded(
        [g.data for g in groups], fm.data, None, cpad,
        affines=prew["aff"], relu=relu,
        residual=residual.data if residual is not None else None,
        quantize=quantize, prew=prew["k"],
    )
    return FGrid(out, fg0.dims, cout, cpad)


def upconv_fused(groups: list, cfm: FGrid, ffm: FGrid | None,
                 w27: jax.Array,
                 cout: int, *, bn_params: dict | None = None,
                 bn_stats: dict | None = None, relu: bool = True,
                 eps: float = 1e-4, quantize: bool = False) -> FGrid:
    """Fused generative upsample site: [optional eval-BN + ReLU + coarse
    mask] -> 2x NN upsample -> 3^3 conv -> fine mask, ONE Pallas kernel
    reading the COARSE groups (ops/pallas/conv3d_folded.py:
    fused_upconv_folded). The G upsampled fine grids of the composed path
    (8x the coarse bytes each, written then re-read by the conv) are never
    materialized. Matches conv3(nn_up(concat(groups))) == the reference's
    to_next_level_locs + n1 conv (/root/reference/torch/model.py:192-207).
    """
    from sgnn_tpu.ops.pallas.conv3d_folded import fused_upconv_folded

    fg0 = groups[0]
    cpad = fg0.cpad
    F = LANES // cpad
    Zc, Yc, Xc = fg0.dims
    dt = fg0.data.dtype

    def build():
        from sgnn_tpu.ops.pallas.conv3d_folded import prep_upconv_weights

        ws, affines = [], []
        off = 0
        for fg in groups:
            c = fg.real_c
            ws.append(w27[:, off:off + c, :])
            if bn_params is not None:
                inv = jax.lax.rsqrt(
                    bn_stats["var"][off:off + c].astype(jnp.float32) + eps
                ) * bn_params["scale"][off:off + c].astype(jnp.float32)
                beta = bn_params["bias"][off:off + c].astype(jnp.float32) \
                    - bn_stats["mean"][off:off + c].astype(jnp.float32) \
                    * inv
                a = jnp.zeros((cpad,), jnp.float32).at[:c].set(inv)
                b = jnp.zeros((cpad,), jnp.float32).at[:c].set(beta)
                affines.append((jnp.tile(a, F), jnp.tile(b, F)))
            off += c
        assert off == w27.shape[1], (off, w27.shape)
        return {
            "k": prep_upconv_weights(ws, cpad, dt, quantize),
            "aff": affines if bn_params is not None else None,
        }

    prew, skip = _prep_site(build)
    xqf = _xq_for(2 * Xc, cpad)
    if skip:
        B = fg0.data.shape[0]
        dummy = jnp.zeros(
            (B, 2 * Zc + 2, 2 * Yc + 2, xqf, LANES), dt
        )
        return FGrid(dummy, (2 * Zc, 2 * Yc, 2 * Xc), cout, cpad)
    # ffm=None: the fine mask is the NN-dup of cfm, expanded in-register
    # (refine_level's fm_unfilt never materializes in serving)
    out = fused_upconv_folded(
        [g.data for g in groups], cfm.data,
        ffm.data if ffm is not None else None, None, cpad,
        affines=prew["aff"], relu=relu,
        quantize=quantize,
        xqf=xqf if ffm is None else None,
        prew=prew["k"],
    )
    return FGrid(out, (2 * Zc, 2 * Yc, 2 * Xc), cout, cpad)


def downconv_fused(fg: FGrid, fm: FGrid, w8: jax.Array, cout: int, *,
                   bn_params: dict | None = None,
                   bn_stats: dict | None = None, relu: bool = True,
                   eps: float = 1e-4,
                   cpad_out: int | None = None,
                   quantize: bool = False) -> tuple[FGrid, FGrid]:
    """Fused stride-2 down site: [optional eval-BN + ReLU + fine mask] ->
    2^3 stride-2 conv -> coarse-mask (maxpool2, same pass) -> masked
    halo'd coarse FGrid + coarse mask FGrid, ONE Pallas kernel
    (ops/pallas/conv3d_folded.py:fused_downconv_folded)."""
    from sgnn_tpu.ops.pallas.conv3d_folded import fused_downconv_folded

    cpad = fg.cpad
    F = LANES // cpad
    dt = fg.data.dtype

    def build():
        from sgnn_tpu.ops.pallas.conv3d_folded import prep_downconv_weights

        affine = None
        if bn_params is not None:
            c = fg.real_c
            inv = jax.lax.rsqrt(
                bn_stats["var"][:c].astype(jnp.float32) + eps
            ) * bn_params["scale"][:c].astype(jnp.float32)
            beta = bn_params["bias"][:c].astype(jnp.float32) \
                - bn_stats["mean"][:c].astype(jnp.float32) * inv
            a = jnp.zeros((cpad,), jnp.float32).at[:c].set(inv)
            b = jnp.zeros((cpad,), jnp.float32).at[:c].set(beta)
            affine = (jnp.tile(a, F), jnp.tile(b, F))
        return {
            "k": prep_downconv_weights(
                w8[:, :fg.real_c, :], cpad, cpad_out, dt, quantize
            ),
            "aff": affine,
        }

    prew, skip = _prep_site(build)
    co = cpad_out or cpad
    Z, Y, X = fg.dims
    dims_c = (Z // 2, Y // 2, X // 2)
    if skip:
        B, _, _, xqf, _ = fg.data.shape
        cross = cpad_out is not None and cpad_out != cpad
        xqc = xqf if cross else _xq_for((xqf // 2) * (LANES // cpad), cpad)
        dummy = jnp.zeros((B, Z // 2 + 2, Y // 2 + 2, xqc, LANES), dt)
        return FGrid(dummy, dims_c, cout, co), FGrid(dummy, dims_c, co, co)
    out, mout = fused_downconv_folded(
        fg.data, fm.data, None, cpad,
        affine=prew["aff"], relu=relu, cpad_out=cpad_out,
        quantize=quantize, prew=prew["k"],
    )
    return FGrid(out, dims_c, cout, co), FGrid(mout, dims_c, co, co)


# ---------------------------------------------------- mixed-cpad machinery
#
# Encoder level 0 is the most expensive level (full resolution) and its
# live widths are tiny (input_nf = 1 -> nf0 = 8). Running it at cpad = 8
# packs 16 voxels per vector register instead of 8 — HALF the GEMM rows
# and HALF the grid bytes for every level-0 op. The stride-2 transition
# to level 1 maps one cpad-8 fine block (16 voxels) onto exactly one
# cpad-16 coarse block (8 voxels), so the down conv needs no pair merge
# and no cross-block carries; only the full-res skip tensor must be
# repacked once for its consumer at cpad 16.


@lru_cache(maxsize=None)
def _strided_w_cross_pattern(cpad_in: int, cpad_out: int):
    """[2, 2, 3(dx), F_in slots, F_out slots] 0/1 placement: fine slot
    2 i + dx -> coarse slot i (all within one block; F_in == 2 F_out)."""
    F_in = LANES // cpad_in
    F_out = LANES // cpad_out
    assert F_in == 2 * F_out
    P = np.zeros((3, F_in, F_out), np.float32)
    for i in range(F_out):
        for dx in range(2):
            P[dx, 2 * i + dx, i] = 1.0
    return P


def _strided_w_cross(w8: jax.Array, cpad_in: int, cpad_out: int,
                     cin: int, cout: int) -> jax.Array:
    """w8 [8, cin, cout] -> [2, 2, 128, 128] lane matrices for the
    cpad_in -> cpad_out stride-2 conv (see block comment above)."""
    P = jnp.asarray(_strided_w_cross_pattern(cpad_in, cpad_out)[:2])
    w = w8.astype(jnp.float32).reshape(2, 2, 2, cin, cout)
    # out[dz, dy, o*cpad_in + c, i*cpad_out + e] =
    #     sum_dx P[dx, o, i] w[dz, dy, dx, c, e]
    m = jnp.einsum("doi,zydce->zyocie", P, w)
    F_in, F_out = LANES // cpad_in, LANES // cpad_out
    out = jnp.zeros((2, 2, F_in, cpad_in, F_out, cpad_out), jnp.float32)
    out = out.at[:, :, :, :cin, :, :cout].set(m)
    return out.reshape(2, 2, LANES, LANES)


@lru_cache(maxsize=None)
def _mask_down_cross(cpad_in: int, cpad_out: int) -> np.ndarray:
    """[128, 128]: any lane of fine slot o -> all lanes of coarse o//2."""
    F_in = LANES // cpad_in
    M = np.zeros((LANES, LANES), np.float32)
    for o in range(F_in):
        for c in range(cpad_in):
            for c2 in range(cpad_out):
                M[o * cpad_in + c, (o // 2) * cpad_out + c2] = 1.0
    return M


@lru_cache(maxsize=None)
def _repack_matrix(cpad_in: int, cpad_out: int) -> np.ndarray:
    """[128, 256] permutation: cpad_in row (F_in voxels) -> a PAIR of
    cpad_out rows (F_in voxels at the wider lane budget, upper channels
    dead). Requires cpad_out == 2 * cpad_in."""
    assert cpad_out == 2 * cpad_in
    F_in = LANES // cpad_in
    M = np.zeros((LANES, 2 * LANES), np.float32)
    for s in range(F_in):
        for c in range(cpad_in):
            M[s * cpad_in + c, s * cpad_out + c] = 1.0
    return M


def repack_cpad(fg: FGrid, cpad_out: int) -> FGrid:
    """Re-fold an FGrid to a wider per-voxel lane budget (one lane GEMM +
    block unpair); real channels preserved, new lanes dead-zero."""
    if cpad_out == fg.cpad:
        return fg
    assert cpad_out == 2 * fg.cpad, (fg.cpad, cpad_out)
    Z, Y, X = fg.dims
    xq_out = _xq_for(X, cpad_out)
    M = jnp.asarray(_repack_matrix(fg.cpad, cpad_out), fg.data.dtype)
    y = jax.lax.dot_general(
        fg.data, M, dimension_numbers=(((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(fg.data.dtype)
    y = _unpairs(y)  # [B, Z+2, Y+2, 2 xq_in, 128]
    if y.shape[3] > xq_out:
        y = y[:, :, :, :xq_out]
    elif y.shape[3] < xq_out:
        y = jnp.pad(y, ((0, 0),) * 3 + ((0, xq_out - y.shape[3]), (0, 0)))
    return FGrid(y, fg.dims, fg.real_c, cpad_out)


def _eval_affine(bn_params, bn_stats, c, cpad, off=0, eps=1e-4):
    """Full-width (scale, bias) lane tiles for eval-BN fused kernels."""
    F = LANES // cpad
    inv = jax.lax.rsqrt(
        bn_stats["var"][off:off + c].astype(jnp.float32) + eps
    ) * bn_params["scale"][off:off + c].astype(jnp.float32)
    beta = bn_params["bias"][off:off + c].astype(jnp.float32) \
        - bn_stats["mean"][off:off + c].astype(jnp.float32) * inv
    a = jnp.zeros((cpad,), jnp.float32).at[:c].set(inv)
    b = jnp.zeros((cpad,), jnp.float32).at[:c].set(beta)
    return jnp.tile(a, F), jnp.tile(b, F)


def head_site_fused(up: FGrid, fm: FGrid, bn_params: dict, bn_stats: dict,
                    W2: jax.Array, b2: jax.Array, *, dtype=jnp.bfloat16,
                    eps: float = 1e-4, emit_raw: bool = True,
                    fm_scale: int = 1
                    ) -> tuple[FGrid, FGrid, FGrid, FGrid | None]:
    """Fused refinement tail: [n2 eval-BN + ReLU + mask] -> heads linear
    (occ ch0 | sdf ch1) -> occupancy gate -> (masked post-BN feats,
    masked heads, new mask, raw f32 heads), ONE Pallas kernel
    (ops/pallas/conv3d_folded.py:fused_head_folded). Replaces the chain
    [bn_folded, linear_folded, occ_mask_folded, 3 mask multiplies]
    (the reference's model.py:189-190,233-246 head + sparsify).
    ``emit_raw=False`` skips the raw f32 heads grid (last return is
    None) — the largest HBM write of the forward at the finest level,
    unneeded when the caller only exports the surface."""
    from sgnn_tpu.ops.pallas.conv3d_folded import fused_head_folded

    cpad = up.cpad
    F = LANES // cpad
    cout = W2.shape[1]

    def build():
        a, b = _eval_affine(bn_params, bn_stats, up.real_c, cpad, eps=eps)
        Wt = _linear_tile(W2, cpad, cout)
        R = jnp.asarray(_occ_replicate(cpad), jnp.float32)
        Wocc = Wt @ R
        bl = jnp.zeros((cpad,), jnp.float32).at[:cout].set(
            b2.astype(jnp.float32)
        )
        bt = jnp.tile(bl, F)
        brep = bt @ R
        return {
            "Wt": Wt[None].astype(up.data.dtype),
            "bts": jnp.stack([bt, brep]),
            "ab": jnp.stack([a[None], b[None]]),
            "Wocc": Wocc[None].astype(up.data.dtype),
        }

    prew, skip = _prep_site(build)
    if skip:
        d = jnp.zeros_like(up.data)
        return (
            FGrid(d, up.dims, up.real_c, cpad),
            FGrid(d, up.dims, cout, cpad),
            FGrid(d, up.dims, cpad, cpad),
            FGrid(d.astype(jnp.float32), up.dims, cout, cpad)
            if emit_raw else None,
        )
    outs = fused_head_folded(
        [up.data], fm.data,
        prew["Wt"], prew["bts"],
        affines=prew["ab"],
        woccs=prew["Wocc"], gate=True,
        emit_raw=emit_raw, mask_scale=fm_scale, mask_cpad=fm.cpad,
    )
    upm, o2m, fmn = outs[:3]
    return (
        FGrid(upm, up.dims, up.real_c, cpad),
        FGrid(o2m, up.dims, cout, cpad),
        FGrid(fmn, up.dims, cpad, cpad),
        FGrid(outs[3], up.dims, cout, cpad) if emit_raw else None,
    )


def surf_head_fused(groups: list, fm: FGrid, bn_params: dict,
                    bn_stats: dict, W: jax.Array, bias: jax.Array, *,
                    eps: float = 1e-4) -> FGrid:
    """Fused surface tail: per-group [p3 eval-BN + ReLU + mask] -> summed
    per-group linear -> raw f32 SDF grid, ONE kernel (the reference's
    SurfacePrediction head, model.py:257,270)."""
    from sgnn_tpu.ops.pallas.conv3d_folded import fused_head_folded

    cpad = groups[0].cpad
    F = LANES // cpad
    affines, tiles = [], []
    off = 0
    for g in groups:
        c = g.real_c
        affines.append(_eval_affine(bn_params, bn_stats, c, cpad, off=off,
                                    eps=eps))
        tiles.append(_linear_tile(W[off:off + c], cpad, 1))
        off += c
    assert off == W.shape[0]
    bl = jnp.zeros((cpad,), jnp.float32).at[:1].set(
        bias.astype(jnp.float32)
    )
    bt = jnp.tile(bl, F)
    out = fused_head_folded(
        [g.data for g in groups], fm.data,
        jnp.stack(tiles).astype(groups[0].data.dtype),
        jnp.stack([bt, jnp.zeros_like(bt)]),
        affines=jnp.stack([jnp.stack([a for a, _ in affines]),
                           jnp.stack([b for _, b in affines])]),
        gate=False,
    )
    return FGrid(out, groups[0].dims, 1, cpad)


def surf_head_packed(groups: list, fm: FGrid, bn_params: dict,
                     bn_stats: dict, W: jax.Array, bias: jax.Array, *,
                     eps: float = 1e-4
                     ) -> tuple[jax.Array, jax.Array]:
    """Multi-scale fused surface tail -> dense (sdf, mask) outputs.

    ``groups`` is a list of (FGrid, scale) pairs — the unet pyramid at
    NATIVE resolutions (scale = NN-upsample factor to full res; the
    deferred form of _unet, models/folded_flow.py). Returns
    (sdf [B, Z, Y, X] f32 raw head values, surf_mask [B, Z, Y, X] bool).
    The per-group head GEMM runs on the coarse rows (s^3 fewer for a
    scale-s group) and the NN expansion happens in-register on the GEMM
    results — the upsampled group grids never exist in HBM. Bitwise-
    equal to [upsample2_folded* -> surf_head_fused -> unfold].
    Reference: SurfacePrediction head,
    /root/reference/torch/model.py:257,270.
    """
    from sgnn_tpu.ops.pallas.conv3d_folded import fused_surf_head_ms

    cpad = groups[0][0].cpad
    F = LANES // cpad
    Z, Y, X = groups[0][0].dims
    assert groups[0][1] == 1

    def build():
        affines, tiles = [], []
        off = 0
        for g, s in groups:
            c = g.real_c
            assert g.cpad == cpad
            affines.append(
                _eval_affine(bn_params, bn_stats, c, cpad, off=off, eps=eps)
            )
            tiles.append(_linear_tile(W[off:off + c], cpad, 1))
            off += c
        assert off == W.shape[0]
        bl = jnp.zeros((cpad,), jnp.float32).at[:1].set(
            bias.astype(jnp.float32)
        )
        return {
            "tiles": jnp.stack(tiles).astype(groups[0][0].data.dtype),
            "bt": jnp.tile(bl, F),
            "ab": jnp.stack([jnp.stack([a for a, _ in affines]),
                             jnp.stack([b for _, b in affines])]),
        }

    prew, skip = _prep_site(build)
    B = groups[0][0].data.shape[0]
    if skip:
        return (jnp.zeros((B, Z, Y, X), jnp.float32),
                jnp.zeros((B, Z, Y, X), jnp.bool_))
    out = fused_surf_head_ms(
        [g.data for g, _ in groups], tuple(s for _, s in groups),
        fm.data,
        prew["tiles"], prew["bt"], cpad,
        affines=prew["ab"],
    )
    sdf = unfold(FGrid(out, groups[0][0].dims, 1, cpad))[..., 0]
    mask = unfold(fm)[..., 0] > 0.5
    return sdf, mask


def conv_folded_xla(xf: jax.Array, w27: jax.Array, cpad: int) -> jax.Array:
    """Differentiable XLA composition of the folded 3^3 conv: the same
    tri-block-diagonal tap algebra as the Pallas kernel
    (ops/pallas/conv3d_folded.py:_fold_weights), expressed as 18
    dot_generals + leading-dim shifted slices so jax.grad works — the
    training-path equivalent of conv_folded_raw.

    xf [B, Z+2, Y+2, xq, 128] (zero halo ring) -> UNPADDED folded output
    [B, Z, Y, xq, 128] f32; the caller re-halos + masks.
    """
    from sgnn_tpu.ops.pallas.conv3d_folded import _fold_weights

    B, Zp, Yp, xq, _ = xf.shape
    Z, Y = Zp - 2, Yp - 2
    K, cin, cout = w27.shape
    assert K == 27 and cin <= cpad and cout <= cpad
    w = w27
    if cin < cpad:
        w = jnp.pad(w, ((0, 0), (0, cpad - cin), (0, 0)))
    wm, wc = _fold_weights(w, cpad, xf.dtype)
    zrow = jnp.zeros_like(xf[:, :, :, :1])
    nxt = jnp.concatenate([xf[:, :, :, 1:], zrow], axis=3)
    prv = jnp.concatenate([zrow, xf[:, :, :, :-1]], axis=3)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, LANES), 4)
    carry = jnp.where(lane < cpad, nxt, prv)
    dn = (((4,), (0,)), ((), ()))
    acc = None
    for dz in range(3):
        for dy in range(3):
            k = dz * 3 + dy
            a = jax.lax.dot_general(
                xf[:, dz:dz + Z, dy:dy + Y], wm[k],
                dimension_numbers=dn, preferred_element_type=jnp.float32,
            )
            b = jax.lax.dot_general(
                carry[:, dz:dz + Z, dy:dy + Y], wc[k],
                dimension_numbers=dn, preferred_element_type=jnp.float32,
            )
            acc = a + b if acc is None else acc + a + b
    return acc


def subm_conv_folded_xla(groups: list, fm: FGrid, w27: jax.Array,
                         cout: int) -> FGrid:
    """Differentiable submanifold conv site (training path): per-group
    conv_folded_xla summed, re-halo'd, masked. Same result as
    subm_conv_folded / subm_conv_fused in eval."""
    acc = None
    off = 0
    for fg in groups:
        y = conv_folded_xla(
            fg.data, w27[:, off:off + fg.real_c, :].astype(fg.data.dtype),
            fg.cpad,
        )
        acc = y if acc is None else acc + y
        off += fg.real_c
    assert off == w27.shape[1], (off, w27.shape)
    fg0 = groups[0]
    out = _rehalo(acc.astype(fg0.data.dtype), fg0.data.shape[3]) * fm.data
    return FGrid(out, fg0.dims, cout, fg0.cpad)


# ----------------------------------------------- training conv (custom VJP)
#
# The autodiff of conv_folded_xla leaves ~54 XLA "convolution" dispatches
# per conv site per train step (18 fwd dots + their dx/dw adjoints +
# remat replays) at ~0.15 ms each — 70%+ of the folded train step
# (trace, tools/trace_summary.py). This custom VJP runs the forward and
# the input gradient through ONE Pallas kernel each (dx of a zero-padded
# 3^3 conv = conv of the cotangent with the tap-flipped, in/out-
# transposed weights) and computes dW with 18 [128, N] x [N, 128]
# reduce-GEMMs + the constant slot-pattern extraction (the exact adjoint
# of _fold_weights' block-kron einsum).


def _conv_train_impl(xf, w27, cpad):
    """Backend-routed folded conv core: Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        from sgnn_tpu.ops.pallas.conv3d_folded import conv_folded_raw

        B, Zp, Yp, xq, _ = xf.shape
        # logical dims are not recoverable from the folded shape (the x
        # tail is padded); conv_folded_raw only reads shapes, so pass the
        # padded extent explicitly marked as such
        return conv_folded_raw(
            xf, w27.astype(xf.dtype), cpad,
            (Zp - 2, Yp - 2, xq * (LANES // cpad)),
        ).astype(jnp.float32)
    return conv_folded_xla(xf, w27, cpad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_folded_train(xf: jax.Array, w27: jax.Array, cpad: int):
    """Differentiable folded 3^3 conv (zero-padded): xf halo'd
    [B, Z+2, Y+2, xq, 128] -> unpadded [B, Z, Y, xq, 128] f32.

    The returned input gradient is ZERO on the halo ring (the true
    adjoint also propagates into the ring, but every producer of a
    halo'd grid zero-pads it, so those cotangents are sliced away
    upstream — end-to-end gradients are identical; verified against the
    conv_folded_xla autodiff in tests/test_folded_train.py)."""
    return _conv_train_impl(xf, w27, cpad)


def _conv_train_fwd(xf, w27, cpad):
    return _conv_train_impl(xf, w27, cpad), (xf, w27)


def _conv_dx(g, w27, cpad, xq, dtype):
    """Input gradient of the folded 3^3 conv: conv of the re-halo'd
    cotangent with flipped, in/out-transposed taps. Returns a HALO'D grid
    (ring zero — see conv_folded_train's halo note)."""
    K, cin, cout = w27.shape
    wt = jnp.flip(w27.reshape(3, 3, 3, cin, cout), (0, 1, 2))
    wt = wt.reshape(27, cin, cout).transpose(0, 2, 1)  # [27, cout, cin]
    gh = _rehalo(g.astype(dtype), xq)
    dxi = _conv_train_impl(gh, wt, cpad)  # unpadded interior
    return _rehalo(dxi.astype(dtype), xq)


def _conv_dw(xf, g, w27_shape, w27_dtype, cpad):
    """Weight gradient: M[k] = lhs_k^T @ g per (dz, dy) for main and
    carry lhs, then the adjoint of _fold_weights' constant slot
    patterns. ``xf`` is the (halo'd) conv INPUT, ``g`` the unpadded
    cotangent."""
    from sgnn_tpu.ops.pallas.conv3d_folded import _slot_patterns

    K, cin, cout = w27_shape
    B, Zp, Yp, xq, _ = xf.shape
    Z, Y = Zp - 2, Yp - 2
    fold = LANES // cpad
    zrow = jnp.zeros_like(xf[:, :, :, :1])
    nxt = jnp.concatenate([xf[:, :, :, 1:], zrow], axis=3)
    prv = jnp.concatenate([zrow, xf[:, :, :, :-1]], axis=3)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, LANES), 4)
    carry = jnp.where(lane < cpad, nxt, prv)
    grows = g.astype(xf.dtype).reshape(-1, LANES)
    dn = (((0,), (0,)), ((), ()))
    Mm, Mc = [], []
    for dz in range(3):
        for dy in range(3):
            lm = xf[:, dz:dz + Z, dy:dy + Y].reshape(-1, LANES)
            lc = carry[:, dz:dz + Z, dy:dy + Y].reshape(-1, LANES)
            Mm.append(jax.lax.dot_general(
                lm, grows, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            ))
            Mc.append(jax.lax.dot_general(
                lc, grows, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            ))
    eyed, carryd = _slot_patterns(fold)
    Mm_r = jnp.stack(Mm).reshape(9, fold, cpad, fold, cpad)
    Mc_r = jnp.stack(Mc).reshape(9, fold, cpad, fold, cpad)
    # M rows carry (input slot j, cin c), cols (output slot i, cout o):
    # dwm[k][j*cpad+c, i*cpad+o] = M[k] elementwise, so the fold-pattern
    # adjoint contracts (j, i) against the same D/carry constants
    dw9 = (
        jnp.einsum("dji,kjcio->kdco", jnp.asarray(eyed), Mm_r)
        + jnp.einsum("dji,kjcio->kdco", jnp.asarray(carryd), Mc_r)
    )
    return dw9.reshape(27, cpad, cpad)[:, :cin, :cout].astype(w27_dtype)


def _conv_train_bwd(cpad, res, g):
    xf, w27 = res
    B, Zp, Yp, xq, _ = xf.shape
    g = g.astype(xf.dtype)
    dx = _conv_dx(g, w27, cpad, xq, xf.dtype)
    dw = _conv_dw(xf, g, w27.shape, w27.dtype, cpad)
    return dx, dw


conv_folded_train.defvjp(_conv_train_fwd, _conv_train_bwd)


def subm_conv_folded_train(groups: list, fm: FGrid, w27: jax.Array,
                           cout: int) -> FGrid:
    """Training conv site: per-group conv_folded_train summed, re-halo'd,
    masked. Pallas fwd/dx on TPU; XLA composition elsewhere."""
    acc = None
    off = 0
    for fg in groups:
        y = conv_folded_train(
            fg.data, w27[:, off:off + fg.real_c, :], fg.cpad,
        )
        acc = y if acc is None else acc + y
        off += fg.real_c
    assert off == w27.shape[1], (off, w27.shape)
    fg0 = groups[0]
    out = _rehalo(acc.astype(fg0.data.dtype), fg0.data.shape[3]) * fm.data
    return FGrid(out, fg0.dims, cout, fg0.cpad)


# ------------------------------------ fused train BN+ReLU -> conv (custom VJP)
#
# Train-mode BN feeding a Pallas conv cannot be fused by XLA (elementwise
# producers do not fuse into custom calls), so the v2 composition
# [bn_folded -> subm_conv_folded_train] pays a full-grid normalize
# write + re-read per site (~76 ms/step device-side, BENCH_NOTES round 2).
# Here the batch moments stay a cheap differentiable XLA reduce, and the
# normalize+ReLU+mask rides the fused conv kernel's input affine
# (ops/pallas/conv3d_folded.py:fused_conv_folded — the same prologue the
# eval path uses), with a composite custom VJP. Matches the fusion role of
# scn.BatchNormReLU before convs (/root/reference/torch/model.py:37-45).


def _bnconv_impl(cpad, xs, m, a_ts, b_ts, ws):
    """relu(x_g * a_g + b_g) * m -> sum_g conv3 -> * m, halo'd output."""
    dt = xs[0].dtype
    if jax.default_backend() == "tpu":
        from sgnn_tpu.ops.pallas.conv3d_folded import fused_conv_folded

        return fused_conv_folded(
            list(xs), m, [w.astype(dt) for w in ws], cpad,
            affines=list(zip(a_ts, b_ts)), relu=True,
        )
    acc = None
    for x, a, b, w in zip(xs, a_ts, b_ts, ws):
        u = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0)
        u = u.astype(dt) * m
        y = conv_folded_xla(u, w.astype(dt), cpad)
        acc = y if acc is None else acc + y
    xq = xs[0].shape[3]
    return _rehalo(acc.astype(dt), xq) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bnconv_core(cpad, xs, m, a_ts, b_ts, ws):
    return _bnconv_impl(cpad, xs, m, a_ts, b_ts, ws)


def _bnconv_core_fwd(cpad, xs, m, a_ts, b_ts, ws):
    return _bnconv_impl(cpad, xs, m, a_ts, b_ts, ws), (xs, m, a_ts, b_ts, ws)


def _bnconv_core_bwd(cpad, res, g):
    xs, m, a_ts, b_ts, ws = res
    x0 = xs[0]
    xq = x0.shape[3]
    dt = x0.dtype
    # adjoint of out = _rehalo(acc) * m: m's halo ring is zero, so the
    # interior slice of g*m is the acc cotangent
    d_acc = (g * m).astype(dt)[:, 1:-1, 1:-1]
    mf = m.astype(jnp.float32)
    dxs, das, dbs, dws = [], [], [], []
    for x, a, b, w in zip(xs, a_ts, b_ts, ws):
        pre = x.astype(jnp.float32) * a + b
        gate = jnp.where(pre > 0, mf, 0.0)
        u = jnp.maximum(pre, 0.0).astype(dt) * m  # recomputed, XLA-fused
        g_u = _conv_dx(d_acc, w, cpad, xq, dt).astype(jnp.float32)
        g_pre = g_u * gate
        dxs.append((g_pre * a).astype(dt))
        das.append(jnp.sum(g_pre * x.astype(jnp.float32), axis=(0, 1, 2, 3)))
        dbs.append(jnp.sum(g_pre, axis=(0, 1, 2, 3)))
        dws.append(_conv_dw(u, d_acc, w.shape, w.dtype, cpad))
    # mask cotangent: every folded mask originates at a comparison
    # (occ_mask_folded's > 0.5, scatter validity) so its gradient is
    # discarded by autodiff anyway; return zeros instead of materializing
    # the dead-end products
    return (
        tuple(dxs), jnp.zeros_like(m), tuple(das), tuple(dbs), tuple(dws)
    )


_bnconv_core.defvjp(_bnconv_core_fwd, _bnconv_core_bwd)


def bn_conv_folded_train(bn_params: dict, bn_stats: dict, groups: list,
                         fm: FGrid, w27: jax.Array, cout: int, *,
                         axis_name=None, eps: float = 1e-4,
                         momentum: float = 0.9) -> tuple[FGrid, dict]:
    """Fused train-mode BN(+ReLU) -> 3^3 conv site.

    Same result and gradients as [_mask_bn_f(training=True) ->
    subm_conv_folded_train] (tests/test_folded_train.py), one fused
    Pallas pass on TPU: moments via XLA reduce (differentiable — the
    BN backward's moment terms fall out of autodiff), normalize riding
    the kernel input affine. Stats contract matches _mask_bn_f
    (concatenated per-group moments).
    """
    fg0 = groups[0]
    cpad = fg0.cpad
    F = LANES // cpad
    xs, a_ts, b_ts, ws = [], [], [], []
    means, vars_ = [], []
    off = 0
    for fg in groups:
        c = fg.real_c
        p = {k: bn_params[k][off:off + c] for k in ("scale", "bias")}
        st = {k: bn_stats[k][off:off + c] for k in ("mean", "var")}
        mean_c, var_c, cnt = _bn_moments(fg, fm, axis_name)
        ns = _bn_stats_update(st, mean_c, var_c, cnt, momentum)
        means.append(ns["mean"])
        vars_.append(ns["var"])
        inv = jax.lax.rsqrt(var_c + eps) * p["scale"].astype(jnp.float32)
        beta = p["bias"].astype(jnp.float32) - mean_c * inv
        a = jnp.zeros((cpad,), jnp.float32).at[:c].set(inv)
        b = jnp.zeros((cpad,), jnp.float32).at[:c].set(beta)
        xs.append(fg.data)
        a_ts.append(jnp.tile(a, F))
        b_ts.append(jnp.tile(b, F))
        ws.append(w27[:, off:off + c, :])
        off += c
    assert off == w27.shape[1], (off, w27.shape)
    out = _bnconv_core(
        cpad, tuple(xs), fm.data, tuple(a_ts), tuple(b_ts), tuple(ws)
    )
    new_stats = {
        "mean": jnp.concatenate(means) if len(means) > 1 else means[0],
        "var": jnp.concatenate(vars_) if len(vars_) > 1 else vars_[0],
    }
    return FGrid(out, fg0.dims, cout, cpad), new_stats


# ----------------------------- fused train-mode strided / upconv / head sites
#
# The same pattern as bn_conv_folded_train, generalized: every remaining
# train-forward site (stride-2 down, generative upsample+conv, refinement
# head, surface head) runs the SERVING-path fused Pallas kernel in its
# forward, while the backward is the jax.vjp of an exactly-matching
# differentiable XLA composition evaluated at the saved primals. The
# gradient contract therefore IS the unfused composition (what
# tests/test_folded_train.py pins against dense_flow), and the forward
# sheds the standalone full-grid BN-normalize passes + upsample
# materializations the composition pays per site. Under jax.checkpoint
# the recompute-in-bwd cost was already being paid by remat. Matches the
# fusion role of scn.BatchNormReLU feeding convs
# (/root/reference/torch/model.py:37-45).


def _site_train_core(xla_fn, tpu_fn, arrays: tuple):
    """custom-VJP site: ``tpu_fn`` forward on TPU, ``xla_fn`` elsewhere;
    bwd = autodiff of ``xla_fn`` at the saved primals. Both take the
    positional array tuple and must return identically-shaped/dtyped
    outputs (asserted structurally by eval_shape in tests)."""

    def impl(arrs):
        if jax.default_backend() == "tpu":
            return tpu_fn(*arrs)
        return xla_fn(*arrs)

    @jax.custom_vjp
    def core(arrs):
        return impl(arrs)

    def fwd(arrs):
        return impl(arrs), arrs

    def bwd(arrs, g):
        _, pull = jax.vjp(lambda a: xla_fn(*a), arrs)
        return (pull(g)[0],)

    core.defvjp(fwd, bwd)
    return core(arrays)


def _train_affine(bn_params, bn_stats, fg: FGrid, fm: FGrid, *,
                  axis_name=None, off: int = 0, eps: float = 1e-4,
                  momentum: float = 0.9):
    """Batch-stats BN as a precomposed lane affine (a, b [128] f32) for
    one group + the updated running stats. The moments are differentiable
    XLA reductions OUTSIDE the fused core, so the BN backward's moment
    terms fall out of autodiff exactly like bn_conv_folded_train."""
    c = fg.real_c
    cpad = fg.cpad
    F = LANES // cpad
    p = {k: bn_params[k][off:off + c] for k in ("scale", "bias")}
    st = {k: bn_stats[k][off:off + c] for k in ("mean", "var")}
    mean_c, var_c, cnt = _bn_moments(fg, fm, axis_name)
    ns = _bn_stats_update(st, mean_c, var_c, cnt, momentum)
    inv = jax.lax.rsqrt(var_c + eps) * p["scale"].astype(jnp.float32)
    beta = p["bias"].astype(jnp.float32) - mean_c * inv
    a = jnp.zeros((cpad,), jnp.float32).at[:c].set(inv)
    b = jnp.zeros((cpad,), jnp.float32).at[:c].set(beta)
    return jnp.tile(a, F), jnp.tile(b, F), ns


def strided_conv_cross_folded(fg: FGrid, fm: FGrid, w8: jax.Array,
                              cout: int, cpad_out: int
                              ) -> tuple[FGrid, FGrid]:
    """Differentiable stride-2 site that WIDENS the lane budget across
    the stride (cpad -> 2*cpad: one fine block -> one coarse block), the
    XLA counterpart of the fused kernel's cross mode
    (ops/pallas/conv3d_folded.py:fused_downconv_folded)."""
    cpad = fg.cpad
    Z, Y, X = fg.dims
    dt = fg.data.dtype
    w8f = w8[:, :fg.real_c, :]
    W = _strided_w_cross(w8f, cpad, cpad_out, fg.real_c, cout).astype(dt)
    MD = jnp.asarray(_mask_down_cross(cpad, cpad_out), dt)
    d = fg.data[:, 1:Z + 1, 1:Y + 1]
    m = fm.data[:, 1:Z + 1, 1:Y + 1]
    dn = (((4,), (0,)), ((), ()))
    acc = None
    macc = None
    for dz in range(2):
        for dy in range(2):
            a = jax.lax.dot_general(
                d[:, dz::2, dy::2], W[dz, dy], dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            b = jax.lax.dot_general(
                m[:, dz::2, dy::2], MD, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            acc = a if acc is None else acc + a
            macc = b if macc is None else macc + b
    mc = jnp.minimum(macc, 1.0)
    out = (acc * mc).astype(dt)
    mc = mc.astype(dt)
    xq_out = _xq_for(X // 2, cpad_out)
    if out.shape[3] > xq_out:
        out, mc = out[:, :, :, :xq_out], mc[:, :, :, :xq_out]
    elif out.shape[3] < xq_out:
        padw = ((0, 0),) * 3 + ((0, xq_out - out.shape[3]), (0, 0))
        out, mc = jnp.pad(out, padw), jnp.pad(mc, padw)
    dims_c = (Z // 2, Y // 2, X // 2)
    return (
        FGrid(_rehalo(out, xq_out), dims_c, cout, cpad_out),
        FGrid(_rehalo(mc, xq_out), dims_c, cpad_out, cpad_out),
    )


def downconv_folded_train(fg: FGrid, fm: FGrid, w8: jax.Array, cout: int,
                          *, affine: tuple | None = None,
                          cpad_out: int | None = None
                          ) -> tuple[FGrid, FGrid]:
    """Differentiable fused stride-2 down site: [optional affine + ReLU +
    fine mask] -> 2^3 stride-2 conv -> coarse mask, ONE Pallas kernel
    forward (fused_downconv_folded), XLA-composition gradients."""
    cpad = fg.cpad
    dims = fg.dims
    cin = fg.real_c
    has_aff = affine is not None
    w8g = w8[:, :cin, :]

    def xla_fn(*arrs):
        if has_aff:
            x, m, a, b, w = arrs
        else:
            x, m, w = arrs
        g = FGrid(x, dims, cin, cpad)
        mg = FGrid(m, dims, cpad, cpad)
        if has_aff:
            u = jnp.maximum(
                x.astype(jnp.float32) * a + b, 0.0
            ).astype(x.dtype) * m
            g = g.with_data(u)
        if cpad_out is not None and cpad_out != cpad:
            down, down_fm = strided_conv_cross_folded(g, mg, w, cout,
                                                      cpad_out)
        else:
            down = strided_conv_folded([g], w, cout)
            down_fm = mask_down_folded(mg)
            down = down.with_data(down.data * down_fm.data)
        return down.data, down_fm.data

    def tpu_fn(*arrs):
        from sgnn_tpu.ops.pallas.conv3d_folded import fused_downconv_folded

        if has_aff:
            x, m, a, b, w = arrs
            aff = (a, b)
        else:
            x, m, w = arrs
            aff = None
        return fused_downconv_folded(
            x, m, w, cpad, affine=aff, relu=True, cpad_out=cpad_out,
        )

    arrs = (fg.data, fm.data, *(affine if has_aff else ()), w8g)
    out, mout = _site_train_core(xla_fn, tpu_fn, arrs)
    co = cpad_out or cpad
    dims_c = tuple(d // 2 for d in dims)
    return FGrid(out, dims_c, cout, co), FGrid(mout, dims_c, co, co)


def bn_downconv_folded_train(bn_params: dict, bn_stats: dict, fg: FGrid,
                             fm: FGrid, w8: jax.Array, cout: int, *,
                             cpad_out: int | None = None, axis_name=None
                             ) -> tuple[FGrid, FGrid, dict]:
    """Fused train-mode [BN+ReLU -> stride-2 conv -> coarse mask] site;
    same result/gradients as [_mask_bn_f -> _strided_site_f]
    (tests/test_folded_train.py)."""
    a_t, b_t, ns = _train_affine(bn_params, bn_stats, fg, fm,
                                 axis_name=axis_name)
    down, down_fm = downconv_folded_train(
        fg, fm, w8, cout, affine=(a_t, b_t), cpad_out=cpad_out,
    )
    return down, down_fm, ns


def bn_upconv_folded_train(bn_params: dict, bn_stats: dict, groups: list,
                           cfm: FGrid, ffm: FGrid, w27: jax.Array,
                           cout: int, *, axis_name=None
                           ) -> tuple[FGrid, dict]:
    """Fused train-mode generative upsample site: per-group [BN+ReLU +
    coarse mask] -> 2x NN upsample -> 3^3 conv -> fine mask, ONE Pallas
    kernel forward (fused_upconv_folded) — the G upsampled fine grids the
    composition materializes (8x the coarse bytes each) never exist in
    the forward. Gradients: autodiff of the exact composition."""
    fg0 = groups[0]
    cpad = fg0.cpad
    dims_c = fg0.dims
    cins = tuple(g.real_c for g in groups)
    G = len(groups)
    affs, means, vars_ = [], [], []
    off = 0
    for g in groups:
        a_t, b_t, ns = _train_affine(bn_params, bn_stats, g, cfm,
                                     axis_name=axis_name, off=off)
        affs.extend((a_t, b_t))
        means.append(ns["mean"])
        vars_.append(ns["var"])
        off += g.real_c
    assert off == w27.shape[1], (off, w27.shape)

    def _slices(w):
        out, o = [], 0
        for c in cins:
            out.append(w[:, o:o + c, :])
            o += c
        return out

    def xla_fn(*arrs):
        xs = arrs[:G]
        cm, fmf = arrs[G], arrs[G + 1]
        ab = arrs[G + 2:G + 2 + 2 * G]
        w = arrs[-1]
        ups = []
        for x, c in zip(xs, cins):
            a, b = ab[0], ab[1]
            ab = ab[2:]
            u = jnp.maximum(
                x.astype(jnp.float32) * a + b, 0.0
            ).astype(x.dtype) * cm
            ups.append(upsample2_folded(FGrid(u, dims_c, c, cpad)))
        fmg = FGrid(fmf, tuple(2 * d for d in dims_c), cpad, cpad)
        return subm_conv_folded_train(ups, fmg, w, cout).data

    def tpu_fn(*arrs):
        from sgnn_tpu.ops.pallas.conv3d_folded import fused_upconv_folded

        xs = arrs[:G]
        cm, fmf = arrs[G], arrs[G + 1]
        ab = arrs[G + 2:G + 2 + 2 * G]
        w = arrs[-1]
        affines = [(ab[2 * i], ab[2 * i + 1]) for i in range(G)]
        return fused_upconv_folded(
            list(xs), cm, fmf, _slices(w), cpad,
            affines=affines, relu=True,
        )

    arrs = (*(g.data for g in groups), cfm.data, ffm.data, *affs, w27)
    out = _site_train_core(xla_fn, tpu_fn, arrs)
    new_stats = {
        "mean": jnp.concatenate(means) if G > 1 else means[0],
        "var": jnp.concatenate(vars_) if G > 1 else vars_[0],
    }
    return FGrid(out, tuple(2 * d for d in dims_c), cout, cpad), new_stats


def bn_head_site_folded_train(bn_params: dict, bn_stats: dict, up: FGrid,
                              fm: FGrid, W2: jax.Array, b2: jax.Array, *,
                              axis_name=None
                              ) -> tuple[FGrid, FGrid, FGrid, FGrid, dict]:
    """Fused train-mode refinement tail: [n2 BN+ReLU+mask] -> heads
    linear (occ|sdf) -> occupancy gate -> (masked post-BN feats, masked
    heads, new mask, raw f32 heads), ONE Pallas kernel forward
    (fused_head_folded; the reference's head + sparsify,
    /root/reference/torch/model.py:189-190,233-246)."""
    cpad = up.cpad
    dims = up.dims
    cin = up.real_c
    cout = W2.shape[1]
    F = LANES // cpad
    a_t, b_t, ns = _train_affine(bn_params, bn_stats, up, fm,
                                 axis_name=axis_name)

    def xla_fn(x, m, a, b, W, bv):
        u = jnp.maximum(
            x.astype(jnp.float32) * a + b, 0.0
        ).astype(x.dtype) * m
        ug = FGrid(u, dims, cin, cpad)
        out2 = linear_folded(ug, W, bv)  # f32, occ = channel 0
        new_fm = occ_mask_folded(out2, dtype=x.dtype)
        nf = new_fm.data * m
        return u * nf, out2.data.astype(x.dtype) * nf, nf, out2.data

    def tpu_fn(x, m, a, b, W, bv):
        from sgnn_tpu.ops.pallas.conv3d_folded import fused_head_folded

        Wt = _linear_tile(W, cpad, cout)
        R = jnp.asarray(_occ_replicate(cpad), jnp.float32)
        Wocc = Wt @ R
        bl = jnp.zeros((cpad,), jnp.float32).at[:cout].set(
            bv.astype(jnp.float32)
        )
        bt = jnp.tile(bl, F)
        return fused_head_folded(
            [x], m, Wt[None].astype(x.dtype), jnp.stack([bt, bt @ R]),
            affines=jnp.stack([a[None], b[None]]),
            woccs=Wocc[None].astype(x.dtype), gate=True, emit_raw=True,
        )

    upm, o2m, fmn, raw = _site_train_core(
        xla_fn, tpu_fn, (up.data, fm.data, a_t, b_t, W2, b2)
    )
    return (
        FGrid(upm, dims, cin, cpad),
        FGrid(o2m, dims, cout, cpad),
        FGrid(fmn, dims, cpad, cpad),
        FGrid(raw, dims, cout, cpad),
        ns,
    )


def bn_surf_head_folded_train(bn_params: dict, bn_stats: dict,
                              groups: list, fm: FGrid, W: jax.Array,
                              bias: jax.Array, *, axis_name=None
                              ) -> tuple[FGrid, dict]:
    """Fused train-mode surface tail: per-group [p3 BN+ReLU+mask] ->
    summed per-group linear + bias -> raw f32 SDF grid, ONE Pallas kernel
    forward (fused_head_folded gate=False; the reference's
    SurfacePrediction head, model.py:257,270)."""
    fg0 = groups[0]
    cpad = fg0.cpad
    dims = fg0.dims
    cins = tuple(g.real_c for g in groups)
    G = len(groups)
    F = LANES // cpad
    affs, means, vars_ = [], [], []
    off = 0
    for g in groups:
        a_t, b_t, ns = _train_affine(bn_params, bn_stats, g, fm,
                                     axis_name=axis_name, off=off)
        affs.extend((a_t, b_t))
        means.append(ns["mean"])
        vars_.append(ns["var"])
        off += g.real_c
    assert off == W.shape[0], (off, W.shape)

    def _btile(bv):
        bl = jnp.zeros((cpad,), jnp.float32).at[:1].set(
            bv.astype(jnp.float32)
        )
        return jnp.tile(bl, F)

    def xla_fn(*arrs):
        xs = arrs[:G]
        m = arrs[G]
        ab = arrs[G + 1:G + 1 + 2 * G]
        W_, bv = arrs[-2], arrs[-1]
        acc = None
        off = 0
        for x, c in zip(xs, cins):
            a, b = ab[0], ab[1]
            ab = ab[2:]
            u = jnp.maximum(
                x.astype(jnp.float32) * a + b, 0.0
            ).astype(x.dtype) * m
            o = linear_folded(FGrid(u, dims, c, cpad),
                              W_[off:off + c], None)
            acc = o.data if acc is None else acc + o.data
            off += c
        return acc + _btile(bv)

    def tpu_fn(*arrs):
        from sgnn_tpu.ops.pallas.conv3d_folded import fused_head_folded

        xs = arrs[:G]
        m = arrs[G]
        ab = arrs[G + 1:G + 1 + 2 * G]
        W_, bv = arrs[-2], arrs[-1]
        tiles, offs = [], 0
        for c in cins:
            tiles.append(_linear_tile(W_[offs:offs + c], cpad, 1))
            offs += c
        bt = _btile(bv)
        return fused_head_folded(
            list(xs), m, jnp.stack(tiles).astype(xs[0].dtype),
            jnp.stack([bt, jnp.zeros_like(bt)]),
            affines=jnp.stack([
                jnp.stack([ab[2 * i] for i in range(G)]),
                jnp.stack([ab[2 * i + 1] for i in range(G)]),
            ]),
            gate=False,
        )

    arrs = (*(g.data for g in groups), fm.data, *affs, W, bias)
    out = _site_train_core(xla_fn, tpu_fn, arrs)
    new_stats = {
        "mean": jnp.concatenate(means) if G > 1 else means[0],
        "var": jnp.concatenate(vars_) if G > 1 else vars_[0],
    }
    return FGrid(out, dims, 1, cpad), new_stats


def halo_exchange_z(fg: FGrid, axis_name: str) -> FGrid:
    """Fill the z halo ring of a z-SHARDED folded grid from the
    neighboring devices' boundary interior planes (jax.lax.ppermute over
    ICI; edge devices keep the zero ring). The spatial-sharding
    counterpart of parallel/spatial.py:halo_exchange for the folded
    layout — y/x rings stay zero (unsharded axes). Call at each 3^3
    conv/upconv consumption site; producers always re-zero rings."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return fg
    d = fg.data
    # ppermute leaves zeros where no source maps — exactly the edge rule
    from_prev = jax.lax.ppermute(
        d[:, -2], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_next = jax.lax.ppermute(
        d[:, 1], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    d = d.at[:, 0].set(from_prev).at[:, -1].set(from_next)
    return fg.with_data(d)


def scatter_sparse_sharded(
    locs: jax.Array,
    feats: jax.Array,
    num_valid: jax.Array,
    dims: tuple,          # GLOBAL (Z, Y, X)
    batch_size: int,
    axis_name: str,
    cpad: int = 16,
    dtype=jnp.bfloat16,
    feat_bound: float | None = None,
) -> tuple[FGrid, FGrid]:
    """scatter_sparse for a z-sharded slab: rows land on the device
    owning their z; the returned FGrids are LOCAL [B, Z/n+2, ...] with
    logical dims the local slab."""
    Z, Y, X = dims
    n = jax.lax.axis_size(axis_name)
    assert Z % n == 0
    zl = Z // n
    idx = jax.lax.axis_index(axis_name)
    z = locs[:, 0] - idx * zl
    ok = (z >= 0) & (z < zl) & (locs[:, 0] >= 0)
    lloc = jnp.where(
        ok[:, None],
        jnp.stack([z, locs[:, 1], locs[:, 2], locs[:, 3]], -1),
        jnp.int32(-1),
    )
    return scatter_sparse(
        lloc, feats, num_valid, (zl, Y, X), batch_size,
        cpad=cpad, dtype=dtype, feat_bound=feat_bound,
    )

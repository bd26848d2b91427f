"""Dense-flow execution of GenModel: masked dense grids end to end.

The third and fastest execution mode (cfg.execution="dense_flow"). The
coordinate-list modes (models/sgnn.py, conv backends "gather"/"dense")
keep sparse sets explicit; this mode represents every level as

    grid [B, Z, Y, X, C] (channels-last)  +  mask [B, Z, Y, X] bool

and expresses ALL of SparseConvNet's structured-sparsity semantics as pure
masking — the formulation a TPU actually wants:

  * submanifold conv       = dense conv, output multiplied by the mask
    (inactive inputs are zero, so active outputs see only active neighbors)
  * strided conv (2, s2)   = dense stride-2 conv; mask' = maxpool2(mask)
  * unpooling              = 2x nearest upsample; mask = the finer mask
  * generative 2x upsample = 2x nearest upsample of grid and mask
  * occupancy pruning      = mask &= sigmoid(occ) > 0.5   (model.py:233-246,
    with NO capacity limits — exactly the reference's data-dependent
    sparsity, as a static-shape program)
  * batch norm             = moments over masked sites (scn BN semantics)
  * concat_skip            = channel GROUPS (see below; model.py:338-355)

Channel concatenation is VIRTUAL: activations flow as a list of
channels-last grids ("groups") sharing one mask, and every consumer splits
its parameters per group instead of materializing the concatenated tensor:

    conv(concat(gs), W)   == sum_i conv(g_i, W[:, off_i:off_i+C_i])
    BN(concat(gs))        == [BN_i(g_i)] with per-group param/stat slices
    concat(gs) @ W + b    == sum_i g_i @ W[off_i:off_i+C_i] + b

Round-1 profiling showed the materialized concats at the skip joins cost
~31% of scene time in pure layout copies (BENCH_NOTES.md); the grouped
formulation removes them — convs are the only merge points, and XLA fuses
the partial-sum adds into the conv epilogues. Everything is convs +
elementwise ops: no gathers, scatters, or sorts anywhere in the training
graph. Sparse coordinate lists appear only at the input (one scatter) and,
at inference, for extracting surface voxels (one compaction).

Parameters/stats are THE SAME pytree as models/sgnn.py — checkpoints and
the sgnn.pth converter work unchanged (group splits slice the full-width
parameters at trace time) — and tests cross-check both executions produce
identical predictions on the shared active sets.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.ops import bn as BN
from sgnn_tpu.ops import dense as D
from sgnn_tpu.ops.sparse import SparseTensor, sparse_to_dense


# ----------------------------------------------------------- grouped helpers
#
# A "groups" value is a list of [B, Z, Y, X, C_i] arrays sharing one mask:
# the virtual concatenation along channels. Single-array activations are
# passed as one-element lists.


def _gwidth(groups: list) -> int:
    return sum(g.shape[-1] for g in groups)


def _pallas_ok(grid, weight, use_pallas, filter_size):
    # use_pallas is 0 (off) or a minimum voxel count: below it the kernel's
    # fixed costs (fold/pad XLA boundary copies, DMA setup) outweigh its
    # GEMM win (measured: tools/bench_kernel.py)
    if not (use_pallas and filter_size == 3):
        return False
    B, Z, Y, X, _ = grid.shape
    if Z * Y * X < use_pallas:
        return False
    from sgnn_tpu.ops.pallas.conv3d_folded import supported

    return supported(grid.shape, weight.shape)


def _conv_one(grid, weight, filter_size, use_pallas, sp_axis=None):
    """Dense 3^3 (or f^3) conv of one group. weight [K, Cin_g, Cout].

    With ``sp_axis`` (spatial sharding, SURVEY §5's long-context analog)
    the grid is a local z-slab: boundary planes are exchanged with the
    neighboring devices over ICI and the conv runs unpadded in z."""
    if sp_axis is not None and filter_size == 3:
        from sgnn_tpu.parallel.spatial import halo_exchange

        grid = halo_exchange(grid, 1, sp_axis)
        pads = [(0, 0), (1, 1), (1, 1)]
    else:
        pad = (filter_size - 1) // 2
        pads = [(pad, pad)] * 3
        if _pallas_ok(grid, weight, use_pallas, filter_size):
            from sgnn_tpu.ops.pallas.conv3d_folded import conv3d_3x3x3_folded

            return conv3d_3x3x3_folded(grid, weight.astype(grid.dtype))
    w = weight.reshape(
        filter_size, filter_size, filter_size, *weight.shape[1:]
    ).astype(grid.dtype)
    return jax.lax.conv_general_dilated(
        grid, w, window_strides=(1, 1, 1), padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        **D._accum(grid.dtype),
    ).astype(grid.dtype)


def _subm_conv(groups, mask, weight, filter_size=3, use_pallas=False,
               sp_axis=None):
    """Submanifold conv of a grouped activation: per-group dense convs
    summed, then masked. weight [K, sum(C_i), Cout] -> ONE output grid."""
    assert weight.shape[1] == _gwidth(groups), (
        f"conv Cin {weight.shape[1]} != groups {_gwidth(groups)}"
    )
    y = None
    off = 0
    for g in groups:
        c = g.shape[-1]
        yi = _conv_one(g, weight[:, off:off + c, :], filter_size, use_pallas,
                       sp_axis)
        y = yi if y is None else y + yi
        off += c
    return y * mask[..., None].astype(y.dtype)


def _strided_conv(groups, mask, weight):
    """Stride-2 conv; new mask = any active child. weight [8, Cin, Cout]."""
    y = None
    off = 0
    for g in groups:
        c = g.shape[-1]
        w = weight[:, off:off + c, :].reshape(
            2, 2, 2, c, weight.shape[-1]
        ).astype(g.dtype)
        yi = jax.lax.conv_general_dilated(
            g, w, window_strides=(2, 2, 2), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            **D._accum(g.dtype),
        ).astype(g.dtype)
        y = yi if y is None else y + yi
        off += c
    new_mask = D.max_pool3d(mask.astype(jnp.int8)) > 0
    return y * new_mask[..., None].astype(y.dtype), new_mask


def _upsampled_conv(groups, weight27, sp_axis=None):
    """Fused [2x NN upsample -> 3^3 conv] of a grouped activation
    (ops/dense.py:upsampled_conv3d per group, partial sums added).

    Spatially sharded: one coarse halo plane per side supplies the two
    fine planes the 3^3 conv needs across the slab boundary; the fused op
    runs on the widened slab and the halo's fine planes are cropped."""
    y = None
    off = 0
    for g in groups:
        c = g.shape[-1]
        if sp_axis is not None:
            from sgnn_tpu.parallel.spatial import halo_exchange

            g = halo_exchange(g, 1, sp_axis)
        yi = D.upsampled_conv3d(g, weight27[:, off:off + c, :])
        if sp_axis is not None:
            yi = yi[:, 2:-2]
        y = yi if y is None else y + yi
        off += c
    return y


def _linear(groups, p):
    """concat(groups) @ W + b with per-group row slices; f32 output."""
    W = p["weight"]
    acc = None
    off = 0
    for g in groups:
        c = g.shape[-1]
        yi = (g @ W[off:off + c].astype(g.dtype)).astype(jnp.float32)
        acc = yi if acc is None else acc + yi
        off += c
    return acc + p["bias"].astype(jnp.float32)


def _mask_bn(params, stats, groups, mask, *, training, axis_name, relu=True):
    """Masked batch norm over active sites, group-wise: params/stats are
    full-width vectors sliced per group. Returns (groups', new_stats)."""
    outs = []
    means, vars_ = [], []
    off = 0
    flat_mask = mask.reshape(-1)
    for g in groups:
        c = g.shape[-1]
        p = {k: params[k][off:off + c] for k in ("scale", "bias")}
        st = {k: stats[k][off:off + c] for k in ("mean", "var")}
        y, ns = BN.batch_norm(
            p, st, g.reshape(-1, c), flat_mask,
            training=training, relu=relu, axis_name=axis_name,
            eps=BN.SPARSE_BN_EPS,
        )
        outs.append(y.reshape(g.shape))
        if training:
            means.append(ns["mean"])
            vars_.append(ns["var"])
        off += c
    if training:
        new_stats = {
            "mean": jnp.concatenate(means) if len(means) > 1 else means[0],
            "var": jnp.concatenate(vars_) if len(vars_) > 1 else vars_[0],
        }
    else:
        new_stats = stats
    return outs, new_stats


def _upsample2(grid):
    """2x nearest-neighbor upsample on [B, Z, Y, X, C]."""
    g = jnp.repeat(grid, 2, axis=1)
    g = jnp.repeat(g, 2, axis=2)
    return jnp.repeat(g, 2, axis=3)


def _upsample2_mask(mask):
    m = jnp.repeat(mask, 2, axis=1)
    m = jnp.repeat(m, 2, axis=2)
    return jnp.repeat(m, 2, axis=3)


# ------------------------------------------------------------------- blocks


def _resblock(params, stats, grid, mask, *, training, axis_name,
              use_pallas=False, sp_axis=None):
    """Residual block on a SINGLE grid (conv outputs are single groups)."""
    s = {}
    y, s["bn0"] = _mask_bn(params["bn0"], stats["bn0"], [grid], mask,
                           training=training, axis_name=axis_name)
    y = _subm_conv(y, mask, params["conv0"], use_pallas=use_pallas,
                   sp_axis=sp_axis)
    y, s["bn1"] = _mask_bn(params["bn1"], stats["bn1"], [y], mask,
                           training=training, axis_name=axis_name)
    y = _subm_conv(y, mask, params["conv1"], use_pallas=use_pallas,
                   sp_axis=sp_axis)
    return grid + y, s


def _unet(params, stats, groups, mask, *, training, axis_name,
          use_pallas=False, sp_axis=None):
    """FullyConvolutionalNet (reps=1, residual): see nn/blocks.py.
    Input is grouped; returns GROUPS [x, up(deeper)...] — the virtual
    concat of all pyramid levels at this resolution."""
    s = {}
    if len(groups) == 1:
        x = groups[0]
    else:
        # the resblock needs a single residual carrier; only the top-level
        # unet call ever receives one group, so this never materializes
        x = jnp.concatenate(groups, axis=-1)
    x, s["block"] = _resblock(params["block"], stats["block"], x, mask,
                              training=training, axis_name=axis_name,
                              use_pallas=use_pallas, sp_axis=sp_axis)
    if "deeper" not in params:
        return [x], s
    y, s["down_bn"] = _mask_bn(params["down_bn"], stats["down_bn"], [x],
                               mask, training=training, axis_name=axis_name)
    down, down_mask = _strided_conv(y, mask, params["down_conv"])
    deep, s["deeper"] = _unet(params["deeper"], stats["deeper"], [down],
                              down_mask, training=training,
                              axis_name=axis_name, use_pallas=use_pallas,
                              sp_axis=sp_axis)
    maskf = mask[..., None]
    ups = [
        _upsample2(d) * maskf.astype(d.dtype)
        for d in deep
    ]
    return [x, *ups], s


def _encoder_layer(params, stats, groups, mask, *, training, axis_name,
                   use_pallas=False, sp_axis=None):
    s = {}
    x = _subm_conv(groups, mask, params["p1"], use_pallas=use_pallas,
                   sp_axis=sp_axis)
    x, s["p2"] = _resblock(params["p2"], stats["p2"], x, mask,
                           training=training, axis_name=axis_name,
                           use_pallas=use_pallas, sp_axis=sp_axis)
    y, s["p2_bn"] = _mask_bn(params["p2_bn"], stats["p2_bn"], [x], mask,
                             training=training, axis_name=axis_name)
    down, down_mask = _strided_conv(y, mask, params["p3"])
    z, s["p3_bn"] = _mask_bn(params["p3_bn"], stats["p3_bn"], [down],
                             down_mask, training=training,
                             axis_name=axis_name)
    return z[0], down_mask, (y[0], mask), s


# --------------------------------------------------------------- full model


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "coarse_out", "refine_outs", "refine_masks_unfilt", "surf_sdf",
        "surf_mask",
    ),
    meta_fields=(),
)
@dataclasses.dataclass
class DenseFlowOutput:
    """Dense counterpart of GenModelOutput.

    coarse_out:          [B, Z8, Y8, X8, 2] f32 (occ logit, sdf)
    refine_outs:         per level h: [B, z, y, x, 2] f32 predictions at
                         the UNPRUNED upsampled sites
    refine_masks_unfilt: per level h: [B, z, y, x] bool, the unpruned site
                         set the loss evaluates on (locs_unfilt equivalent)
    surf_sdf:            [B, Z, Y, X] f32 final SDF regression
    surf_mask:           [B, Z, Y, X] bool active surface voxels
    """
    coarse_out: jax.Array
    refine_outs: list
    refine_masks_unfilt: list
    surf_sdf: jax.Array
    surf_mask: jax.Array


def dense_trunk(enc_params, enc_stats, cfg, x, *, training, axis_name,
                sp_axis=None):
    """Coarse dense U-Net trunk + occ/sdf heads on the 1/8-res grid
    (/root/reference/torch/model.py:89-136). Shared by the unfolded and
    folded executions. Returns (features y, coarse_out f32, stats).

    Under spatial sharding the 1/8-res input is tiny, so the trunk runs
    REPLICATED: all-gather the z-slabs over ICI, compute everywhere, slice
    the local slab back out (far cheaper than halo-exchanging the trunk's
    k4s2 conv/transposed-conv chain). Callers pass the DATA axis only as
    ``axis_name``: the gathered grid is already complete in z, so a
    space-axis psum would inflate the BN count n-fold and skew the
    unbiased-variance running estimate.
    """
    from sgnn_tpu.models.sgnn import _dense_cbr

    if sp_axis is not None:
        idx = jax.lax.axis_index(sp_axis)
        zl = x.shape[1]
        x = jax.lax.all_gather(x, sp_axis, axis=1, tiled=True)

    s = {}
    enc0, s["encode_dense0"] = _dense_cbr(
        enc_params["encode_dense0"], enc_stats["encode_dense0"], x,
        stride=2, padding=1, transpose=False, training=training,
        axis_name=axis_name,
    )
    enc1, s["encode_dense1"] = _dense_cbr(
        enc_params["encode_dense1"], enc_stats["encode_dense1"], enc0,
        stride=2, padding=1, transpose=False, training=training,
        axis_name=axis_name,
    )
    bott, s["bottleneck_dense2"] = _dense_cbr(
        enc_params["bottleneck_dense2"], enc_stats["bottleneck_dense2"],
        enc1, stride=1, padding=0, transpose=False, training=training,
        axis_name=axis_name,
    )
    dec_in = jnp.concatenate([bott, enc1], -1) if cfg.use_skip_dense else bott
    dec0, s["decode_dense3"] = _dense_cbr(
        enc_params["decode_dense3"], enc_stats["decode_dense3"], dec_in,
        stride=2, padding=1, transpose=True, training=training,
        axis_name=axis_name,
    )
    dec_in = jnp.concatenate([dec0, enc0], -1) if cfg.use_skip_dense else dec0
    y, s["decode_dense4"] = _dense_cbr(
        enc_params["decode_dense4"], enc_stats["decode_dense4"], dec_in,
        stride=2, padding=1, transpose=True, training=training,
        axis_name=axis_name,
    )
    y, s["final"] = _dense_cbr(
        enc_params["final"], enc_stats["final"], y, stride=1, padding=0,
        transpose=False, training=training, axis_name=axis_name,
    )
    occ = D.conv3d(y, enc_params["occpred"])
    sdf = D.conv3d(y, enc_params["sdfpred"])
    coarse_out = jnp.concatenate([occ, sdf], -1).astype(jnp.float32)
    if sp_axis is not None:
        y = jax.lax.dynamic_slice_in_dim(y, idx * zl, zl, 1)
        coarse_out = jax.lax.dynamic_slice_in_dim(coarse_out, idx * zl, zl, 1)
    return y, coarse_out, s


def genmodel_apply_dense(params, stats, cfg: SGNNConfig, st: SparseTensor, *,
                         num_refine_active: int, do_surf: bool,
                         training: bool, axis_name=None, sp_axis=None):
    """Forward pass, dense-flow execution. Mirrors models/sgnn.py
    genmodel_apply (and /root/reference/torch/model.py:371-416).

    ``sp_axis``: name of a SPATIAL mesh axis to shard the scene's z extent
    over (SURVEY §5's long-context analog: scenes beyond one chip's HBM).
    Must be called inside shard_map with ``st`` replicated across that
    axis and cfg.input_dim the GLOBAL dims; every device scatters only its
    z-slab, 3^3 convs halo-exchange boundary planes over ICI
    (parallel/spatial.py), the 1/8-res trunk runs replicated, and all
    outputs are local z-slabs (gather with jax.lax.all_gather(axis=1)).
    Requires Z % (32 * axis_size) == 0 so every strided conv in the U-Net
    pyramids sees an even local extent.
    """
    s: dict[str, Any] = {}
    # kernel routing is threaded explicitly (no module globals): the Pallas
    # folded conv runs wherever its shape constraints hold. The folded
    # kernel assumes symmetric z padding, so it is disabled under spatial
    # sharding (halo'd convs run unpadded in z).
    use_pallas = (
        max(1, int(getattr(cfg, "pallas_min_voxels", 1)))
        if (getattr(cfg, "use_pallas_conv", False) and not training
            and sp_axis is None)
        else 0
    )
    # BN moments reduce over every mesh axis the batch's voxels span.
    # (The replicated trunk keeps the data axis only: its input is already
    # the full gathered grid, so a space-axis psum would inflate `count`
    # n-fold and skew the unbiased-variance correction.)
    data_axis = axis_name
    if axis_name is None:
        axis_name = sp_axis
    elif sp_axis is not None:
        axis_name = (axis_name, sp_axis)
    dt = jnp.dtype(cfg.compute_dtype)
    Z, Y, X = st.spatial_size
    from sgnn_tpu.ops import coords as C

    if sp_axis is None:
        grid = sparse_to_dense(st).astype(dt)  # [B, Z, Y, X, input_nf]
        keys = C.flat_key(st.locs, st.spatial_size, st.batch_size)
        keys = jnp.where(st.valid(), keys, jnp.int32(-1))
        mask = (
            jnp.zeros((st.batch_size * Z * Y * X,), jnp.bool_)
            .at[C.oob_key(keys)].set(True, mode="drop")
        ).reshape(st.batch_size, Z, Y, X)
    else:
        n_sp = jax.lax.axis_size(sp_axis)
        assert Z % (32 * n_sp) == 0, (
            f"spatial sharding: Z={Z} must divide by 32*{n_sp} so every "
            "strided conv sees an even local extent"
        )
        zl = Z // n_sp
        idx = jax.lax.axis_index(sp_axis)
        B = st.batch_size
        lz = st.locs[:, 0] - idx * zl
        ok = st.valid() & (lz >= 0) & (lz < zl)
        lkey = ((st.locs[:, 3] * zl + lz) * Y + st.locs[:, 1]) * X \
            + st.locs[:, 2]
        lkey = jnp.where(ok, lkey, jnp.int32(-1))
        flat = jnp.zeros((B * zl * Y * X, st.num_channels), dt)
        grid = flat.at[C.oob_key(lkey)].set(
            st.feats.astype(dt), mode="drop"
        ).reshape(B, zl, Y, X, st.num_channels)
        mask = (
            jnp.zeros((B * zl * Y * X,), jnp.bool_)
            .at[C.oob_key(lkey)].set(True, mode="drop")
        ).reshape(B, zl, Y, X)

    # ---- encoder sparse levels (checkpointed under training: level-0
    # residuals are full-resolution)
    def enc_layer(p, st_l, x, m):
        return _encoder_layer(p, st_l, [x], m, training=training,
                              axis_name=axis_name, use_pallas=use_pallas,
                              sp_axis=sp_axis)

    if training:
        enc_layer = jax.checkpoint(enc_layer)
    enc_s = []
    skips = []  # (grid, mask) per ft2, then ft3
    x, m = grid, mask
    for lvl in range(len(cfg.nf_per_level)):
        x, m, ft2, s_lvl = enc_layer(
            params["encoder"]["process_sparse"][lvl],
            stats["encoder"]["process_sparse"][lvl], x, m,
        )
        enc_s.append(s_lvl)
        skips.append(ft2)
    skips.append((x, m))  # ft3 at 1/8 res
    s["encoder"] = {"process_sparse": enc_s}

    # ---- dense trunk (identical to the sparse-mode path: already dense).
    # Volumes here are 1/8^3 and below — materialized concats are cheap.
    y, coarse_out, s_trunk = dense_trunk(
        params["encoder"], stats["encoder"], cfg, x,
        training=training, axis_name=data_axis, sp_axis=sp_axis,
    )
    s["encoder"].update(s_trunk)

    # ---- dense_coarse_to_sparse (model.py:315-336) as a mask
    cur_mask = jax.nn.sigmoid(coarse_out[..., 0]) > 0.5
    cmf = cur_mask[..., None]
    cur = []  # grouped activation (virtual concat, model.py:326-333)
    if cfg.pass_occ:
        cur.append(coarse_out.astype(dt) * cmf.astype(dt))
    if cfg.pass_feats:
        cur.append(y * cmf.astype(y.dtype))

    # ---- refinement levels
    L_ref = cfg.num_refine_levels
    ref_outs = []
    ref_masks = []
    new_ref_stats = [stats["refinement"][h] for h in range(L_ref)]

    def refine_level(p, st_h, cur, cur_mask):
        """One generative level: sparse U-Net -> 2x upsample -> heads ->
        prune (model.py:209-247). Checkpointed whole under training: its
        full-resolution activations dominate autodiff residuals."""
        s_h = {}
        z = _subm_conv(cur, cur_mask, p["p1"], use_pallas=use_pallas,
                       sp_axis=sp_axis)
        z, s_h["p2"] = _unet(p["p2"], st_h["p2"], [z], cur_mask,
                             training=training, axis_name=axis_name,
                             use_pallas=use_pallas, sp_axis=sp_axis)
        z, s_h["p3"] = _mask_bn(p["p3"], st_h["p3"], z, cur_mask,
                                training=training, axis_name=axis_name)
        # generative 2x upsample fused with the n1 conv (model.py:192-207;
        # ops/dense.py:upsampled_conv3d): z is already zero off cur_mask,
        # so conv(nn_upsample(z)) == the fused transposed conv on z
        mask_unfilt = _upsample2_mask(cur_mask)
        up = _upsampled_conv(z, p["n1"], sp_axis=sp_axis)
        up = up * mask_unfilt[..., None].astype(up.dtype)
        ups, s_h["n2"] = _mask_bn(p["n2"], st_h["n2"], [up], mask_unfilt,
                                  training=training, axis_name=axis_name)
        up = ups[0]
        occ = _linear([up], p["linear"])
        sdf = _linear([up], p["linearsdf"])
        out_h = jnp.concatenate([occ, sdf], -1)
        # prune (model.py:233-246)
        new_mask = mask_unfilt & (jax.nn.sigmoid(occ[..., 0]) > 0.5)
        nmf = new_mask[..., None]
        nxt = []
        if cfg.pass_feats:
            nxt.append(up * nmf.astype(dt))
        if cfg.pass_occ:
            nxt.append(out_h.astype(dt) * nmf.astype(dt))
        return nxt, new_mask, out_h, mask_unfilt, s_h

    if training:
        refine_level = jax.checkpoint(refine_level)

    for h in range(num_refine_active):
        p = params["refinement"][h]
        st_h = stats["refinement"][h]
        if cfg.use_skip_sparse:
            sk_grid, sk_mask = skips[L_ref - h]
            cur = [*cur, sk_grid * cur_mask[..., None].astype(sk_grid.dtype)]
        cur, cur_mask, out_h, mask_unfilt, s_h = refine_level(
            p, st_h, cur, cur_mask
        )
        ref_outs.append(out_h)
        ref_masks.append(mask_unfilt)
        new_ref_stats[h] = s_h
    s["refinement"] = new_ref_stats

    # ---- surface prediction
    if do_surf and num_refine_active == L_ref:
        p = params["surfacepred"]
        st_s = stats["surfacepred"]
        if cfg.use_skip_sparse:
            sk_grid, sk_mask = skips[0]
            cur = [*cur, sk_grid * cur_mask[..., None].astype(sk_grid.dtype)]

        def surf_block(p, st_s, cur, cur_mask):
            s_s = {}
            z = _subm_conv(cur, cur_mask, p["p1"], use_pallas=use_pallas,
                           sp_axis=sp_axis)
            z, s_s["p2"] = _unet(p["p2"], st_s["p2"], [z], cur_mask,
                                 training=training, axis_name=axis_name,
                                 use_pallas=use_pallas, sp_axis=sp_axis)
            z, s_s["p3"] = _mask_bn(p["p3"], st_s["p3"], z, cur_mask,
                                    training=training, axis_name=axis_name)
            surf = _linear(z, p["linear"])[..., 0]
            return surf, s_s

        if training:
            surf_block = jax.checkpoint(surf_block)
        surf, s_s = surf_block(p, st_s, cur, cur_mask)
        surf_mask = cur_mask
        s["surfacepred"] = s_s
    else:
        B = st.batch_size
        z_out = Z if sp_axis is None else Z // jax.lax.axis_size(sp_axis)
        surf = jnp.zeros((B, z_out, Y, X), jnp.float32)
        surf_mask = jnp.zeros((B, z_out, Y, X), jnp.bool_)
        s["surfacepred"] = stats["surfacepred"]

    out = DenseFlowOutput(
        coarse_out=coarse_out,
        refine_outs=ref_outs,
        refine_masks_unfilt=ref_masks,
        surf_sdf=surf,
        surf_mask=surf_mask,
    )
    return out, s

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
  * concat_skip            = channel concat (skip grids are already zero
    off their active set; model.py:338-355)

Everything is convs + elementwise ops: XLA fuses the masks into the conv
epilogues, the MXU runs at full tilt, and there are no gathers, scatters,
or sorts anywhere in the training graph. Sparse coordinate lists appear
only at the input (one scatter) and, at inference, for extracting surface
voxels (one compaction).

Parameters/stats are THE SAME pytree as models/sgnn.py — checkpoints and
the sgnn.pth converter work unchanged — and tests cross-check both
executions produce identical predictions on the shared active sets.
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


# ------------------------------------------------------------------ helpers


def _accum(dtype):
    """Conv accumulation request. For bf16 inputs the f32
    preferred_element_type breaks the conv TRANSPOSE rule under autodiff
    (f32 cotangent x bf16 weight); TPU convs accumulate bf16 in f32
    internally regardless, so request nothing there."""
    if jnp.dtype(dtype) == jnp.bfloat16:
        return {}
    return {"preferred_element_type": jnp.float32}


def _mask_bn(params, stats, grid, mask, *, training, axis_name, relu=True):
    """Masked batch norm over active sites of a dense grid."""
    B = grid.shape[0]
    C = grid.shape[-1]
    y, new_stats = BN.batch_norm(
        params, stats, grid.reshape(-1, C), mask.reshape(-1),
        training=training, relu=relu, axis_name=axis_name,
        eps=BN.SPARSE_BN_EPS,
    )
    return y.reshape(grid.shape), new_stats


# set by genmodel_apply_dense from cfg.use_pallas_conv (trace-time static);
# eval-only: the Pallas kernel has no custom VJP yet. Routed only above a
# voxel-count threshold: at smaller resolutions the kernel's x-variant
# precomputation and lost XLA fusions outweigh its GEMM win (BENCH_NOTES).
_USE_PALLAS_CONV = False
_PALLAS_CONV_MIN_VOXELS = 2_000_000


def _subm_conv(grid, mask, weight, filter_size=3):
    """Submanifold conv: dense conv then mask. weight [K, Cin, Cout]."""
    nvox = grid.shape[0] * grid.shape[1] * grid.shape[2] * grid.shape[3]
    if (
        _USE_PALLAS_CONV and filter_size == 3
        and nvox >= _PALLAS_CONV_MIN_VOXELS
    ):
        from sgnn_tpu.ops.pallas.conv3d_folded import conv3d_3x3x3_folded

        try:
            y = conv3d_3x3x3_folded(grid, weight.astype(grid.dtype))
            return y * mask[..., None].astype(y.dtype)
        except ValueError:
            pass  # unsupported shape: fall through to the XLA conv
    w = weight.reshape(
        filter_size, filter_size, filter_size, *weight.shape[1:]
    ).astype(grid.dtype)
    pad = (filter_size - 1) // 2
    y = jax.lax.conv_general_dilated(
        grid, w, window_strides=(1, 1, 1), padding=[(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        **_accum(grid.dtype),
    ).astype(grid.dtype)
    return y * mask[..., None].astype(y.dtype)


def _strided_conv(grid, mask, weight):
    """Stride-2 conv; new mask = any active child. weight [8, Cin, Cout]."""
    w = weight.reshape(2, 2, 2, *weight.shape[1:]).astype(grid.dtype)
    y = jax.lax.conv_general_dilated(
        grid, w, window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        **_accum(grid.dtype),
    ).astype(grid.dtype)
    new_mask = D.max_pool3d(mask.astype(jnp.int8)) > 0
    return y * new_mask[..., None].astype(y.dtype), new_mask


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


def _resblock(params, stats, grid, mask, *, training, axis_name):
    s = {}
    y, s["bn0"] = _mask_bn(params["bn0"], stats["bn0"], grid, mask,
                           training=training, axis_name=axis_name)
    y = _subm_conv(y, mask, params["conv0"])
    y, s["bn1"] = _mask_bn(params["bn1"], stats["bn1"], y, mask,
                           training=training, axis_name=axis_name)
    y = _subm_conv(y, mask, params["conv1"])
    return grid + y, s


def _unet(params, stats, grid, mask, *, training, axis_name):
    """FullyConvolutionalNet (reps=1, residual): see nn/blocks.py."""
    s = {}
    x, s["block"] = _resblock(params["block"], stats["block"], grid, mask,
                              training=training, axis_name=axis_name)
    if "deeper" not in params:
        return x, s
    y, s["down_bn"] = _mask_bn(params["down_bn"], stats["down_bn"], x, mask,
                               training=training, axis_name=axis_name)
    down, down_mask = _strided_conv(y, mask, params["down_conv"])
    deep, s["deeper"] = _unet(params["deeper"], stats["deeper"], down,
                              down_mask, training=training,
                              axis_name=axis_name)
    up = _upsample2(deep) * mask[..., None].astype(deep.dtype)
    return jnp.concatenate([x, up], axis=-1), s


def _encoder_layer(params, stats, grid, mask, *, training, axis_name):
    s = {}
    x = _subm_conv(grid, mask, params["p1"])
    x, s["p2"] = _resblock(params["p2"], stats["p2"], x, mask,
                           training=training, axis_name=axis_name)
    y, s["p2_bn"] = _mask_bn(params["p2_bn"], stats["p2_bn"], x, mask,
                             training=training, axis_name=axis_name)
    down, down_mask = _strided_conv(y, mask, params["p3"])
    z, s["p3_bn"] = _mask_bn(params["p3_bn"], stats["p3_bn"], down,
                             down_mask, training=training,
                             axis_name=axis_name)
    return z, down_mask, (y, mask), s


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


def genmodel_apply_dense(params, stats, cfg: SGNNConfig, st: SparseTensor, *,
                         num_refine_active: int, do_surf: bool,
                         training: bool, axis_name=None):
    """Forward pass, dense-flow execution. Mirrors models/sgnn.py
    genmodel_apply (and /root/reference/torch/model.py:371-416)."""
    s: dict[str, Any] = {}
    global _USE_PALLAS_CONV
    _USE_PALLAS_CONV = (
        getattr(cfg, "use_pallas_conv", False) and not training
    )
    dt = jnp.dtype(cfg.compute_dtype)
    grid = sparse_to_dense(st).astype(dt)  # [B, Z, Y, X, input_nf]
    Z, Y, X = st.spatial_size
    keys_mask = jnp.zeros((st.batch_size, Z, Y, X), jnp.bool_)
    from sgnn_tpu.ops import coords as C

    keys = C.flat_key(st.locs, st.spatial_size, st.batch_size)
    keys = jnp.where(st.valid(), keys, jnp.int32(-1))
    mask = (
        keys_mask.reshape(-1).at[C.oob_key(keys)].set(True, mode="drop")
    ).reshape(st.batch_size, Z, Y, X)

    # ---- encoder sparse levels (checkpointed under training: level-0
    # residuals are full-resolution)
    def enc_layer(p, st_l, x, m):
        return _encoder_layer(p, st_l, x, m, training=training,
                              axis_name=axis_name)

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

    # ---- dense trunk (identical to the sparse-mode path: already dense)
    from sgnn_tpu.models.sgnn import _dense_cbr

    enc0, s["encoder"]["encode_dense0"] = _dense_cbr(
        params["encoder"]["encode_dense0"],
        stats["encoder"]["encode_dense0"], x, stride=2, padding=1,
        transpose=False, training=training, axis_name=axis_name,
    )
    enc1, s["encoder"]["encode_dense1"] = _dense_cbr(
        params["encoder"]["encode_dense1"],
        stats["encoder"]["encode_dense1"], enc0, stride=2, padding=1,
        transpose=False, training=training, axis_name=axis_name,
    )
    bott, s["encoder"]["bottleneck_dense2"] = _dense_cbr(
        params["encoder"]["bottleneck_dense2"],
        stats["encoder"]["bottleneck_dense2"], enc1, stride=1, padding=0,
        transpose=False, training=training, axis_name=axis_name,
    )
    dec_in = jnp.concatenate([bott, enc1], -1) if cfg.use_skip_dense else bott
    dec0, s["encoder"]["decode_dense3"] = _dense_cbr(
        params["encoder"]["decode_dense3"],
        stats["encoder"]["decode_dense3"], dec_in, stride=2, padding=1,
        transpose=True, training=training, axis_name=axis_name,
    )
    dec_in = jnp.concatenate([dec0, enc0], -1) if cfg.use_skip_dense else dec0
    y, s["encoder"]["decode_dense4"] = _dense_cbr(
        params["encoder"]["decode_dense4"],
        stats["encoder"]["decode_dense4"], dec_in, stride=2, padding=1,
        transpose=True, training=training, axis_name=axis_name,
    )
    y, s["encoder"]["final"] = _dense_cbr(
        params["encoder"]["final"], stats["encoder"]["final"], y,
        stride=1, padding=0, transpose=False, training=training,
        axis_name=axis_name,
    )
    occ = D.conv3d(y, params["encoder"]["occpred"])
    sdf = D.conv3d(y, params["encoder"]["sdfpred"])
    coarse_out = jnp.concatenate([occ, sdf], -1).astype(jnp.float32)

    # ---- dense_coarse_to_sparse (model.py:315-336) as a mask
    cur_mask = jax.nn.sigmoid(coarse_out[..., 0]) > 0.5
    feat_list = []
    if cfg.pass_occ:
        feat_list.append(coarse_out.astype(dt))
    if cfg.pass_feats:
        feat_list.append(y)
    cur = jnp.concatenate(feat_list, -1) * cur_mask[..., None].astype(dt)

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
        z = _subm_conv(cur, cur_mask, p["p1"])
        z, s_h["p2"] = _unet(p["p2"], st_h["p2"], z, cur_mask,
                             training=training, axis_name=axis_name)
        z, s_h["p3"] = _mask_bn(p["p3"], st_h["p3"], z, cur_mask,
                                training=training, axis_name=axis_name)
        # generative 2x upsample fused with the n1 conv (model.py:192-207;
        # ops/dense.py:upsampled_conv3d): z is already zero off cur_mask,
        # so conv(nn_upsample(z)) == the fused transposed conv on z
        mask_unfilt = _upsample2_mask(cur_mask)
        up = D.upsampled_conv3d(z, p["n1"])
        up = up * mask_unfilt[..., None].astype(up.dtype)
        up, s_h["n2"] = _mask_bn(p["n2"], st_h["n2"], up, mask_unfilt,
                                 training=training, axis_name=axis_name)
        occ = (
            up @ p["linear"]["weight"] + p["linear"]["bias"]
        ).astype(jnp.float32)
        sdf = (
            up @ p["linearsdf"]["weight"] + p["linearsdf"]["bias"]
        ).astype(jnp.float32)
        out_h = jnp.concatenate([occ, sdf], -1)
        # prune (model.py:233-246)
        new_mask = mask_unfilt & (jax.nn.sigmoid(occ[..., 0]) > 0.5)
        if cfg.pass_feats and cfg.pass_occ:
            nxt = jnp.concatenate([up, out_h.astype(dt)], -1)
        elif cfg.pass_feats:
            nxt = up
        else:
            nxt = out_h.astype(dt)
        nxt = nxt * new_mask[..., None].astype(dt)
        return nxt, new_mask, out_h, mask_unfilt, s_h

    if training:
        refine_level = jax.checkpoint(refine_level)

    for h in range(num_refine_active):
        p = params["refinement"][h]
        st_h = stats["refinement"][h]
        if cfg.use_skip_sparse:
            sk_grid, sk_mask = skips[L_ref - h]
            cur = jnp.concatenate(
                [cur, sk_grid * cur_mask[..., None].astype(sk_grid.dtype)],
                axis=-1,
            )
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
            cur = jnp.concatenate(
                [cur, sk_grid * cur_mask[..., None].astype(sk_grid.dtype)],
                axis=-1,
            )

        def surf_block(p, st_s, cur, cur_mask):
            s_s = {}
            z = _subm_conv(cur, cur_mask, p["p1"])
            z, s_s["p2"] = _unet(p["p2"], st_s["p2"], z, cur_mask,
                                 training=training, axis_name=axis_name)
            z, s_s["p3"] = _mask_bn(p["p3"], st_s["p3"], z, cur_mask,
                                    training=training, axis_name=axis_name)
            surf = (
                z @ p["linear"]["weight"] + p["linear"]["bias"]
            ).astype(jnp.float32)[..., 0]
            return surf, s_s

        if training:
            surf_block = jax.checkpoint(surf_block)
        surf, s_s = surf_block(p, st_s, cur, cur_mask)
        surf_mask = cur_mask
        s["surfacepred"] = s_s
    else:
        B = st.batch_size
        surf = jnp.zeros((B, Z, Y, X), jnp.float32)
        surf_mask = jnp.zeros((B, Z, Y, X), jnp.bool_)
        s["surfacepred"] = stats["surfacepred"]

    out = DenseFlowOutput(
        coarse_out=coarse_out,
        refine_outs=ref_outs,
        refine_masks_unfilt=ref_masks,
        surf_sdf=surf,
        surf_mask=surf_mask,
    )
    return out, s

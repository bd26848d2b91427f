"""SG-NN generative model, TPU-native.

Re-implements GenModel (/root/reference/torch/model.py:276-416): a sparse
encoder + dense coarse bottleneck predicting coarse occupancy/SDF, followed
by num_hierarchy_levels-1 generative Refinement levels (sparse U-Net ->
2x voxel upsample -> occupancy-gated pruning) and a final SurfacePrediction
regressing per-voxel SDF at full resolution.

TPU adaptations:
  * All sparse sets are fixed-capacity SparseTensors; the data-dependent
    pruning (model.py:233-246) becomes masked compaction inside static caps.
  * Level gating by loss weight (model.py:387-399) is a *static* argument
    (num_refine_active / do_surf): the fade-in schedule changes the active
    set only a handful of times per training run, so the few recompiles are
    amortized, and XLA never sees data-dependent control flow.
  * The coarse level's "sparse" output over all coarse voxels
    (model.py:319-336) stays dense — it IS dense; the loss consumes it
    directly without the reference's flatten/scatter detour.

Feature concatenation orders follow the reference exactly (they matter for
sgnn.pth parity):
  * coarse -> refine 0: [occ(2) | coarse_feats(nf_coarse)] (model.py:330)
  * refine h -> h+1:    [x(nf) | occ(2)] (model.py:242)
  * concat_skip appends encoder skip features last (model.py:354)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.nn import blocks as B
from sgnn_tpu.nn import init as I
from sgnn_tpu.ops import bn as BN
from sgnn_tpu.ops import conv as CV
from sgnn_tpu.ops import coords as C
from sgnn_tpu.ops import dense as D
from sgnn_tpu.ops.sparse import (
    SparseTensor,
    dense_to_sparse,
    make_sparse,
    sparse_to_dense,
)


# =============================================================== TSDFEncoder


def tsdf_encoder_init(key, cfg: SGNNConfig):
    """/root/reference/torch/model.py:69-143."""
    nfs = cfg.nf_per_level
    keys = jax.random.split(key, len(nfs) + 9)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    sparse_p, sparse_s = [], []
    nf_in = cfg.input_nf
    for lvl, nf in enumerate(nfs):
        p, s = B.encoder_layer_init(keys[lvl], nf_in, nf)
        sparse_p.append(p)
        sparse_s.append(s)
        nf_in = nf
    params["process_sparse"] = sparse_p
    stats["process_sparse"] = sparse_s

    nf = nfs[-1]
    nf0, nf1 = nf * 3 // 2, nf * 2
    nf2 = nf1
    nf3 = nf1 + nf2 if cfg.use_skip_dense else nf2
    nf4 = nf3 // 2
    nf4_in = nf4 + nf0 if cfg.use_skip_dense else nf4
    nf5 = nf4_in // 2
    k = iter(keys[len(nfs):])
    for name, cin, cout, ksz, tr in (
        ("encode_dense0", nf, nf0, 4, False),
        ("encode_dense1", nf0, nf1, 4, False),
        ("bottleneck_dense2", nf1, nf2, 1, False),
        ("decode_dense3", nf3, nf4, 4, True),
        ("decode_dense4", nf4_in, nf5, 4, True),
        ("final", nf5, cfg.nf_coarse, 1, False),
    ):
        p, s = B.conv_bn_relu_init(next(k), cin, cout, ksz, transpose=tr)
        params[name] = p
        stats[name] = s
    params["occpred"] = I.conv3d_init(next(k), 1, cfg.nf_coarse, 1)
    params["sdfpred"] = I.conv3d_init(next(k), 1, cfg.nf_coarse, 1)
    return params, stats


def _dense_cbr(params, stats, x, *, stride, padding, transpose, training,
               axis_name):
    if transpose:
        y = D.conv_transpose3d(x, params["conv"], stride=stride, padding=padding)
    else:
        y = D.conv3d(x, params["conv"], stride=stride, padding=padding)
    y, s_bn = BN.batch_norm_dense(
        params["bn"], stats["bn"], y, training=training, relu=True,
        axis_name=axis_name,
    )
    return y, {"bn": s_bn}


def tsdf_encoder_apply(params, stats, cfg: SGNNConfig, st: SparseTensor, *,
                       training, axis_name=None):
    """Returns (dense feats [B,Z8,Y8,X8,nf_coarse], dense out [...,2(occ,sdf)],
    list of sparse skip tensors, new_stats)."""
    s: dict[str, Any] = {"process_sparse": []}
    feats_sparse = []
    x = st
    n_levels = len(cfg.nf_per_level)
    for lvl in range(n_levels):
        cap_out = x.capacity  # strided output never exceeds input count
        x, ft2, s_lvl = B.encoder_layer_apply(
            params["process_sparse"][lvl], stats["process_sparse"][lvl], x,
            out_capacity=cap_out, training=training, axis_name=axis_name,
        )
        s["process_sparse"].append(s_lvl)
        feats_sparse.append(ft2)
    feats_sparse.append(x)  # ft3: post-downsample sparse feats at 1/8 res

    dense = sparse_to_dense(x)  # [B, Z/8, Y/8, X/8, nf]
    enc0, s["encode_dense0"] = _dense_cbr(
        params["encode_dense0"], stats["encode_dense0"], dense,
        stride=2, padding=1, transpose=False, training=training,
        axis_name=axis_name,
    )
    enc1, s["encode_dense1"] = _dense_cbr(
        params["encode_dense1"], stats["encode_dense1"], enc0,
        stride=2, padding=1, transpose=False, training=training,
        axis_name=axis_name,
    )
    bott, s["bottleneck_dense2"] = _dense_cbr(
        params["bottleneck_dense2"], stats["bottleneck_dense2"], enc1,
        stride=1, padding=0, transpose=False, training=training,
        axis_name=axis_name,
    )
    dec_in = jnp.concatenate([bott, enc1], -1) if cfg.use_skip_dense else bott
    dec0, s["decode_dense3"] = _dense_cbr(
        params["decode_dense3"], stats["decode_dense3"], dec_in,
        stride=2, padding=1, transpose=True, training=training,
        axis_name=axis_name,
    )
    dec_in = jnp.concatenate([dec0, enc0], -1) if cfg.use_skip_dense else dec0
    y, s["decode_dense4"] = _dense_cbr(
        params["decode_dense4"], stats["decode_dense4"], dec_in,
        stride=2, padding=1, transpose=True, training=training,
        axis_name=axis_name,
    )
    y, s["final"] = _dense_cbr(
        params["final"], stats["final"], y,
        stride=1, padding=0, transpose=False, training=training,
        axis_name=axis_name,
    )
    occ = D.conv3d(y, params["occpred"])
    sdf = D.conv3d(y, params["sdfpred"])
    # heads in f32: the loss and the occupancy threshold consume these
    out = jnp.concatenate([occ, sdf], -1).astype(jnp.float32)
    return y, out, feats_sparse, s


# ================================================================ Refinement


def refinement_init(key, nf_in: int, nf: int):
    """/root/reference/torch/model.py:169-207."""
    k1, k2, kn1, kl, ks = jax.random.split(key, 5)
    p_unet, s_unet = B.sparse_unet_init(k2, [nf, nf, nf])
    p_bn3, s_bn3 = BN.init_bn(nf * 3)
    p_bn_n2, s_bn_n2 = BN.init_bn(nf)
    params = {
        "p1": I.subm_conv_init(k1, 27, nf_in, nf),
        "p2": p_unet,
        "p3": p_bn3,
        "n1": I.subm_conv_init(kn1, 27, nf * 3, nf),
        "n2": p_bn_n2,
        "linear": I.linear_init(kl, nf, 1),
        "linearsdf": I.linear_init(ks, nf, 1),
    }
    stats = {"p2": s_unet, "p3": s_bn3, "n2": s_bn_n2}
    return params, stats


def refinement_apply(params, stats, cfg: SGNNConfig, st: SparseTensor, *,
                     out_capacity: int, training, axis_name=None):
    """One generative upsample level.

    Returns (next SparseTensor (pruned, at 2x res),
             (locs_unfilt, out[occ,sdf], num_unfilt) for the loss,
             overflow count, new_stats).
    """
    s: dict[str, Any] = {}
    x = CV.submanifold_conv3d(st, params["p1"])
    x, s["p2"] = B.sparse_unet_apply(
        params["p2"], stats["p2"], x, training=training, axis_name=axis_name
    )
    y, s["p3"] = BN.batch_norm(
        params["p3"], stats["p3"], x.feats, x.valid(),
        training=training, relu=True, axis_name=axis_name,
    )

    # 2x upsample: every voxel -> 8 children, nearest-neighbor features.
    locs_unfilt, feats_up = C.upsample_locs_x2(st.locs, y)
    num_unfilt = st.num_valid * 8
    Z, Y, X = st.spatial_size
    up = make_sparse(
        locs_unfilt, feats_up, num_unfilt, (Z * 2, Y * 2, X * 2),
        st.batch_size,
    )
    up = CV.submanifold_conv3d(up, params["n1"])
    y, s["n2"] = BN.batch_norm(
        params["n2"], stats["n2"], up.feats, up.valid(),
        training=training, relu=True, axis_name=axis_name,
    )
    occ = (y @ params["linear"]["weight"] + params["linear"]["bias"]).astype(
        jnp.float32
    )
    sdf = (
        y @ params["linearsdf"]["weight"] + params["linearsdf"]["bias"]
    ).astype(jnp.float32)
    out = jnp.concatenate([occ, sdf], -1)  # [8*cap, 2]

    keep = (jax.nn.sigmoid(occ[:, 0]) > 0.5) & up.valid()
    if cfg.pass_feats and cfg.pass_occ:
        nxt_feats = jnp.concatenate([y, out.astype(y.dtype)], -1)
    elif cfg.pass_feats:
        nxt_feats = y
    else:
        nxt_feats = out.astype(y.dtype)
    (nl, nf_), num, overflow = C.compact(
        keep, (up.locs, nxt_feats), out_capacity
    )
    nxt = make_sparse(nl, nf_, num, up.spatial_size, up.batch_size)
    return nxt, (up.locs, out, num_unfilt), overflow, s


# ========================================================== SurfacePrediction


def surface_pred_init(key, nf_in: int, nf: int, nf_out: int):
    """/root/reference/torch/model.py:249-272."""
    k1, k2, kl = jax.random.split(key, 3)
    p_unet, s_unet = B.sparse_unet_init(k2, [nf, nf, nf])
    p_bn3, s_bn3 = BN.init_bn(nf * 3)
    params = {
        "p1": I.subm_conv_init(k1, 27, nf_in, nf),
        "p2": p_unet,
        "p3": p_bn3,
        "linear": I.linear_init(kl, nf * 3, nf_out),
    }
    stats = {"p2": s_unet, "p3": s_bn3}
    return params, stats


def surface_pred_apply(params, stats, st: SparseTensor, *, training,
                       axis_name=None):
    s: dict[str, Any] = {}
    x = CV.submanifold_conv3d(st, params["p1"])
    x, s["p2"] = B.sparse_unet_apply(
        params["p2"], stats["p2"], x, training=training, axis_name=axis_name
    )
    y, s["p3"] = BN.batch_norm(
        params["p3"], stats["p3"], x.feats, x.valid(),
        training=training, relu=True, axis_name=axis_name,
    )
    sdf = (y @ params["linear"]["weight"] + params["linear"]["bias"]).astype(
        jnp.float32
    )
    return sdf, s


# ==================================================================== GenModel


def genmodel_init(key, cfg: SGNNConfig):
    """Full model parameters + BN stats. /root/reference/torch/model.py:276-314."""
    kenc, kref, ksurf = jax.random.split(key, 3)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    params["encoder"], stats["encoder"] = tsdf_encoder_init(kenc, cfg)

    L = cfg.num_hierarchy_levels
    nf_per = list(cfg.nf_per_level) + [cfg.nf_per_level[-1]]
    ref_p, ref_s = [], []
    rkeys = jax.random.split(kref, L - 1)
    for h in range(1, L):
        nf_in = nf_per[L - h] if cfg.use_skip_sparse else 0
        if cfg.pass_occ:
            nf_in += 2
        if cfg.pass_feats:
            nf_in += cfg.nf_coarse if h == 1 else cfg.nf
        p, s = refinement_init(rkeys[h - 1], nf_in, cfg.nf)
        ref_p.append(p)
        ref_s.append(s)
    params["refinement"] = ref_p
    stats["refinement"] = ref_s

    nf_in = nf_per[0] if cfg.use_skip_sparse else 0
    if cfg.pass_occ:
        nf_in += 2
    if cfg.pass_feats:
        nf_in += cfg.nf
    params["surfacepred"], stats["surfacepred"] = surface_pred_init(
        ksurf, nf_in, cfg.nf, 1
    )
    return params, stats


def concat_skip(skip: SparseTensor, x: SparseTensor) -> SparseTensor:
    """Append skip features at shared locations, zeros elsewhere.

    Same semantics as GenModel.concat_skip's indicator intersection
    (/root/reference/torch/model.py:338-355), expressed as one index-grid
    lookup + gather.
    """
    grid = skip.index_grid()
    keys = C.flat_key(x.locs, skip.spatial_size, skip.batch_size)
    rows = C.lookup(keys, grid)  # [cap] row+1; 0 -> zero feature row
    table = jnp.concatenate(
        [jnp.zeros((1, skip.num_channels), skip.feats.dtype), skip.masked_feats()],
        axis=0,
    )
    extra = table[rows]
    extra = jnp.where(x.valid()[:, None], extra, 0)
    return x.with_feats(jnp.concatenate([x.feats, extra], axis=-1))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "coarse_out", "refine_outs", "surf_locs", "surf_sdf",
        "surf_num_valid", "overflows",
    ),
    meta_fields=(),
)
@dataclasses.dataclass
class GenModelOutput:
    """Everything the loss and the inference pipeline need.

    coarse_out:    dense [B, Z8, Y8, X8, 2] (occ logit, sdf) — hierarchy
                   level 0 prediction over all coarse voxels.
    refine_outs:   per active refinement level h (1..num_refine_active):
                   (locs_unfilt [cap,4], out [cap,2], num_valid) BEFORE
                   occupancy pruning — what the reference appends to
                   `outputs` (/root/reference/torch/model.py:393).
    surf_locs/sdf: final surface prediction at the finest level (empty
                   placeholders when do_surf=False).
    overflows:     per-level compaction overflow counts (observability).
    """
    coarse_out: jax.Array
    refine_outs: list
    surf_locs: jax.Array
    surf_sdf: jax.Array
    surf_num_valid: jax.Array
    overflows: list


def genmodel_apply(params, stats, cfg: SGNNConfig, st: SparseTensor, *,
                   num_refine_active: int, do_surf: bool, training: bool,
                   axis_name=None):
    """Forward pass. /root/reference/torch/model.py:371-416.

    num_refine_active/do_surf are STATIC: levels fade in coarse-to-fine, so
    inactive levels are simply not traced (the reference skips them when
    loss_weights[h+1]==0, model.py:387-396).
    """
    # scope the conv backend to this trace (re-entrancy safe: ContextVar)
    with CV.backend(cfg.conv_backend):
        return _genmodel_apply_body(
            params, stats, cfg, st, num_refine_active=num_refine_active,
            do_surf=do_surf, training=training, axis_name=axis_name,
        )


def _genmodel_apply_body(params, stats, cfg, st, *, num_refine_active,
                         do_surf, training, axis_name):
    s: dict[str, Any] = {}
    # compute dtype: params stay f32; features flow in cfg.compute_dtype
    # (bf16 keeps the MXU fed at 2x rate; GEMM/BN accumulate in f32 and all
    # prediction heads emit f32)
    dt = jnp.dtype(cfg.compute_dtype)
    if st.feats.dtype != dt:
        st = st.with_feats(st.feats.astype(dt))
    x_dense, coarse_out, feats_sparse, s["encoder"] = tsdf_encoder_apply(
        params["encoder"], stats["encoder"], cfg, st,
        training=training, axis_name=axis_name,
    )

    # dense_coarse_to_sparse (model.py:315-336): threshold coarse occupancy.
    keep = jax.nn.sigmoid(coarse_out[..., 0]) > 0.5
    feat_list = []
    if cfg.pass_occ:
        feat_list.append(coarse_out.astype(dt))
    if cfg.pass_feats:
        feat_list.append(x_dense)
    dense_feats = jnp.concatenate(feat_list, -1)
    cap0 = cfg.level_capacities[0]
    x_sparse = dense_to_sparse(dense_feats, keep, cap0)

    refine_outs = []
    overflows = []
    L_ref = cfg.num_refine_levels
    new_ref_stats = [stats["refinement"][h] for h in range(L_ref)]
    for h in range(num_refine_active):
        if cfg.use_skip_sparse:
            x_sparse = concat_skip(feats_sparse[L_ref - h], x_sparse)
        cap_next = cfg.level_capacities[min(h + 1, cfg.num_hierarchy_levels - 1)]
        x_sparse, out_h, ovf, s_h = refinement_apply(
            params["refinement"][h], stats["refinement"][h], cfg, x_sparse,
            out_capacity=cap_next, training=training, axis_name=axis_name,
        )
        new_ref_stats[h] = s_h
        refine_outs.append(out_h)
        overflows.append(ovf)
    s["refinement"] = new_ref_stats

    surf_locs = x_sparse.locs
    surf_num = x_sparse.num_valid
    if do_surf and num_refine_active == L_ref:
        if cfg.use_skip_sparse:
            x_sparse = concat_skip(feats_sparse[0], x_sparse)
        surf_sdf, s["surfacepred"] = surface_pred_apply(
            params["surfacepred"], stats["surfacepred"], x_sparse,
            training=training, axis_name=axis_name,
        )
    else:
        surf_sdf = jnp.zeros((surf_locs.shape[0], 1), x_sparse.feats.dtype)
        surf_num = jnp.zeros((), jnp.int32)
        s["surfacepred"] = stats["surfacepred"]

    out = GenModelOutput(
        coarse_out=coarse_out,
        refine_outs=refine_outs,
        surf_locs=surf_locs,
        surf_sdf=surf_sdf,
        surf_num_valid=surf_num,
        overflows=overflows,
    )
    return out, s

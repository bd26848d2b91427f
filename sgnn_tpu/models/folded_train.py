"""Folded (lane-dense) TRAINING execution of GenModel.

The training-path counterpart of models/folded_flow.py: the same
[B, Z+2, Y+2, xq, 128] lane-folded layout (8 x-voxels x 16 channels per
vector register — no XLA lane padding, no relayout copies), but built
entirely from differentiable XLA ops so jax.grad works:

  * 3^3 submanifold convs  -> ops/folded.py:conv_folded_train, a custom
                              VJP: Pallas kernel forward and input-grad
                              (flip-transposed taps) on TPU with
                              conv_folded_xla (the same tap algebra as 18
                              dot_generals) elsewhere; dW as 18 reduce-
                              GEMMs + the _fold_weights pattern adjoint
  * stride-2 / upsample    -> lane GEMMs (already XLA)
  * BN                     -> bn_folded(training=True) lane moments with
                              optional psum over the DP axis

Control flow, stats threading, and jax.checkpoint placement mirror
models/dense_flow.py:genmodel_apply_dense exactly (which mirrors
/root/reference/torch/model.py:371-416); the returned DenseFlowOutput and
new-stats pytree are drop-in for train/step.py. Cross-checked against the
dense_flow training step by tests/test_folded_train.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.models.dense_flow import DenseFlowOutput, dense_trunk
from sgnn_tpu.ops import folded as FO
from sgnn_tpu.ops.folded import FGrid
from sgnn_tpu.ops.sparse import SparseTensor

CPAD = 16


def _mask_bn_f(params, stats, groups, fm, *, training, axis_name,
               relu=True):
    """Grouped masked BN in folded layout; stats contract matches
    dense_flow._mask_bn (concatenated per-group moments)."""
    outs = []
    means, vars_ = [], []
    off = 0
    for fg in groups:
        c = fg.real_c
        p = {k: params[k][off:off + c] for k in ("scale", "bias")}
        st = {k: stats[k][off:off + c] for k in ("mean", "var")}
        y, ns = FO.bn_folded(p, st, fg, fm, training=training, relu=relu,
                             axis_name=axis_name)
        outs.append(y)
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


def _resblock_f(params, stats, fg, fm, *, training, axis_name,
                fuse_bn=True):
    s = {}
    if training and fuse_bn:
        # fused [batch BN+ReLU -> conv] sites: normalize rides the conv
        # kernel's input affine (ops/folded.py:bn_conv_folded_train) —
        # no standalone full-grid normalize pass per site
        y, s["bn0"] = FO.bn_conv_folded_train(
            params["bn0"], stats["bn0"], [fg], fm,
            params["conv0"], params["conv0"].shape[-1],
            axis_name=axis_name,
        )
        y, s["bn1"] = FO.bn_conv_folded_train(
            params["bn1"], stats["bn1"], [y], fm,
            params["conv1"], params["conv1"].shape[-1],
            axis_name=axis_name,
        )
        return fg.with_data(fg.data + y.data), s
    y, s["bn0"] = _mask_bn_f(params["bn0"], stats["bn0"], [fg], fm,
                             training=training, axis_name=axis_name)
    y = FO.subm_conv_folded_train(y, fm, params["conv0"],
                                params["conv0"].shape[-1])
    y, s["bn1"] = _mask_bn_f(params["bn1"], stats["bn1"], [y], fm,
                             training=training, axis_name=axis_name)
    y = FO.subm_conv_folded_train(y, fm, params["conv1"],
                                params["conv1"].shape[-1])
    return fg.with_data(fg.data + y.data), s


def _strided_site_f(groups, fm, w8, cout):
    down = FO.strided_conv_folded(groups, w8, cout)
    down_fm = FO.mask_down_folded(fm)
    return down.with_data(down.data * down_fm.data), down_fm


def _strided_site_cross_f(y, fm, w8, cout, cpad_out):
    """Differentiable stride-2 site that WIDENS the lane budget across
    the stride (cpad -> 2*cpad: one fine block -> one coarse block), the
    XLA counterpart of the fused kernel's cross mode
    (ops/pallas/conv3d_folded.py:fused_downconv_folded)."""
    cpad = y.cpad
    Z, Y, X = y.dims
    dt = y.data.dtype
    W = FO._strided_w_cross(w8, cpad, cpad_out, y.real_c, cout).astype(dt)
    MD = jnp.asarray(FO._mask_down_cross(cpad, cpad_out), dt)
    d = y.data[:, 1:Z + 1, 1:Y + 1]
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
    xq_out = FO._xq_for(X // 2, cpad_out)
    if out.shape[3] > xq_out:
        out, mc = out[:, :, :, :xq_out], mc[:, :, :, :xq_out]
    elif out.shape[3] < xq_out:
        padw = ((0, 0),) * 3 + ((0, xq_out - out.shape[3]), (0, 0))
        out, mc = jnp.pad(out, padw), jnp.pad(mc, padw)
    dims_c = (Z // 2, Y // 2, X // 2)
    return (
        FGrid(FO._rehalo(out, xq_out), dims_c, cout, cpad_out),
        FGrid(FO._rehalo(mc, xq_out), dims_c, cpad_out, cpad_out),
    )


def _unet_f(params, stats, groups, fm, *, training, axis_name,
            fuse_bn=True):
    s = {}
    assert len(groups) == 1
    x, s["block"] = _resblock_f(params["block"], stats["block"], groups[0],
                                fm, training=training, axis_name=axis_name,
                                fuse_bn=fuse_bn)
    if "deeper" not in params:
        return [x], s
    if training and fuse_bn:
        # fused [BN+ReLU -> stride-2 conv -> coarse mask] site
        down, down_fm, s["down_bn"] = FO.bn_downconv_folded_train(
            params["down_bn"], stats["down_bn"], x, fm,
            params["down_conv"], params["down_conv"].shape[-1],
            axis_name=axis_name,
        )
    else:
        y, s["down_bn"] = _mask_bn_f(params["down_bn"], stats["down_bn"],
                                     [x], fm, training=training,
                                     axis_name=axis_name)
        down, down_fm = _strided_site_f(y, fm, params["down_conv"],
                                        params["down_conv"].shape[-1])
    deep, s["deeper"] = _unet_f(params["deeper"], stats["deeper"], [down],
                                down_fm, training=training,
                                axis_name=axis_name, fuse_bn=fuse_bn)
    ups = []
    for d in deep:
        u = FO.upsample2_folded(d)
        ups.append(u.with_data(u.data * fm.data))
    return [x, *ups], s


def _encoder_layer_f(params, stats, groups, fm, *, training, axis_name,
                     cpad_out=None, fuse_bn=True):
    s = {}
    x = FO.subm_conv_folded_train(groups, fm, params["p1"],
                                params["p1"].shape[-1])
    x, s["p2"] = _resblock_f(params["p2"], stats["p2"], x, fm,
                             training=training, axis_name=axis_name,
                             fuse_bn=fuse_bn)
    # p2_bn stays a materialized pass (its output is the skip tensor);
    # the strided conv + mask-down fuse into one kernel when enabled
    y, s["p2_bn"] = _mask_bn_f(params["p2_bn"], stats["p2_bn"], [x], fm,
                               training=training, axis_name=axis_name)
    if training and fuse_bn:
        down, down_fm = FO.downconv_folded_train(
            y[0], fm, params["p3"], params["p3"].shape[-1],
            cpad_out=cpad_out,
        )
    elif cpad_out is not None and cpad_out != y[0].cpad:
        down, down_fm = _strided_site_cross_f(
            y[0], fm, params["p3"], params["p3"].shape[-1], cpad_out)
    else:
        down, down_fm = _strided_site_f(y, fm, params["p3"],
                                        params["p3"].shape[-1])
    z, s["p3_bn"] = _mask_bn_f(params["p3_bn"], stats["p3_bn"], [down],
                               down_fm, training=training,
                               axis_name=axis_name)
    return z[0], down_fm, (y[0], fm), s


def genmodel_apply_folded_train(params, stats, cfg: SGNNConfig,
                                st: SparseTensor, *,
                                num_refine_active: int, do_surf: bool,
                                training: bool = True, axis_name=None):
    """Training forward in the folded layout; returns (DenseFlowOutput,
    new_stats) exactly like genmodel_apply_dense(training=True)."""
    s: dict[str, Any] = {}
    dt = jnp.dtype(cfg.compute_dtype)
    Z, Y, X = st.spatial_size
    B = st.batch_size

    # level 0 at cpad 8 when widths allow (same rule as the inference
    # path): half the GEMM rows/bytes of every full-res op, fwd AND bwd
    cpad0 = 8 if (cfg.input_nf <= 8 and cfg.nf_per_level[0] <= 8
                  and X % 16 == 0) else CPAD
    fg, fm = FO.scatter_sparse(
        st.locs, st.feats, st.num_valid, st.spatial_size, B,
        cpad=cpad0, dtype=dt, feat_bound=cfg.truncation,
    )

    # ---- encoder sparse levels (checkpointed: level-0 residuals are
    # full-resolution, matching dense_flow's placement)
    fuse_bn = cfg.fuse_train_bn

    def enc_layer(p, st_l, x, m, co):
        return _encoder_layer_f(p, st_l, [x], m, training=training,
                                axis_name=axis_name, cpad_out=co,
                                fuse_bn=fuse_bn)

    if training:
        enc_layer = jax.checkpoint(enc_layer, static_argnums=(4,))
    enc_s = []
    skips = []
    x, m = fg, fm
    for lvl in range(len(cfg.nf_per_level)):
        x, m, ft2, s_lvl = enc_layer(
            params["encoder"]["process_sparse"][lvl],
            stats["encoder"]["process_sparse"][lvl], x, m,
            CPAD if lvl == 0 and cpad0 != CPAD else None,
        )
        enc_s.append(s_lvl)
        if lvl == 0 and cpad0 != CPAD:
            # the full-res skip is consumed at CPAD (surface p1 site)
            ft2 = (FO.repack_cpad(ft2[0], CPAD), ft2[1])
        skips.append(ft2)
    skips.append((x, m))
    s["encoder"] = {"process_sparse": enc_s}

    # ---- coarse dense trunk (1/8 res, unfolded — cheap at this volume)
    x8 = FO.unfold(x)
    y, coarse_out, s_trunk = dense_trunk(
        params["encoder"], stats["encoder"], cfg, x8,
        training=training, axis_name=axis_name,
    )
    s["encoder"].update(s_trunk)

    cur_mask_dense = jax.nn.sigmoid(coarse_out[..., 0]) > 0.5
    cur_fm = FO.fold_mask(cur_mask_dense, CPAD, dt)
    cur = []
    if cfg.pass_occ:
        o = FO.fold(coarse_out.astype(dt), CPAD)
        cur.append(o.with_data(o.data * cur_fm.data))
    if cfg.pass_feats:
        f = FO.fold(y, CPAD)
        cur.append(f.with_data(f.data * cur_fm.data))

    # ---- refinement levels (each checkpointed whole, like dense_flow)
    L_ref = cfg.num_refine_levels
    ref_outs = []
    ref_masks = []
    new_ref_stats = [stats["refinement"][h] for h in range(L_ref)]

    def refine_level(p, st_h, cur, cur_fm):
        s_h = {}
        z = FO.subm_conv_folded_train(cur, cur_fm, p["p1"],
                                    p["p1"].shape[-1])
        zg, s_h["p2"] = _unet_f(p["p2"], st_h["p2"], [z], cur_fm,
                                training=training, axis_name=axis_name,
                                fuse_bn=fuse_bn)
        fm_unfilt = FO.upsample2_folded(cur_fm)
        w2 = jnp.concatenate(
            [p["linear"]["weight"], p["linearsdf"]["weight"]], axis=1
        )
        b2 = jnp.concatenate([p["linear"]["bias"], p["linearsdf"]["bias"]])
        if training and fuse_bn:
            # fused [p3 BN -> 2x upsample -> n1 conv] + fused head site:
            # the upsampled group grids and the standalone n2 normalize
            # pass never materialize in the forward
            up, s_h["p3"] = FO.bn_upconv_folded_train(
                p["p3"], st_h["p3"], zg, cur_fm, fm_unfilt, p["n1"],
                p["n1"].shape[-1], axis_name=axis_name,
            )
            upm, o2m, new_fm, out2, s_h["n2"] = \
                FO.bn_head_site_folded_train(
                    p["n2"], st_h["n2"], up, fm_unfilt, w2, b2,
                    axis_name=axis_name,
                )
            nxt = []
            if cfg.pass_feats:
                nxt.append(upm)
            if cfg.pass_occ:
                nxt.append(o2m)
            return nxt, new_fm, out2, fm_unfilt, s_h
        zb, s_h["p3"] = _mask_bn_f(p["p3"], st_h["p3"], zg, cur_fm,
                                   training=training, axis_name=axis_name)
        ups = [FO.upsample2_folded(g) for g in zb]
        up = FO.subm_conv_folded_train(ups, fm_unfilt, p["n1"],
                                     p["n1"].shape[-1])
        upl, s_h["n2"] = _mask_bn_f(p["n2"], st_h["n2"], [up], fm_unfilt,
                                    training=training, axis_name=axis_name)
        up = upl[0]
        out2 = FO.linear_folded(up, w2, b2)  # f32, occ = channel 0
        new_fm = FO.occ_mask_folded(out2, dtype=dt)
        new_fm = new_fm.with_data(new_fm.data * fm_unfilt.data)
        nxt = []
        if cfg.pass_feats:
            nxt.append(up.with_data(up.data * new_fm.data))
        if cfg.pass_occ:
            nxt.append(out2.with_data(out2.data.astype(dt) * new_fm.data))
        return nxt, new_fm, out2, fm_unfilt, s_h

    if training:
        refine_level = jax.checkpoint(refine_level)

    for h in range(num_refine_active):
        p = params["refinement"][h]
        st_h = stats["refinement"][h]
        if cfg.use_skip_sparse:
            sk, _sk_fm = skips[L_ref - h]
            cur = [*cur, sk.with_data(sk.data * cur_fm.data)]
        cur, cur_fm, out2, fm_unfilt, s_h = refine_level(
            p, st_h, cur, cur_fm
        )
        ref_outs.append(FO.unfold(out2).astype(jnp.float32))
        ref_masks.append(FO.unfold(fm_unfilt)[..., 0] > 0.5)
        new_ref_stats[h] = s_h
    s["refinement"] = new_ref_stats

    # ---- surface prediction
    if do_surf and num_refine_active == L_ref:
        p = params["surfacepred"]
        st_s = stats["surfacepred"]
        if cfg.use_skip_sparse:
            sk, _sk_fm = skips[0]
            cur = [*cur, sk.with_data(sk.data * cur_fm.data)]

        def surf_block(p, st_s, cur, cur_fm):
            s_s = {}
            z = FO.subm_conv_folded_train(cur, cur_fm, p["p1"],
                                        p["p1"].shape[-1])
            zg, s_s["p2"] = _unet_f(p["p2"], st_s["p2"], [z], cur_fm,
                                    training=training, axis_name=axis_name,
                                    fuse_bn=fuse_bn)
            if training and fuse_bn:
                # fused [per-group p3 BN -> summed linear head] site
                surf_fg, s_s["p3"] = FO.bn_surf_head_folded_train(
                    p["p3"], st_s["p3"], zg, cur_fm,
                    p["linear"]["weight"], p["linear"]["bias"],
                    axis_name=axis_name,
                )
                return FO.unfold(surf_fg)[..., 0], s_s
            zb, s_s["p3"] = _mask_bn_f(p["p3"], st_s["p3"], zg, cur_fm,
                                       training=training,
                                       axis_name=axis_name)
            surf_fg = None
            off = 0
            for g in zb:
                c = g.real_c
                o = FO.linear_folded(
                    g, p["linear"]["weight"][off:off + c], None
                )
                surf_fg = o if surf_fg is None else surf_fg.with_data(
                    surf_fg.data + o.data
                )
                off += c
            surf_fg = surf_fg.with_data(
                surf_fg.data + jnp.tile(
                    jnp.zeros((CPAD,), jnp.float32).at[:1].set(
                        p["linear"]["bias"].astype(jnp.float32)
                    ),
                    FO.LANES // CPAD,
                )
            )
            return FO.unfold(surf_fg)[..., 0], s_s

        if training:
            surf_block = jax.checkpoint(surf_block)
        surf, s_s = surf_block(p, st_s, cur, cur_fm)
        surf_mask = FO.unfold(cur_fm)[..., 0] > 0.5
        s["surfacepred"] = s_s
    else:
        surf = jnp.zeros((B, Z, Y, X), jnp.float32)
        surf_mask = jnp.zeros((B, Z, Y, X), jnp.bool_)
        s["surfacepred"] = stats["surfacepred"]

    return DenseFlowOutput(
        coarse_out=coarse_out,
        refine_outs=ref_outs,
        refine_masks_unfilt=ref_masks,
        surf_sdf=surf,
        surf_mask=surf_mask,
    ), s

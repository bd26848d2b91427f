"""Folded (lane-dense) execution of GenModel — the TPU inference fast path.

Same semantics as models/dense_flow.py (which mirrors /root/reference/
torch/model.py:371-416), but every full/half/quarter-resolution activation
lives in the folded layout of ops/folded.py: [B, Z+2, Y+2, xq, 128] with
F = 128/16 x-voxels packed into lanes. Why this exists: XLA:TPU physically
inflates channels-last narrow-C grids ~8-16x (lane padding), so the
unfolded execution pays that inflation on every elementwise pass and
inserts layout copies around every conv. Folded, the pipeline is:

  * 3^3 submanifold convs  -> lane-folded Pallas kernel (tri-block-
                              diagonal GEMMs at full MXU width)
  * stride-2 convs         -> leading-dim slices + [256->128] lane GEMMs
  * 2x upsampling          -> leading repeats + [128->256] lane dup GEMM
  * heads / occupancy      -> block-diagonal lane GEMMs
  * BN / masking / adds    -> full-width vector ops

with ZERO per-op layout conversions: unfolds happen only at the coarse
trunk boundary (1/8 resolution, cheap) and when emitting outputs.

This module is the INFERENCE forward (fused eval-BN kernels, no stats
threading); training in the same folded layout lives in
models/folded_train.py (differentiable ops + custom-VJP convs).
Cross-checked against dense_flow by tests/test_folded_model.py on
shared inputs.

Parameters/stats are THE SAME pytree as models/sgnn.py — sgnn.pth
checkpoint conversions work unchanged.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.models.dense_flow import DenseFlowOutput, dense_trunk
from sgnn_tpu.ops import folded as FO
from sgnn_tpu.ops.folded import FGrid
from sgnn_tpu.ops.sparse import SparseTensor

CPAD = 16  # uniform lane budget: all live widths here are <= 16


def _bn_groups(params, stats, groups, fm):
    """Eval-mode BN over grouped FGrids with full-width param slices."""
    outs = []
    off = 0
    for fg in groups:
        c = fg.real_c
        p = {k: params[k][off:off + c] for k in ("scale", "bias")}
        st = {k: stats[k][off:off + c] for k in ("mean", "var")}
        y, _ = FO.bn_folded(p, st, fg, fm, training=False)
        outs.append(y)
        off += c
    return outs


def _resblock(params, stats, fg, fm, q=False, ex=lambda g: g):
    # both BN -> conv pairs run as single fused kernel sites (v3); the
    # identity branch is added INSIDE the second kernel (no full-grid
    # XLA add pass). ``ex``: z halo exchange under spatial sharding
    # (conv inputs only; the residual is interior-only).
    y = FO.subm_conv_fused(
        [ex(fg)], fm, params["conv0"], params["conv0"].shape[-1],
        bn_params=params["bn0"], bn_stats=stats["bn0"], quantize=q,
    )
    return FO.subm_conv_fused(
        [ex(y)], fm, params["conv1"], params["conv1"].shape[-1],
        bn_params=params["bn1"], bn_stats=stats["bn1"], residual=fg,
        quantize=q,
    )


def _unet(params, stats, fg, fm, q=False, ex=lambda g: g,
          exm=lambda g: g, defer=False):
    """FullyConvolutionalNet (reps=1, residual); returns GROUPS (the
    virtual concat of pyramid levels) + the same fm.

    ``defer=True`` returns (FGrid, scale) pairs at NATIVE resolutions
    (scale = remaining NN-upsample factor) for consumers that read
    coarse groups directly (surf_head_packed) — the upsampled grids are
    never materialized. Default materializes via upsample2_folded."""
    x = _resblock(params["block"], stats["block"], fg, fm, q=q, ex=ex)
    if "deeper" not in params:
        return [(x, 1)] if defer else [x]
    # down path: BN + stride-2 conv + mask-down as ONE fused kernel
    # (consumes interior rows only — no exchange needed)
    down, down_fm = FO.downconv_fused(
        x, fm, params["down_conv"], params["down_conv"].shape[-1],
        bn_params=params["down_bn"], bn_stats=stats["down_bn"],
        quantize=q,
    )
    down_fm = exm(down_fm)
    deep = _unet(params["deeper"], stats["deeper"], down, down_fm, q=q,
                 ex=ex, exm=exm, defer=defer)
    if defer:
        return [(x, 1), *[(d, 2 * s) for d, s in deep]]
    # NO mask multiply on the upsampled groups: every consumer (upconv /
    # head / downstream conv sites) applies the level mask in-kernel with
    # its input affine, and garbage can only sit at fine sites whose
    # coarse parent is inactive — all masked out there (maxpool mask
    # invariant). Saves one full-grid pass per upsampled group.
    return [x, *[FO.upsample2_folded(d) for d in deep]]


def _encoder_layer(params, stats, groups, fm, cpad_out=None, q=False,
                   ex=lambda g: g, exm=lambda g: g):
    x = FO.subm_conv_fused([ex(g) for g in groups], fm, params["p1"],
                           params["p1"].shape[-1], quantize=q)
    x = _resblock(params["p2"], stats["p2"], x, fm, q=q, ex=ex)
    y = _bn_groups(params["p2_bn"], stats["p2_bn"], [x], fm)[0]
    # y is also the skip output, so its BN stays materialized; the
    # strided conv + mask-down fuse into one kernel (widening the lane
    # budget across the stride when level 0 runs at cpad 8)
    down, down_fm = FO.downconv_fused(y, fm, params["p3"],
                                      params["p3"].shape[-1],
                                      cpad_out=cpad_out, quantize=q)
    down_fm = exm(down_fm)
    z = _bn_groups(params["p3_bn"], stats["p3_bn"], [down], down_fm)[0]
    return z, down_fm, (y, fm)


def genmodel_apply_folded(params, stats, cfg: SGNNConfig, st: SparseTensor,
                          *, num_refine_active: int, do_surf: bool,
                          sp_axis=None, want_level_outputs: bool = True,
                          prep: list | None = None):
    """Inference forward in the folded layout. Output contract matches
    genmodel_apply_dense (a DenseFlowOutput of unfolded arrays).

    ``sp_axis``: name of a SPATIAL mesh axis to shard the scene's z
    extent over (scenes beyond one chip's HBM at folded speed). Must be
    called inside shard_map with ``st`` replicated across the axis and
    cfg.input_dim the GLOBAL dims; the folded layout shards naturally
    over z (its leading spatial dim carries the one-voxel halo ring),
    so each 3^3 conv/upconv site refills its ring from the neighbors'
    boundary planes (ops/folded.py:halo_exchange_z over ICI) and every
    other op is slab-local. Requires Z % (32 * axis_size) == 0. Outputs
    are local z-slabs.

    ``want_level_outputs=False``: per-level raw head grids and masks are
    not materialized (refine_outs / refine_masks_unfilt come back as
    Nones) — the head kernels skip their raw f32 output entirely, which
    at the finest level is the largest HBM write of the forward. Use for
    production inference where only the surface is exported (matches
    what the reference's test_scene.py:96-100 saves).

    ``prep``: prepared per-site weights from prepare_folded_weights().
    When given, every fused site consumes its kernel-ready weights from
    this list (ordinary jit inputs) instead of re-folding/quantizing the
    raw params on device each forward (~1.3 ms at headline dims —
    BENCH_NOTES round-5 roofline). Must have been prepared with the same
    cfg/flags (and the same X %% 16 class, which picks cpad0)."""
    if prep is not None:
        assert sp_axis is None, "prep + spatial sharding not supported"
        assert FO._prep_state is None
        FO._prep_state = FO._PrepState("use", prep)
        try:
            out = genmodel_apply_folded(
                params, stats, cfg, st,
                num_refine_active=num_refine_active, do_surf=do_surf,
                sp_axis=None, want_level_outputs=want_level_outputs,
            )
            used = FO._prep_state.i
            assert used == len(prep), (
                f"prep stream mismatch: {used} consumed, {len(prep)} given"
            )
            return out
        finally:
            FO._prep_state = None

    dt = jnp.dtype(cfg.compute_dtype)
    Z, Y, X = st.spatial_size
    B = st.batch_size

    if sp_axis is not None:
        n_sp = jax.lax.axis_size(sp_axis)
        assert Z % (32 * n_sp) == 0, (
            f"spatial folded: Z={Z} must divide by 32*{n_sp}"
        )
        ex = lambda g: FO.halo_exchange_z(g, sp_axis)  # noqa: E731
    else:
        ex = lambda g: g  # noqa: E731
    exm = ex  # masks use the same exchange (conv tiles read halo mask)

    # level 0 (full resolution, the most expensive level) runs at cpad 8
    # when its live widths allow: 16 voxels per vector register — half the
    # GEMM rows and half the grid bytes of every level-0 op
    cpad0 = 8 if (cfg.input_nf <= 8 and cfg.nf_per_level[0] <= 8
                  and X % 16 == 0) else CPAD
    q8 = bool(getattr(cfg, "quantize_int8", False))
    if sp_axis is not None:
        fg, fm = FO.scatter_sparse_sharded(
            st.locs, st.feats, st.num_valid, st.spatial_size, B, sp_axis,
            cpad=cpad0, dtype=dt, feat_bound=cfg.truncation,
        )
    else:
        fg, fm = FO.scatter_sparse(
            st.locs, st.feats, st.num_valid, st.spatial_size, B,
            cpad=cpad0, dtype=dt, feat_bound=cfg.truncation,
            presorted=bool(getattr(cfg, "input_presorted", False)),
        )
    fm = exm(fm)

    # ---- encoder sparse levels (folded)
    skips = []
    x, m = fg, fm
    for lvl in range(len(cfg.nf_per_level)):
        x, m, ft2 = _encoder_layer(
            params["encoder"]["process_sparse"][lvl],
            stats["encoder"]["process_sparse"][lvl], [x], m,
            cpad_out=CPAD if lvl == 0 and cpad0 != CPAD else None,
            q=q8, ex=ex, exm=exm,
        )
        if lvl == 0 and cpad0 != CPAD:
            # the full-res skip is consumed at cpad 16 (surface p1 site)
            ft2 = (FO.repack_cpad(ft2[0], CPAD), ft2[1])
        skips.append(ft2)
    skips.append((x, m))  # ft3 at 1/8 res

    # ---- coarse dense trunk (1/8 res): unfold once, run the shared XLA
    # trunk, fold the results back — all cheap at this volume
    x8 = FO.unfold(x)
    y, coarse_out, _ = dense_trunk(
        params["encoder"], stats["encoder"], cfg, x8,
        training=False, axis_name=None, sp_axis=sp_axis,
    )

    cur_mask_dense = jax.nn.sigmoid(coarse_out[..., 0]) > 0.5
    cur_fm = exm(FO.fold_mask(cur_mask_dense, CPAD, dt))
    cur = []
    if cfg.pass_occ:
        o = FO.fold(coarse_out.astype(dt), CPAD)
        cur.append(o.with_data(o.data * cur_fm.data))
    if cfg.pass_feats:
        f = FO.fold(y, CPAD)
        cur.append(f.with_data(f.data * cur_fm.data))

    # ---- refinement levels
    L_ref = cfg.num_refine_levels
    ref_outs = []
    ref_masks = []

    def refine_level(p, st_h, cur, cur_fm):
        z = FO.subm_conv_fused([ex(g) for g in cur], cur_fm, p["p1"],
                               p["p1"].shape[-1], quantize=q8)
        zg = _unet(p["p2"], st_h["p2"], z, cur_fm, q=q8, ex=ex, exm=exm)
        # serving path (no per-level outputs, kernels on): the unfiltered
        # fine mask is the NN-dup of cur_fm — upconv and the head site
        # expand it in-register from the coarse grid, so it never
        # materializes in HBM (three full-grid passes saved per level)
        fuse_mask = not (want_level_outputs
                         or os.environ.get("SGNN_NO_UPCONV")
                         or os.environ.get("SGNN_NO_HEADK")
                         or os.environ.get("SGNN_NO_MASKFUSE"))
        fm_unfilt = (None if fuse_mask
                     else exm(FO.upsample2_folded(cur_fm)))
        # generative 2x upsample + n1 conv as ONE kernel reading the
        # coarse groups, with the p3 BN folded into its input affine
        if os.environ.get("SGNN_NO_UPCONV"):
            zb = _bn_groups(p["p3"], st_h["p3"], zg, cur_fm)
            ups = [ex(FO.upsample2_folded(g)) for g in zb]
            up = FO.subm_conv_fused(ups, fm_unfilt, p["n1"],
                                    p["n1"].shape[-1])
        else:
            up = FO.upconv_fused([ex(g) for g in zg], cur_fm, fm_unfilt,
                                 p["n1"], p["n1"].shape[-1],
                                 bn_params=p["p3"], bn_stats=st_h["p3"],
                                 quantize=q8)
        w2 = jnp.concatenate(
            [p["linear"]["weight"], p["linearsdf"]["weight"]], axis=1
        )
        b2 = jnp.concatenate([p["linear"]["bias"], p["linearsdf"]["bias"]])
        if os.environ.get("SGNN_NO_HEADK"):
            up = _bn_groups(p["n2"], st_h["n2"], [up], fm_unfilt)[0]
            out2 = FO.linear_folded(up, w2, b2)  # f32, occ = channel 0
            new_fm = FO.occ_mask_folded(out2, dtype=dt)
            new_fm = new_fm.with_data(new_fm.data * fm_unfilt.data)
            upm = up.with_data(up.data * new_fm.data)
            o2m = out2.with_data(out2.data.astype(dt) * new_fm.data)
        else:
            # n2-BN + heads + occupancy gate + masking as ONE kernel
            upm, o2m, new_fm, out2 = FO.head_site_fused(
                up, cur_fm if fuse_mask else fm_unfilt,
                p["n2"], st_h["n2"], w2, b2, dtype=dt,
                emit_raw=want_level_outputs,
                fm_scale=2 if fuse_mask else 1,
            )
        new_fm = exm(new_fm)
        nxt = []
        if cfg.pass_feats:
            nxt.append(upm)
        if cfg.pass_occ:
            nxt.append(o2m)
        return nxt, new_fm, out2, fm_unfilt

    for h in range(num_refine_active):
        p = params["refinement"][h]
        st_h = stats["refinement"][h]
        if cfg.use_skip_sparse:
            sk, _sk_fm = skips[L_ref - h]
            cur = [*cur, sk.with_data(sk.data * cur_fm.data)]
        cur, cur_fm, out2, fm_unfilt = refine_level(p, st_h, cur, cur_fm)
        if want_level_outputs:
            ref_outs.append(FO.unfold(out2).astype(jnp.float32))
            ref_masks.append(FO.unfold(fm_unfilt)[..., 0] > 0.5)
        else:
            ref_outs.append(None)
            ref_masks.append(None)

    # ---- surface prediction
    if do_surf and num_refine_active == L_ref:
        p = params["surfacepred"]
        st_s = stats["surfacepred"]
        if cfg.use_skip_sparse:
            sk, _sk_fm = skips[0]
            cur = [*cur, sk.with_data(sk.data * cur_fm.data)]
        z = FO.subm_conv_fused([ex(g) for g in cur], cur_fm, p["p1"],
                               p["p1"].shape[-1], quantize=q8)
        use_pack = not (os.environ.get("SGNN_NO_HEADK")
                        or os.environ.get("SGNN_NO_SURFPACK"))
        zg = _unet(p["p2"], st_s["p2"], z, cur_fm, q=q8, ex=ex, exm=exm,
                   defer=use_pack)
        if use_pack:
            # multi-scale packed head: per-group GEMMs at native res,
            # in-kernel NN expansion + channel packing — no full-res
            # upsampled groups, no 128-lane f32 grid, no unfold
            surf, surf_mask = FO.surf_head_packed(
                zg, cur_fm, p["p3"], st_s["p3"],
                p["linear"]["weight"], p["linear"]["bias"],
            )
        elif os.environ.get("SGNN_NO_HEADK"):
            zg = _bn_groups(p["p3"], st_s["p3"], zg, cur_fm)
            surf_fg = None
            off = 0
            for g in zg:
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
        else:
            # p3-BN groups + summed linear head as ONE kernel
            surf_fg = FO.surf_head_fused(
                zg, cur_fm, p["p3"], st_s["p3"],
                p["linear"]["weight"], p["linear"]["bias"],
            )
        if not use_pack:
            surf = FO.unfold(surf_fg)[..., 0]
            surf_mask = FO.unfold(cur_fm)[..., 0] > 0.5
    else:
        surf = jnp.zeros((B, Z, Y, X), jnp.float32)
        surf_mask = jnp.zeros((B, Z, Y, X), jnp.bool_)

    return DenseFlowOutput(
        coarse_out=coarse_out,
        refine_outs=ref_outs,
        refine_masks_unfilt=ref_masks,
        surf_sdf=surf,
        surf_mask=surf_mask,
    )


def prepare_folded_weights(params, stats, cfg: SGNNConfig, *,
                           num_refine_active: int, do_surf: bool = True,
                           want_level_outputs: bool = False,
                           dims_like: tuple | None = None) -> list:
    """Hoist all per-site weight preparation out of the serving forward.

    Runs genmodel_apply_folded ONCE in record mode on tiny dims: every
    fused site computes its kernel-ready weight pytree (tap-folded conv
    matrices, strided/mask-down matrices, int8-quantized weights + scales,
    BN eval-affines, head lane tiles) and returns a zeros dummy instead of
    dispatching its Pallas kernel. The pass runs EAGERLY ON THE CPU
    backend (host copies of the params) — no TPU compile, <1 s — and
    returns the prepared list to pass as genmodel_apply_folded(prep=...).

    The list is dims-independent, so ONE prepare serves every scene
    bucket; only the X %% 16 class matters (it selects the encoder's
    cpad0 branch), which ``dims_like`` pins (default cfg.input_dim).
    Flags must match the serving call: the record and use passes must
    take identical branches so the per-site stream order lines up
    (asserted at use time)."""
    import numpy as np

    from sgnn_tpu.ops.sparse import make_sparse

    Z0, Y0, X0 = dims_like or cfg.input_dim
    tx = 64 if X0 % 16 == 0 else 56
    tiny = (16, 16, tx)
    cpu = jax.devices("cpu")[0]
    params_h = jax.device_get(params)
    stats_h = jax.device_get(stats)
    assert FO._prep_state is None
    FO._prep_state = FO._PrepState("record")
    try:
        with jax.default_device(cpu):
            st = make_sparse(
                np.full((8, 4), -1, np.int32),
                np.zeros((8, 1), np.float32),
                0, tiny, 1,
            )
            genmodel_apply_folded(
                params_h, stats_h, cfg, st,
                num_refine_active=num_refine_active, do_surf=do_surf,
                want_level_outputs=want_level_outputs,
            )
        return FO._prep_state.items
    finally:
        FO._prep_state = None

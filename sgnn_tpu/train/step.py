"""Jitted, data-parallel train/eval steps (shard_map over the device mesh).

One compiled step = host->device batch in, full forward + hierarchical loss
+ backward + Adam update on device, gradients pmean'd over ICI. The level
fade-in schedule changes (num_refine_active, do_surf) at most
2*num_hierarchy_levels times per run; each change compiles one new variant
(see models/sgnn.py docstring).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from sgnn_tpu import losses as L
from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.ops import coords as C
from sgnn_tpu.models import sgnn as M
from sgnn_tpu.ops.sparse import make_sparse
from sgnn_tpu.parallel.mesh import DATA_AXIS
from sgnn_tpu.train.state import TrainState, apply_updates


def _densify_rows(locs, vals, num, dims, B, default, pos_bits=None,
                  pos_fill=0.0):
    """Scatter sparse rows (z,y,x,b) into a dense [B, *dims] f32 grid.

    The device-side half of the sparse-target transfer path: the host
    ships the .sdfs file's open-band rows plus a bit-packed plane of
    +saturated voxels (data/dataset.py:_get_chunk_sparse) and this
    reconstructs the dense grids the loss consumes — bit-identical,
    post-clamp, to host-side sparse_to_dense of the FULL row set +
    transfer (/root/reference/torch/data_util.py:43-53 + train.py:
    256-261) at a fraction of the H2D bytes. ``pos_bits`` [B, nbytes]
    marks voxels whose stored value is >= +truncation; they rebuild as
    ``pos_fill`` before the band rows scatter over the top.
    """
    nvox = dims[0] * dims[1] * dims[2]
    if pos_bits is not None:
        shifts = jnp.arange(8, dtype=jnp.uint8)
        bits = (pos_bits[:, :, None] >> shifts) & jnp.uint8(1)
        bits = bits.reshape(B, -1)[:, :nvox].reshape(-1)
        flat = jnp.where(bits > 0, jnp.float32(pos_fill),
                         jnp.float32(default))
    else:
        flat = jnp.full((B * nvox,), default, jnp.float32)
    keys = C.flat_key(locs, dims, B)
    keys = jnp.where(C.valid_mask(num, locs.shape[0]), keys, -1)
    flat = flat.at[C.oob_key(keys)].set(
        vals.astype(jnp.float32), mode="drop"
    )
    return flat.reshape((B,) + tuple(dims))


def _unpack_known_bits(packed, dims, B):
    """[B, nbytes] little-endian bit-packed (known >= UNK_THRESH) ->
    uint8 [B, *dims] in {0, 255}. Only the >= UNK_THRESH predicate of the
    reference's known grid reaches the loss (loss.py:10-13,22-25), so the
    host ships one bit per voxel instead of one byte."""
    nvox = dims[0] * dims[1] * dims[2]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[:, :, None] >> shifts) & jnp.uint8(1)
    unk = bits.reshape(B, -1)[:, :nvox].reshape((B,) + tuple(dims))
    return jnp.where(unk > 0, jnp.uint8(255), jnp.uint8(0))


def _unpack_batch(cfg: SGNNConfig, batch):
    """Per-device batch (leading [1] axis from shard_map) -> tensors.

    Float arrays may arrive in a reduced transfer dtype (bfloat16) and
    sparse coordinates in int16 (see parallel/mesh.py:device_batch); loss
    math stays f32 — cast back here. Two schemas: dense grids
    ("sdf"/"known"/"hierarchy") or sparse target rows ("target_locs"/
    "hier_locs"/"known_unk", densified here on device).
    """
    st = make_sparse(
        batch["input_locs"][0].astype(jnp.int32),
        batch["input_sdf"][0].astype(jnp.float32),
        batch["input_num_valid"][0],
        cfg.input_dim,
        cfg.batch_size,
    )
    B = cfg.batch_size
    if "target_locs" in batch:
        sdf = _densify_rows(
            batch["target_locs"][0].astype(jnp.int32),
            batch["target_vals"][0],
            batch["target_num_valid"][0],
            cfg.input_dim, B, -jnp.inf,
            pos_bits=batch["target_pos"][0], pos_fill=cfg.truncation,
        )
        L_levels = cfg.num_hierarchy_levels
        hierarchy = []
        for h in range(L_levels - 1):
            f = 2 ** (L_levels - 1 - h)
            dims_h = tuple(d // f for d in cfg.input_dim)
            hierarchy.append(
                _densify_rows(
                    batch["hier_locs"][h][0].astype(jnp.int32),
                    batch["hier_vals"][h][0],
                    batch["hier_num"][h][0],
                    dims_h, B, -jnp.inf,
                    pos_bits=batch["hier_pos"][h][0],
                    pos_fill=cfg.truncation,
                )
            )
        known = _unpack_known_bits(
            batch["known_unk"][0], cfg.input_dim, B
        )
        return st, sdf, known, hierarchy
    sdf = batch["sdf"][0].astype(jnp.float32)
    known = batch["known"][0]
    hierarchy = (
        [h[0].astype(jnp.float32) for h in batch["hierarchy"]]
        if batch["hierarchy"] else None
    )
    return st, sdf, known, hierarchy


def _input_mask(cfg, st):
    Z, Y, X = cfg.input_dim
    keys = C.flat_key(st.locs, cfg.input_dim, cfg.batch_size)
    keys = jnp.where(st.valid(), keys, -1)
    return (
        jnp.zeros((cfg.batch_size * Z * Y * X,), jnp.bool_)
        .at[C.oob_key(keys)].set(True, mode="drop")
        .reshape(cfg.batch_size, Z, Y, X)
    )


def _forward_loss(
    params, stats, cfg, st, targets, loss_weights, known, *,
    num_refine_active, do_surf, use_log_transform, weight_missing_geo,
    use_loss_masking, training, axis_name,
):
    if cfg.execution in ("dense_flow", "folded"):
        if cfg.execution == "folded":
            # folded lane-dense layout with differentiable XLA tap
            # algebra (models/folded_train.py) — same output/stats
            # contract as dense_flow
            from sgnn_tpu.models import folded_train as FT

            out, new_stats = FT.genmodel_apply_folded_train(
                params, stats, cfg, st,
                num_refine_active=num_refine_active, do_surf=do_surf,
                training=training, axis_name=axis_name,
            )
        else:
            from sgnn_tpu.models import dense_flow as DF

            out, new_stats = DF.genmodel_apply_dense(
                params, stats, cfg, st,
                num_refine_active=num_refine_active, do_surf=do_surf,
                training=training, axis_name=axis_name,
            )
        total, per_level = L.compute_loss_dense_flow(
            out, targets, loss_weights, cfg.truncation,
            num_refine_active=num_refine_active, do_surf=do_surf,
            use_log_transform=use_log_transform,
            weight_missing_geo=weight_missing_geo,
            input_mask=_input_mask(cfg, st),
            use_loss_masking=use_loss_masking, known=known,
        )
        return total, (per_level, out, new_stats)
    out, new_stats = M.genmodel_apply(
        params, stats, cfg, st,
        num_refine_active=num_refine_active, do_surf=do_surf,
        training=training, axis_name=axis_name,
    )
    total, per_level = L.compute_loss(
        out, targets, loss_weights, cfg.truncation,
        num_refine_active=num_refine_active, do_surf=do_surf,
        use_log_transform=use_log_transform,
        weight_missing_geo=weight_missing_geo,
        input_locs=st.locs, input_num_valid=st.num_valid,
        use_loss_masking=use_loss_masking, known=known,
    )
    return total, (per_level, out, new_stats)


def _metrics_dense(cfg, out, targets, known, *, num_refine_active, do_surf,
                   use_loss_masking):
    """Metrics for DenseFlowOutput: pure masked reductions."""
    L_levels = cfg.num_hierarchy_levels
    ious = []
    occ0 = targets.target_for_occs[0]
    pred0 = jax.nn.sigmoid(out.coarse_out[..., 0]) > 0.5
    if use_loss_masking:
        pred0 = pred0 & (occ0 != L.UNK_ID)
    tgt1 = occ0 == 1.0
    inter = jnp.sum(pred0 & tgt1)
    union = jnp.sum(pred0 | tgt1)
    ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), -1.0))
    for h in range(1, L_levels):
        if h - 1 < num_refine_active:
            occ_t = targets.target_for_occs[h]
            pred = out.refine_masks_unfilt[h - 1] & (
                jax.nn.sigmoid(out.refine_outs[h - 1][..., 0]) > 0.5
            )
            if use_loss_masking:
                pred = pred & (occ_t != L.UNK_ID)
            tgt1 = occ_t == 1.0
            inter = jnp.sum(pred & tgt1)
            union = jnp.sum(pred | tgt1)
            ious.append(
                jnp.where(union > 0, inter / jnp.maximum(union, 1), -1.0)
            )
        else:
            ious.append(jnp.float32(-1.0))
    if do_surf:
        tgt = targets.target_for_sdf
        m = out.surf_mask
        if use_loss_masking:
            m = m & (known < L.UNK_THRESH)
        l1pred = jnp.sum(jnp.where(m, jnp.abs(out.surf_sdf - tgt), 0.0)) / \
            jnp.maximum(jnp.sum(m), 1)
        pred_dense = jnp.where(out.surf_mask, out.surf_sdf, -cfg.truncation)
        tmask = jnp.abs(tgt) < cfg.truncation
        if use_loss_masking:
            tmask = tmask & (known < L.UNK_THRESH)
        l1tgt = jnp.sum(jnp.where(tmask, jnp.abs(pred_dense - tgt), 0.0)) / \
            jnp.maximum(jnp.sum(tmask), 1)
    else:
        l1pred = jnp.float32(-1.0)
        l1tgt = jnp.float32(-1.0)
    return {"iou": jnp.stack(ious), "l1pred": l1pred, "l1tgt": l1tgt}


def _metrics(cfg, out, targets, known, *, num_refine_active, do_surf,
             use_loss_masking):
    """IoU per level + surface L1 metrics (train.py:271-297), on device."""
    if hasattr(out, "refine_masks_unfilt"):
        return _metrics_dense(
            cfg, out, targets, known, num_refine_active=num_refine_active,
            do_surf=do_surf, use_loss_masking=use_loss_masking,
        )
    L_levels = cfg.num_hierarchy_levels
    ious = []
    # level 0: dense coarse
    occ0 = targets.target_for_occs[0]
    pred0 = jax.nn.sigmoid(out.coarse_out[..., 0]) > 0.5
    tgt1 = occ0 == 1.0
    if use_loss_masking:
        pred0 = pred0 & (occ0 != L.UNK_ID)
    inter = jnp.sum(pred0 & tgt1)
    union = jnp.sum(pred0 | tgt1)
    ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), -1.0))
    for h in range(1, L_levels):
        if h - 1 < num_refine_active:
            locs_u, out_u, num_u = out.refine_outs[h - 1]
            occupied = jax.nn.sigmoid(out_u[:, 0]) > 0.5
            ious.append(
                L.compute_iou_sparse_dense(
                    locs_u, num_u, occupied, targets.target_for_occs[h],
                    use_loss_masking,
                )
            )
        else:
            ious.append(jnp.float32(-1.0))
    if do_surf:
        l1pred = L.compute_l1_predsurf_sparse_dense(
            out.surf_locs, out.surf_num_valid, out.surf_sdf[:, 0],
            targets.target_for_sdf, None, False, use_loss_masking,
            known >= L.UNK_THRESH if use_loss_masking else None,
        )
        l1tgt = L.compute_l1_tgtsurf_sparse_dense(
            out.surf_locs, out.surf_num_valid, out.surf_sdf[:, 0],
            targets.target_for_sdf, cfg.truncation, use_loss_masking, known,
        )
    else:
        l1pred = jnp.float32(-1.0)
        l1tgt = jnp.float32(-1.0)
    return {"iou": jnp.stack(ious), "l1pred": l1pred, "l1tgt": l1tgt}


def _batch_specs(cfg: SGNNConfig, sparse_targets: bool):
    """shard_map in_specs for the two batch schemas (parallel/mesh.py:
    device_batch): everything sharded on its leading device axis."""
    specs = {
        "input_locs": P(DATA_AXIS),
        "input_sdf": P(DATA_AXIS),
        "input_num_valid": P(DATA_AXIS),
    }
    nh = cfg.num_hierarchy_levels - 1
    if sparse_targets:
        specs.update(
            target_locs=P(DATA_AXIS),
            target_vals=P(DATA_AXIS),
            target_num_valid=P(DATA_AXIS),
            target_pos=P(DATA_AXIS),
            hier_locs=[P(DATA_AXIS)] * nh,
            hier_vals=[P(DATA_AXIS)] * nh,
            hier_num=[P(DATA_AXIS)] * nh,
            hier_pos=[P(DATA_AXIS)] * nh,
            known_unk=P(DATA_AXIS),
        )
    else:
        specs.update(
            sdf=P(DATA_AXIS),
            known=P(DATA_AXIS),
            hierarchy=[P(DATA_AXIS)] * nh,
        )
    return specs


def make_train_step(
    cfg: SGNNConfig,
    mesh,
    *,
    num_refine_active: int,
    do_surf: bool,
    use_log_transform: bool = True,
    weight_missing_geo: float = 5.0,
    use_loss_masking: bool = True,
    weight_decay: float = 0.0,
    with_metrics: bool = False,
    sparse_targets: bool = False,
):
    """Returns jitted (state, dev_batch, loss_weights, lr) -> (state, out).

    ``cfg`` is the PER-DEVICE config (batch_size = global // num_devices).
    ``dev_batch`` arrays carry a leading device axis (parallel.mesh.
    device_batch).
    """

    def step(state: TrainState, batch, loss_weights, lr):
        st, sdf, known, hierarchy = _unpack_batch(cfg, batch)
        targets = L.compute_targets(
            sdf, hierarchy, cfg.num_hierarchy_levels, cfg.truncation,
            use_loss_masking, known,
        )
        grad_fn = jax.value_and_grad(_forward_loss, has_aux=True)
        (total, (per_level, out, new_stats)), grads = grad_fn(
            state.params, state.stats, cfg, st, targets, loss_weights, known,
            num_refine_active=num_refine_active, do_surf=do_surf,
            use_log_transform=use_log_transform,
            weight_missing_geo=weight_missing_geo,
            use_loss_masking=use_loss_masking, training=True,
            axis_name=DATA_AXIS,
        )
        grads = jax.lax.pmean(grads, DATA_AXIS)
        total = jax.lax.pmean(total, DATA_AXIS)
        per_level = [jax.lax.pmean(x, DATA_AXIS) for x in per_level]
        new_state = apply_updates(state, grads, new_stats, lr, weight_decay)
        overflows = getattr(out, "overflows", [])
        metrics = {
            "loss": total,
            "per_level": jnp.stack(per_level),
            "overflow": (
                jnp.stack(overflows).max()
                if overflows else jnp.zeros((), jnp.int32)
            ),
        }
        if with_metrics:
            m = _metrics(
                cfg, out, targets, known,
                num_refine_active=num_refine_active, do_surf=do_surf,
                use_loss_masking=use_loss_masking,
            )
            metrics.update({k: jax.lax.pmean(v, DATA_AXIS) for k, v in m.items()})
        return new_state, metrics

    batch_specs = _batch_specs(cfg, sparse_targets)
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), batch_specs, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(
    cfg: SGNNConfig,
    mesh,
    *,
    num_refine_active: int,
    do_surf: bool,
    use_log_transform: bool = True,
    weight_missing_geo: float = 5.0,
    use_loss_masking: bool = True,
    sparse_targets: bool = False,
):
    """Eval: forward + loss + metrics, BN in inference mode, no update."""

    def step(state: TrainState, batch, loss_weights):
        st, sdf, known, hierarchy = _unpack_batch(cfg, batch)
        targets = L.compute_targets(
            sdf, hierarchy, cfg.num_hierarchy_levels, cfg.truncation,
            use_loss_masking, known,
        )
        total, (per_level, out, _) = _forward_loss(
            state.params, state.stats, cfg, st, targets, loss_weights, known,
            num_refine_active=num_refine_active, do_surf=do_surf,
            use_log_transform=use_log_transform,
            weight_missing_geo=weight_missing_geo,
            use_loss_masking=use_loss_masking, training=False,
            axis_name=DATA_AXIS,
        )
        m = _metrics(
            cfg, out, targets, known,
            num_refine_active=num_refine_active, do_surf=do_surf,
            use_loss_masking=use_loss_masking,
        )
        metrics = {
            "loss": jax.lax.pmean(total, DATA_AXIS),
            "per_level": jnp.stack(
                [jax.lax.pmean(x, DATA_AXIS) for x in per_level]
            ),
        }
        metrics.update({k: jax.lax.pmean(v, DATA_AXIS) for k, v in m.items()})
        return metrics

    batch_specs = _batch_specs(cfg, sparse_targets)
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), batch_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)

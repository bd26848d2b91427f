"""Hierarchical occupancy/SDF losses and metrics.

Faithful TPU re-expression of /root/reference/torch/loss.py. All reductions
are masked (static shapes); the flat-index gathers of the reference map
directly onto `gather_dense`. Level 0 (the dense coarse prediction over all
coarse voxels) is consumed densely rather than via the reference's
all-voxel coordinate list — identical math, no scatter detour.

Conventions (loss.py:10-13): UNK_THRESH=2, UNK_ID=-1. A voxel with
known >= UNK_THRESH is unobserved; with use_loss_masking those voxels are
excluded from BCE/L1 and marked UNK_ID in the occupancy targets.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from sgnn_tpu.ops import coords as C
from sgnn_tpu.ops import dense as D
from sgnn_tpu.ops.sparse import gather_dense

UNK_THRESH = 2
UNK_ID = -1.0


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("target_for_sdf", "target_for_occs", "target_for_hier"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class TargetBundle:
    """Per-level training targets (coarse -> fine), all dense.

    target_for_sdf: [B, Z, Y, X] clamped SDF (finest).
    target_for_occs: list of [B, z, y, x] occupancy in {0,1,UNK_ID}.
    target_for_hier: list of [B, z, y, x] clamped SDF per level.
    """
    target_for_sdf: jax.Array
    target_for_occs: list
    target_for_hier: list


def preprocess_sdf(sdf: jax.Array, truncation: float) -> jax.Array:
    """Clamp to ±truncation; -inf (missing) becomes -truncation.
    /root/reference/torch/data_util.py:151-154."""
    return jnp.clip(sdf, -truncation, truncation)


def apply_log_transform(sdf: jax.Array) -> jax.Array:
    """sign(x) * log(|x| + 1). /root/reference/torch/loss.py:51-55."""
    return jnp.sign(sdf) * jnp.log(jnp.abs(sdf) + 1.0)


def compute_targets(
    target: jax.Array,  # [B, Z, Y, X] raw SDF (-inf for missing)
    hierarchy: list,  # L-1 dense SDFs, coarse -> fine
    num_hierarchy_levels: int,
    truncation: float,
    use_loss_masking: bool,
    known: jax.Array | None,  # [B, Z, Y, X] uint8
) -> TargetBundle:
    """/root/reference/torch/loss.py:15-32."""
    L = num_hierarchy_levels
    target_for_sdf = preprocess_sdf(target, truncation)
    occ = (jnp.abs(target_for_sdf) < truncation).astype(jnp.float32)
    if use_loss_masking:
        occ = jnp.where(known >= UNK_THRESH, UNK_ID, occ)
    target_for_occs = [None] * L
    target_for_occs[-1] = occ
    target_for_hier = [None] * L
    # DELIBERATE DEVIATION from /root/reference/torch/loss.py:20: the
    # reference keeps the RAW target (target.clone(), -inf at missing
    # voxels) as the finest target_for_hier, so its L1 can be inf when a
    # predicted voxel lands on a missing-target site that loss masking
    # doesn't exclude. We use the clamped SDF (-inf -> -truncation),
    # keeping the loss finite everywhere; at observed voxels the two are
    # identical (|sdf| <= truncation there). Pinned by
    # tests/test_losses.py::test_finest_hier_target_clamped_at_missing.
    target_for_hier[-1] = target_for_sdf
    for h in range(L - 2, -1, -1):
        target_for_occs[h] = D.max_pool3d(target_for_occs[h + 1])
        target_for_hier[h] = preprocess_sdf(hierarchy[h], truncation)
    return TargetBundle(target_for_sdf, target_for_occs, target_for_hier)


def compute_weights_missing_geo(
    weight_missing_geo: float,
    input_locs: jax.Array,  # [cap, 4]
    input_num_valid: jax.Array,
    target_for_occs: list,
) -> list:
    """Per-level weight grids: weight_missing_geo on voxels absent from the
    sparse input, 1 on input voxels. /root/reference/torch/loss.py:35-48."""
    finest = target_for_occs[-1]
    B = finest.shape[0]
    dims = finest.shape[1:]
    keys = C.flat_key(input_locs, dims, B)
    keys = jnp.where(
        C.valid_mask(input_num_valid, input_locs.shape[0]), keys, -1
    )
    is_input = jnp.zeros((B * dims[0] * dims[1] * dims[2],), jnp.bool_)
    is_input = is_input.at[C.oob_key(keys)].set(True, mode="drop")
    is_input = is_input.reshape(finest.shape)
    w = jnp.where(is_input, 1.0, weight_missing_geo).astype(jnp.float32)
    weights = [None] * len(target_for_occs)
    weights[-1] = w
    for h in range(len(target_for_occs) - 2, -1, -1):
        weights[h] = D.subsample2(weights[h + 1])
    return weights


def _masked_mean(vals: jax.Array, mask: jax.Array) -> jax.Array:
    cnt = jnp.sum(mask)
    return jnp.sum(jnp.where(mask, vals, 0.0)) / jnp.maximum(cnt, 1)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary cross entropy with logits (stable form)."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def compute_bce_sparse_dense(
    locs: jax.Array,
    num_valid: jax.Array,
    logits: jax.Array,  # [cap]
    dense_tgts: jax.Array,  # [B, z, y, x] in {0,1,UNK_ID}
    weights: jax.Array | None,
    use_loss_masking: bool,
) -> jax.Array:
    """/root/reference/torch/loss.py:58-82 (sparse predictions vs dense)."""
    tgt = gather_dense(dense_tgts[..., None], locs)[:, 0]
    mask = C.valid_mask(num_valid, locs.shape[0])
    if use_loss_masking:
        mask = mask & (tgt != UNK_ID)
    else:
        tgt = jnp.where(tgt == UNK_ID, 0.0, tgt)
    l = bce_with_logits(logits, tgt)
    if weights is not None:
        l = l * gather_dense(weights[..., None], locs)[:, 0]
    return _masked_mean(l, mask)


def compute_bce_dense(
    logits: jax.Array,  # [B, z, y, x]
    dense_tgts: jax.Array,
    weights: jax.Array | None,
    use_loss_masking: bool,
) -> jax.Array:
    """Level-0 BCE over ALL coarse voxels (the reference feeds every coarse
    voxel through the sparse path; dense here, same math)."""
    tgt = dense_tgts
    if use_loss_masking:
        mask = tgt != UNK_ID
    else:
        mask = jnp.ones_like(tgt, jnp.bool_)
        tgt = jnp.where(tgt == UNK_ID, 0.0, tgt)
    l = bce_with_logits(logits, tgt)
    if weights is not None:
        l = l * weights
    return _masked_mean(l, mask)


def compute_l1_predsurf_sparse_dense(
    locs: jax.Array,
    num_valid: jax.Array,
    preds: jax.Array,  # [cap]
    dense_tgts: jax.Array,  # [B, z, y, x] SDF
    weights: jax.Array | None,
    use_log_transform: bool,
    use_loss_masking: bool,
    known_mask_unk: jax.Array | None,  # [B, z, y, x] bool: True = unknown
) -> jax.Array:
    """L1 at predicted voxels vs dense target SDF.
    /root/reference/torch/loss.py:122-157."""
    tgt = gather_dense(dense_tgts[..., None], locs)[:, 0]
    mask = C.valid_mask(num_valid, locs.shape[0])
    if use_loss_masking and known_mask_unk is not None:
        unk = gather_dense(
            known_mask_unk[..., None].astype(jnp.float32), locs
        )[:, 0]
        mask = mask & (unk == 0)
    p, t = preds, tgt
    if use_log_transform:
        p, t = apply_log_transform(p), apply_log_transform(t)
    l = jnp.abs(p - t)
    if weights is not None:
        l = l * gather_dense(weights[..., None], locs)[:, 0]
    return _masked_mean(l, mask)


def compute_l1_dense(
    preds: jax.Array,  # [B, z, y, x]
    dense_tgts: jax.Array,
    weights: jax.Array | None,
    use_log_transform: bool,
    use_loss_masking: bool,
    known_mask_unk: jax.Array | None,
) -> jax.Array:
    """Level-0 L1 over all coarse voxels (dense counterpart of the above)."""
    mask = jnp.ones_like(dense_tgts, jnp.bool_)
    if use_loss_masking and known_mask_unk is not None:
        mask = ~known_mask_unk
    p, t = preds, dense_tgts
    if use_log_transform:
        p, t = apply_log_transform(p), apply_log_transform(t)
    l = jnp.abs(p - t)
    if weights is not None:
        l = l * weights
    return _masked_mean(l, mask)


def compute_weights_missing_geo_dense(
    weight_missing_geo: float,
    input_mask: jax.Array,  # [B, Z, Y, X] bool: sparse-input active sites
    num_levels: int,
) -> list:
    """Dense-mask variant of compute_weights_missing_geo."""
    w = jnp.where(input_mask, 1.0, weight_missing_geo).astype(jnp.float32)
    weights = [None] * num_levels
    weights[-1] = w
    for h in range(num_levels - 2, -1, -1):
        weights[h] = D.subsample2(weights[h + 1])
    return weights


def compute_loss_dense_flow(
    model_out,  # DenseFlowOutput
    targets: TargetBundle,
    loss_weights: jax.Array,
    truncation: float,
    *,
    num_refine_active: int,
    do_surf: bool,
    use_log_transform: bool = True,
    weight_missing_geo: float = 1.0,
    input_mask: jax.Array | None = None,
    use_loss_masking: bool = True,
    known: jax.Array | None = None,
):
    """compute_loss for the dense-flow execution: every level is a dense
    prediction grid + site mask; identical math to the sparse version
    (losses evaluated at the unpruned upsampled sites, loss.py:160-199)."""
    L = len(targets.target_for_occs)
    weights = [None] * L
    if weight_missing_geo > 1:
        weights = compute_weights_missing_geo_dense(
            weight_missing_geo, input_mask, L
        )

    losses = []
    total = jnp.zeros((), jnp.float32)

    occ0 = targets.target_for_occs[0]
    unk0 = occ0 == UNK_ID
    lvl0 = compute_bce_dense(
        model_out.coarse_out[..., 0], occ0, weights[0], use_loss_masking
    ) + compute_l1_dense(
        model_out.coarse_out[..., 1], targets.target_for_hier[0], weights[0],
        use_log_transform, use_loss_masking, unk0,
    )
    total = total + loss_weights[0] * lvl0
    losses.append(lvl0)

    def masked_level(pred, site_mask, occ_t, hier_t, w):
        unk = occ_t == UNK_ID
        bmask = site_mask
        if use_loss_masking:
            bmask = bmask & ~unk
        tgt = jnp.where(occ_t == UNK_ID, 0.0, occ_t) if not use_loss_masking \
            else occ_t
        l = bce_with_logits(pred[..., 0], tgt)
        if w is not None:
            l = l * w
        bce = _masked_mean(l, bmask)
        p, t = pred[..., 1], hier_t
        if use_log_transform:
            p, t = apply_log_transform(p), apply_log_transform(t)
        l1 = jnp.abs(p - t)
        if w is not None:
            l1 = l1 * w
        lmask = site_mask
        if use_loss_masking:
            lmask = lmask & ~unk
        return bce + _masked_mean(l1, lmask)

    for h in range(1, L):
        if h - 1 < num_refine_active:
            lvl = masked_level(
                model_out.refine_outs[h - 1],
                model_out.refine_masks_unfilt[h - 1],
                targets.target_for_occs[h],
                targets.target_for_hier[h],
                weights[h],
            )
            total = total + loss_weights[h] * lvl
            losses.append(lvl)
        else:
            losses.append(jnp.float32(-1.0))

    if do_surf:
        mask = model_out.surf_mask
        if use_loss_masking and known is not None:
            mask = mask & (known < UNK_THRESH)
        p, t = model_out.surf_sdf, targets.target_for_sdf
        if use_log_transform:
            p, t = apply_log_transform(p), apply_log_transform(t)
        l = jnp.abs(p - t)
        if weights[-1] is not None:
            l = l * weights[-1]
        surf = _masked_mean(l, mask)
        total = total + loss_weights[-1] * surf
        losses.append(surf)
    else:
        losses.append(jnp.float32(-1.0))
    return total, losses


def compute_l1_tgtsurf_sparse_dense(
    locs: jax.Array,
    num_valid: jax.Array,
    preds: jax.Array,  # [cap]
    dense_tgts: jax.Array,  # [B, Z, Y, X]
    truncation: float,
    use_loss_masking: bool,
    known: jax.Array | None,  # [B, Z, Y, X] uint8
) -> jax.Array:
    """Eval metric: L1 at *target* near-surface voxels; predictions missing
    there read -truncation (penalizes missed geometry).
    /root/reference/torch/loss.py:201-231."""
    B = dense_tgts.shape[0]
    dims = dense_tgts.shape[1:]
    n = B * dims[0] * dims[1] * dims[2]
    keys = C.flat_key(locs, dims, B)
    keys = jnp.where(C.valid_mask(num_valid, locs.shape[0]), keys, -1)
    pred_dense = jnp.full((n,), -truncation, jnp.float32)
    pred_dense = pred_dense.at[C.oob_key(keys)].set(preds, mode="drop")
    pred_dense = pred_dense.reshape(dense_tgts.shape)
    tmask = jnp.abs(dense_tgts) < truncation
    if use_loss_masking and known is not None:
        tmask = tmask & (known < UNK_THRESH)
    return _masked_mean(jnp.abs(pred_dense - dense_tgts), tmask)


def compute_iou_sparse_dense(
    locs: jax.Array,
    num_valid: jax.Array,
    occupied: jax.Array,  # [cap] bool: prediction occupied at locs
    dense_tgts: jax.Array,  # [B, z, y, x] occupancy in {0,1,UNK_ID}
    use_loss_masking: bool,
) -> jax.Array:
    """Occupancy IoU, fully on device (the reference round-trips to numpy
    intersect1d, /root/reference/torch/loss.py:84-120). Returns -1 when the
    union is empty."""
    B = dense_tgts.shape[0]
    dims = dense_tgts.shape[1:]
    n = B * dims[0] * dims[1] * dims[2]
    keys = C.flat_key(locs, dims, B)
    keep = C.valid_mask(num_valid, locs.shape[0]) & occupied
    keys = jnp.where(keep, keys, -1)
    pred = jnp.zeros((n,), jnp.bool_).at[C.oob_key(keys)].set(True, mode="drop")
    pred = pred.reshape(dense_tgts.shape)
    tgt1 = dense_tgts == 1.0
    if use_loss_masking:
        pred = pred & (dense_tgts != UNK_ID)
    inter = jnp.sum(pred & tgt1)
    union = jnp.sum(pred | tgt1)
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), -1.0)


def compute_loss(
    model_out,  # GenModelOutput
    targets: TargetBundle,
    loss_weights: jax.Array,  # [L+1] floats (dynamic)
    truncation: float,
    *,
    num_refine_active: int,  # static: levels 1..n computed
    do_surf: bool,  # static
    use_log_transform: bool = True,
    weight_missing_geo: float = 1.0,
    input_locs: jax.Array | None = None,
    input_num_valid: jax.Array | None = None,
    use_loss_masking: bool = True,
    known: jax.Array | None = None,
):
    """Total hierarchical loss. /root/reference/torch/loss.py:160-199.

    Returns (total_loss, per_level list of scalars with -1.0 for inactive
    levels: [level0, ..., levelL-1, surf]).
    """
    L = len(targets.target_for_occs)
    weights = [None] * L
    if weight_missing_geo > 1:
        weights = compute_weights_missing_geo(
            weight_missing_geo, input_locs, input_num_valid,
            targets.target_for_occs,
        )

    losses = []
    total = jnp.zeros((), jnp.float32)

    # Level 0: dense coarse prediction over all coarse voxels.
    occ0 = targets.target_for_occs[0]
    unk0 = occ0 == UNK_ID
    bce0 = compute_bce_dense(
        model_out.coarse_out[..., 0], occ0, weights[0], use_loss_masking
    )
    l1_0 = compute_l1_dense(
        model_out.coarse_out[..., 1], targets.target_for_hier[0], weights[0],
        use_log_transform, use_loss_masking, unk0,
    )
    lvl0 = bce0 + l1_0
    total = total + loss_weights[0] * lvl0
    losses.append(lvl0)

    # Refinement levels.
    for h in range(1, L):
        if h - 1 < num_refine_active:
            locs_u, out_u, num_u = model_out.refine_outs[h - 1]
            occ_t = targets.target_for_occs[h]
            unk = occ_t == UNK_ID
            bce = compute_bce_sparse_dense(
                locs_u, num_u, out_u[:, 0], occ_t, weights[h],
                use_loss_masking,
            )
            l1 = compute_l1_predsurf_sparse_dense(
                locs_u, num_u, out_u[:, 1], targets.target_for_hier[h],
                weights[h], use_log_transform, use_loss_masking, unk,
            )
            lvl = bce + l1
            total = total + loss_weights[h] * lvl
            losses.append(lvl)
        else:
            losses.append(jnp.float32(-1.0))

    # Final surface SDF.
    if do_surf:
        known_unk = None
        if use_loss_masking and known is not None:
            known_unk = known >= UNK_THRESH
        surf = compute_l1_predsurf_sparse_dense(
            model_out.surf_locs, model_out.surf_num_valid,
            model_out.surf_sdf[:, 0], targets.target_for_sdf, weights[-1],
            use_log_transform, use_loss_masking, known_unk,
        )
        total = total + loss_weights[-1] * surf
        losses.append(surf)
    else:
        losses.append(jnp.float32(-1.0))

    return total, losses

"""Loss/metric parity vs torch-computed oracles of the reference formulas."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from sgnn_tpu import losses as L
from sgnn_tpu import schedules as S


def _pad_locs(locs, cap):
    pad = np.full((cap - locs.shape[0], 4), -1, np.int32)
    return np.concatenate([locs.astype(np.int32), pad], 0)


def test_compute_targets_maxpool_and_unk(rng):
    B, Z, Y, X = 1, 4, 4, 4
    tgt = rng.randn(B, Z, Y, X).astype(np.float32) * 4
    tgt[0, 0, 0, 0] = -np.inf  # missing
    known = np.zeros((B, Z, Y, X), np.uint8)
    known[0, 1, 1, 1] = 3  # unknown
    hier = [jnp.asarray(rng.randn(B, 2, 2, 2).astype(np.float32) * 5)]
    tb = L.compute_targets(jnp.asarray(tgt), hier, 2, 3.0, True, jnp.asarray(known))
    sdf = np.asarray(tb.target_for_sdf)
    assert sdf.min() >= -3.0 and sdf.max() <= 3.0
    assert sdf[0, 0, 0, 0] == -3.0
    occ = np.asarray(tb.target_for_occs[-1])
    # -inf voxel clamps to -3 -> |.|==3 -> not < trunc -> occ 0
    assert occ[0, 0, 0, 0] == 0
    assert occ[0, 1, 1, 1] == L.UNK_ID
    # coarse = maxpool2
    ref = torch.nn.MaxPool3d(2)(torch.from_numpy(occ[None])).numpy()[0]
    np.testing.assert_array_equal(np.asarray(tb.target_for_occs[0]), ref)
    assert np.asarray(tb.target_for_hier[0]).max() <= 3.0


def test_weights_missing_geo(rng):
    B, Z, Y, X = 2, 4, 4, 4
    occs = [jnp.zeros((B, 2, 2, 2)), jnp.zeros((B, Z, Y, X))]
    locs = np.array([[0, 0, 0, 0], [1, 2, 3, 1], [3, 3, 3, 1]])
    cap = 8
    w = L.compute_weights_missing_geo(
        5.0, jnp.asarray(_pad_locs(locs, cap)), jnp.int32(3), occs
    )
    wf = np.asarray(w[-1])
    assert wf[0, 0, 0, 0] == 1 and wf[1, 1, 2, 3] == 1 and wf[1, 3, 3, 3] == 1
    assert wf.sum() == 3 * 1 + (B * Z * Y * X - 3) * 5
    # coarse level: stride-2 subsample
    np.testing.assert_array_equal(np.asarray(w[0]), wf[:, ::2, ::2, ::2])


def test_bce_matches_torch(rng):
    B, Z, Y, X = 2, 4, 4, 4
    tgt = (rng.rand(B, Z, Y, X) > 0.5).astype(np.float32)
    tgt[0, 0] = L.UNK_ID  # some unknowns
    n, cap = 20, 32
    locs = np.stack(
        [
            rng.randint(0, Z, n), rng.randint(0, Y, n),
            rng.randint(0, X, n), rng.randint(0, B, n),
        ], -1,
    )
    logits = rng.randn(cap).astype(np.float32)
    weights = (rng.rand(B, Z, Y, X) * 4 + 1).astype(np.float32)
    got = float(
        L.compute_bce_sparse_dense(
            jnp.asarray(_pad_locs(locs, cap)), jnp.int32(n),
            jnp.asarray(logits), jnp.asarray(tgt), jnp.asarray(weights), True,
        )
    )
    # torch oracle per reference loss.py:58-82
    tv = torch.from_numpy(tgt[locs[:, 3], locs[:, 0], locs[:, 1], locs[:, 2]])
    pv = torch.from_numpy(logits[:n])
    wv = torch.from_numpy(weights[locs[:, 3], locs[:, 0], locs[:, 1], locs[:, 2]])
    m = tv != L.UNK_ID
    ref = F.binary_cross_entropy_with_logits(pv[m], tv[m], weight=wv[m]).item()
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_l1_predsurf_matches_reference(rng):
    B, Z, Y, X = 2, 4, 4, 4
    tgt = rng.randn(B, Z, Y, X).astype(np.float32)
    n, cap = 20, 32
    locs = np.stack(
        [
            rng.randint(0, Z, n), rng.randint(0, Y, n),
            rng.randint(0, X, n), rng.randint(0, B, n),
        ], -1,
    )
    preds = rng.randn(cap).astype(np.float32)
    unk = rng.rand(B, Z, Y, X) > 0.7
    got = float(
        L.compute_l1_predsurf_sparse_dense(
            jnp.asarray(_pad_locs(locs, cap)), jnp.int32(n),
            jnp.asarray(preds), jnp.asarray(tgt), None, True, True,
            jnp.asarray(unk),
        )
    )
    pv = preds[:n]
    tv = tgt[locs[:, 3], locs[:, 0], locs[:, 1], locs[:, 2]]
    m = ~unk[locs[:, 3], locs[:, 0], locs[:, 1], locs[:, 2]]

    def logt(x):
        return np.sign(x) * np.log(np.abs(x) + 1)

    ref = np.abs(logt(pv[m]) - logt(tv[m])).mean()
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_l1_tgtsurf(rng):
    B, Z, Y, X = 1, 4, 4, 4
    trunc = 3.0
    tgt = np.full((B, Z, Y, X), 5.0, np.float32)  # far -> clamp outside band
    tgt[0, 1, 1, 1] = 0.5
    tgt[0, 2, 2, 2] = -1.0
    locs = np.array([[1, 1, 1, 0]])
    preds = np.array([0.7], np.float32)
    cap = 4
    padded_preds = np.concatenate([preds, np.zeros(cap - 1, np.float32)])
    got = float(
        L.compute_l1_tgtsurf_sparse_dense(
            jnp.asarray(_pad_locs(locs, cap)), jnp.int32(1),
            jnp.asarray(padded_preds), jnp.asarray(tgt), trunc, False, None,
        )
    )
    # target surface voxels: (1,1,1) err |0.7-0.5|=0.2 ; (2,2,2) missing pred
    # -> pred=-trunc=-3 err |-3 - (-1)| = 2
    np.testing.assert_allclose(got, (0.2 + 2.0) / 2, rtol=1e-5)


def test_iou(rng):
    B, Z, Y, X = 1, 4, 4, 4
    tgt = np.zeros((B, Z, Y, X), np.float32)
    tgt[0, 0, 0, 0] = 1
    tgt[0, 1, 1, 1] = 1
    tgt[0, 2, 2, 2] = L.UNK_ID
    locs = np.array([[0, 0, 0, 0], [2, 2, 2, 0], [3, 3, 3, 0]])
    occupied = np.array([True, True, True, False])
    got = float(
        L.compute_iou_sparse_dense(
            jnp.asarray(_pad_locs(locs, 4)), jnp.int32(3),
            jnp.asarray(occupied), jnp.asarray(tgt), True,
        )
    )
    # pred (UNK-filtered): {(0,0,0),(3,3,3)}; tgt: {(0,0,0),(1,1,1)}
    # inter=1, union=3
    np.testing.assert_allclose(got, 1 / 3, rtol=1e-6)


def test_loss_weights_schedule():
    lw0 = S.get_loss_weights(0, 4, 2000, 1.0)
    np.testing.assert_array_equal(lw0, [1, 0, 0, 0, 0])
    # just before first fade ends
    lw = S.get_loss_weights(1999, 4, 2000, 1.0)
    assert lw[0] == 1 and 0 < lw[1] <= 1
    lw = S.get_loss_weights(2000, 4, 2000, 1.0)
    np.testing.assert_array_equal(lw[:3], [1, 1, 0])
    lw = S.get_loss_weights(5 * 2000, 4, 2000, 1.0)
    np.testing.assert_array_equal(lw, [1, 1, 1, 1, 1])
    lw = S.get_loss_weights(4 * 2000 - 20, 4, 2000, 0.5)
    assert 0 < lw[-1] <= 0.5  # surface weight fading with factor

    # static gating
    assert S.active_levels(np.array([1, 0, 0, 0, 0])) == (0, False)
    assert S.active_levels(np.array([1, 1, 0.5, 0, 0])) == (2, False)
    assert S.active_levels(np.array([1, 1, 1, 1, 0.2])) == (3, True)


def test_step_lr():
    assert S.step_lr(1e-3, 0, 10) == 1e-3
    assert S.step_lr(1e-3, 10, 10) == 5e-4
    assert S.step_lr(1e-3, 25, 10) == 2.5e-4


def test_finest_hier_target_clamped_at_missing(rng):
    """Pin the deliberate deviation from /root/reference/torch/loss.py:20:
    the finest target_for_hier uses the CLAMPED SDF (-inf -> -truncation),
    so the surface L1 stays finite when a predicted voxel lands on a
    missing-target site (the reference's raw target.clone() yields inf
    there). At observed voxels both conventions agree."""
    B, Z, Y, X = 1, 4, 4, 4
    tgt = (rng.randn(B, Z, Y, X) * 2).astype(np.float32)
    tgt[0, 0, 0, 0] = -np.inf  # missing-target voxel
    known = np.zeros((B, Z, Y, X), np.uint8)  # everything "observed"
    hier = [jnp.asarray(rng.randn(B, 2, 2, 2).astype(np.float32))]
    tb = L.compute_targets(
        jnp.asarray(tgt), hier, 2, 3.0, True, jnp.asarray(known)
    )
    fin = np.asarray(tb.target_for_hier[-1])
    assert np.isfinite(fin).all()
    assert fin[0, 0, 0, 0] == -3.0  # clamped, not -inf
    # observed voxels unchanged up to the clamp
    obs = np.clip(tgt[np.isfinite(tgt)], -3.0, 3.0)
    np.testing.assert_allclose(fin[np.isfinite(tgt)], obs)

    # and the L1 evaluated at the missing voxel is finite
    cap = 8
    locs = np.array([[0, 0, 0, 0]], np.int32)
    preds = np.zeros(cap, np.float32)
    l1 = float(
        L.compute_l1_predsurf_sparse_dense(
            jnp.asarray(_pad_locs(locs, cap)), jnp.int32(1),
            jnp.asarray(preds), jnp.asarray(tb.target_for_hier[-1]),
            None, False, False, None,
        )
    )
    assert np.isfinite(l1)

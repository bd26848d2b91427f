"""Dense-flow execution == coordinate-list execution (forward + loss)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgnn_tpu import losses as L
from sgnn_tpu.models import dense_flow as DF
from sgnn_tpu.models import sgnn as M
from sgnn_tpu.ops import coords as C
from tests.test_model import CFG, _rand_input


def _targets(rng, cfg):
    Z, Y, X = cfg.input_dim
    B = cfg.batch_size
    tgt = rng.randn(B, Z, Y, X).astype(np.float32) * 2
    known = (rng.rand(B, Z, Y, X) * 3).astype(np.uint8)
    hier = [
        jnp.asarray(rng.randn(B, Z // 4, Y // 4, X // 4).astype(np.float32)),
        jnp.asarray(rng.randn(B, Z // 2, Y // 2, X // 2).astype(np.float32)),
    ]
    return tgt, known, hier


@pytest.mark.slow
def test_dense_flow_matches_sparse(rng):
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), CFG)
    st = _rand_input(rng, CFG)
    out_s, _ = M.genmodel_apply(
        params, stats, CFG, st,
        num_refine_active=CFG.num_refine_levels, do_surf=True, training=False,
    )
    out_d, _ = DF.genmodel_apply_dense(
        params, stats, CFG, st,
        num_refine_active=CFG.num_refine_levels, do_surf=True, training=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_s.coarse_out), np.asarray(out_d.coarse_out),
        rtol=1e-4, atol=1e-4,
    )
    # per-level: dense grids at the sparse outputs' (unpruned) sites
    for h, (locs_u, out_u, num_u) in enumerate(out_s.refine_outs):
        n = int(num_u)
        locs = np.asarray(locs_u[:n])
        grid = np.asarray(out_d.refine_outs[h])
        mask = np.asarray(out_d.refine_masks_unfilt[h])
        vals_d = grid[locs[:, 3], locs[:, 0], locs[:, 1], locs[:, 2]]
        np.testing.assert_allclose(
            np.asarray(out_u[:n]), vals_d, rtol=1e-3, atol=1e-3
        )
        # the dense mask is exactly the sparse site set
        assert mask.sum() == n
        assert mask[locs[:, 3], locs[:, 0], locs[:, 1], locs[:, 2]].all()
    # surface: same voxel set, same SDF values
    n = int(out_s.surf_num_valid)
    locs = np.asarray(out_s.surf_locs[:n])
    smask = np.asarray(out_d.surf_mask)
    assert smask.sum() == n
    assert smask[locs[:, 3], locs[:, 0], locs[:, 1], locs[:, 2]].all()
    vals_d = np.asarray(out_d.surf_sdf)[
        locs[:, 3], locs[:, 0], locs[:, 1], locs[:, 2]
    ]
    np.testing.assert_allclose(
        np.asarray(out_s.surf_sdf[:n, 0]), vals_d, rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
def test_dense_flow_loss_matches_sparse(rng):
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), CFG)
    st = _rand_input(rng, CFG)
    tgt, known, hier = _targets(rng, CFG)
    targets = L.compute_targets(
        jnp.asarray(tgt), hier, CFG.num_hierarchy_levels, CFG.truncation,
        True, jnp.asarray(known),
    )
    lw = jnp.asarray([1.0, 1.0, 0.7, 0.5], jnp.float32)

    out_s, _ = M.genmodel_apply(
        params, stats, CFG, st,
        num_refine_active=CFG.num_refine_levels, do_surf=True, training=False,
    )
    total_s, per_s = L.compute_loss(
        out_s, targets, lw, CFG.truncation,
        num_refine_active=CFG.num_refine_levels, do_surf=True,
        weight_missing_geo=5.0, input_locs=st.locs,
        input_num_valid=st.num_valid, use_loss_masking=True,
        known=jnp.asarray(known),
    )
    out_d, _ = DF.genmodel_apply_dense(
        params, stats, CFG, st,
        num_refine_active=CFG.num_refine_levels, do_surf=True, training=False,
    )
    Z, Y, X = CFG.input_dim
    keys = C.flat_key(st.locs, CFG.input_dim, CFG.batch_size)
    keys = jnp.where(st.valid(), keys, -1)
    input_mask = (
        jnp.zeros((CFG.batch_size * Z * Y * X,), jnp.bool_)
        .at[C.oob_key(keys)].set(True, mode="drop")
        .reshape(CFG.batch_size, Z, Y, X)
    )
    total_d, per_d = L.compute_loss_dense_flow(
        out_d, targets, lw, CFG.truncation,
        num_refine_active=CFG.num_refine_levels, do_surf=True,
        weight_missing_geo=5.0, input_mask=input_mask,
        use_loss_masking=True, known=jnp.asarray(known),
    )
    np.testing.assert_allclose(float(total_s), float(total_d), rtol=2e-3)
    for a, b in zip(per_s, per_d):
        np.testing.assert_allclose(float(a), float(b), rtol=2e-3, atol=1e-4)


def test_dense_flow_train_step(rng, tmp_path):
    """Full DP train step in dense_flow execution."""
    import dataclasses as _dc

    from sgnn_tpu.parallel import mesh as PM
    from sgnn_tpu.train import step as TS
    from sgnn_tpu.train.state import create_train_state

    mesh = PM.make_mesh(2)
    cfg = _dc.replace(CFG, batch_size=1, execution="dense_flow")
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, stats)
    step = TS.make_train_step(
        cfg, mesh, num_refine_active=cfg.num_refine_levels, do_surf=True,
        with_metrics=True,
    )
    Z, Y, X = cfg.input_dim
    cap = cfg.input_cap
    locs = np.full((2, cap, 4), -1, np.int32)
    feats = np.zeros((2, cap, 1), np.float32)
    nums = np.zeros((2,), np.int32)
    for d in range(2):
        k = 50
        flat = rng.choice(Z * Y * X, k, replace=False)
        z, rem = flat // (Y * X), flat % (Y * X)
        y, x = rem // X, rem % X
        locs[d, :k] = np.stack([z, y, x, np.zeros_like(z)], -1)
        feats[d, :k, 0] = rng.randn(k)
        nums[d] = k
    batch = {
        "input_locs": locs,
        "input_sdf": feats,
        "input_num_valid": nums,
        "sdf": rng.randn(2, 1, Z, Y, X).astype(np.float32),
        "known": (rng.rand(2, 1, Z, Y, X) * 3).astype(np.uint8),
        "hierarchy": [
            rng.randn(2, 1, Z // 4, Y // 4, X // 4).astype(np.float32),
            rng.randn(2, 1, Z // 2, Y // 2, X // 2).astype(np.float32),
        ],
    }
    lw = np.ones(cfg.num_hierarchy_levels + 1, np.float32)
    new_state, metrics = step(state, batch, lw, np.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(np.asarray(metrics["iou"])).all()
    assert float(metrics["l1tgt"]) >= 0


def test_dense_flow_inference(rng):
    import dataclasses as _dc

    from sgnn_tpu.infer import SceneInferencer

    cfg = _dc.replace(CFG, execution="dense_flow", batch_size=1)
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    inf = SceneInferencer(cfg, params, stats)
    Z, Y, X = cfg.input_dim
    k = 60
    flat = rng.choice(Z * Y * X, k, replace=False)
    z, rem = flat // (Y * X), flat % (Y * X)
    y, x = rem // X, rem % X
    sample = {
        "name": "t",
        "input_locs": np.stack([z, y, x], -1).astype(np.int32),
        "input_sdf": rng.randn(k).astype(np.float32),
        "sdf": np.zeros((Z, Y, X), np.float32),
        "known": np.zeros((Z, Y, X), np.uint8),
        "hierarchy": None,
        "world2grid": np.eye(4, dtype=np.float32),
        "orig_dims": np.array([Z, Y, X - 4]),
    }
    r = inf(sample)
    assert np.isfinite(r["surf_sdf"]).all()
    if len(r["surf_locs"]):
        assert (r["surf_locs"][:, 2] < X - 4).all()  # unpadded
    assert len(r["levels"]) == cfg.num_hierarchy_levels


@pytest.mark.slow
def test_dense_flow_pallas_conv_equivalence(rng):
    """dense_flow with the Pallas conv routed in (interpret mode) matches
    the XLA conv path. Needs X % 64 == 0, so uses a (32, 32, 64) volume."""
    import dataclasses as _dc

    import jax.experimental.pallas as pl

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops.sparse import make_sparse

    cfg = _dc.replace(
        CFG, input_dim=(32, 32, 64), nf_coarse=16, nf=16, batch_size=1
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(2), cfg)
    Z, Y, X = cfg.input_dim
    cap = cfg.input_cap
    n = 80
    flat = np.random.RandomState(5).choice(Z * Y * X, n, replace=False)
    z, rem = flat // (Y * X), flat % (Y * X)
    y, x = rem // X, rem % X
    locs = np.full((cap, 4), -1, np.int32)
    locs[:n] = np.stack([z, y, x, np.zeros_like(z)], -1)
    feats = np.zeros((cap, 1), np.float32)
    feats[:n, 0] = np.random.RandomState(6).randn(n)
    st = make_sparse(locs, feats, n, cfg.input_dim, 1)

    ref, _ = DF.genmodel_apply_dense(
        params, stats, cfg, st,
        num_refine_active=cfg.num_refine_levels, do_surf=True, training=False,
    )
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    PC.pl.pallas_call = patched
    try:
        cfg_p = _dc.replace(cfg, use_pallas_conv=True)
        got, _ = DF.genmodel_apply_dense(
            params, stats, cfg_p, st,
            num_refine_active=cfg_p.num_refine_levels, do_surf=True,
            training=False,
        )
    finally:
        PC.pl.pallas_call = orig
    np.testing.assert_allclose(
        np.asarray(ref.coarse_out), np.asarray(got.coarse_out),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(ref.surf_mask), np.asarray(got.surf_mask)
    )
    m = np.asarray(ref.surf_mask)
    np.testing.assert_allclose(
        np.asarray(ref.surf_sdf)[m], np.asarray(got.surf_sdf)[m],
        rtol=1e-3, atol=1e-3,
    )

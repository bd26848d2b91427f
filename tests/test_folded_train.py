"""Folded TRAINING execution vs dense_flow: forward, stats, gradients."""

import numpy as np
import pytest

from sgnn_tpu.config import SGNNConfig


@pytest.fixture
def setup():
    import jax
    import jax.numpy as jnp

    from sgnn_tpu.models import sgnn as M
    from sgnn_tpu.ops.sparse import make_sparse

    cfg = SGNNConfig(
        input_dim=(32, 32, 32), batch_size=2, num_hierarchy_levels=3,
        encoder_dim=4, nf_coarse=8, nf=8, execution="dense_flow",
        compute_dtype="float32",
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    n = 600
    locs = np.stack([
        rng.randint(0, 32, n), rng.randint(0, 32, n),
        rng.randint(0, 32, n), rng.randint(0, 2, n),
    ], -1).astype(np.int32)
    feats = (rng.rand(n, 1).astype(np.float32) * 4 - 2)
    st = make_sparse(jnp.asarray(locs), jnp.asarray(feats), n,
                     cfg.input_dim, cfg.batch_size)
    return cfg, params, stats, st


def _run(mode, cfg, params, stats, st, training=True):
    if mode == "folded":
        from sgnn_tpu.models.folded_train import genmodel_apply_folded_train

        return genmodel_apply_folded_train(
            params, stats, cfg, st,
            num_refine_active=cfg.num_refine_levels, do_surf=True,
            training=training,
        )
    from sgnn_tpu.models.dense_flow import genmodel_apply_dense

    return genmodel_apply_dense(
        params, stats, cfg, st,
        num_refine_active=cfg.num_refine_levels, do_surf=True,
        training=training,
    )


def test_folded_train_forward_and_stats(setup):
    import jax

    cfg, params, stats, st = setup
    out_d, s_d = _run("dense", cfg, params, stats, st)
    out_f, s_f = _run("folded", cfg, params, stats, st)
    np.testing.assert_allclose(
        np.asarray(out_f.coarse_out), np.asarray(out_d.coarse_out),
        rtol=1e-4, atol=1e-4,
    )
    for a, b in zip(out_f.refine_outs, out_d.refine_outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
    for a, b in zip(out_f.refine_masks_unfilt, out_d.refine_masks_unfilt):
        assert (np.asarray(a) == np.asarray(b)).all()
    np.testing.assert_allclose(np.asarray(out_f.surf_sdf),
                               np.asarray(out_d.surf_sdf),
                               rtol=1e-3, atol=1e-3)
    assert (np.asarray(out_f.surf_mask) == np.asarray(out_d.surf_mask)).all()
    # BN running stats trees match leaf-by-leaf
    flat_d = jax.tree_util.tree_leaves_with_path(s_d)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(s_f)}
    assert len(flat_d) == len(flat_f)
    for k, v in flat_d:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_f[ks]), np.asarray(v), rtol=1e-3, atol=1e-4,
            err_msg=ks,
        )


def test_folded_train_gradients(setup):
    import jax
    import jax.numpy as jnp

    cfg, params, stats, st = setup

    def loss_fn(mode):
        def f(params):
            out, _ = _run(mode, cfg, params, stats, st)
            t = sum(jnp.sum(o * o) for o in out.refine_outs)
            return (
                jnp.sum(out.coarse_out ** 2) + t
                + jnp.sum(jnp.where(out.surf_mask, out.surf_sdf, 0.0) ** 2)
            )
        return f

    ld, gd = jax.value_and_grad(loss_fn("dense"))(params)
    lf, gf = jax.value_and_grad(loss_fn("folded"))(params)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-3)
    flat_d = jax.tree_util.tree_leaves_with_path(gd)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    for k, v in flat_d:
        ks = jax.tree_util.keystr(k)
        a = np.asarray(flat_f[ks]).ravel()
        b = np.asarray(v).ravel()
        denom = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / denom, b / denom, atol=5e-3,
                                   err_msg=ks)


@pytest.mark.slow
def test_folded_train_step_runs(setup):
    """Full DP train step (loss + grads + Adam + BN stats) in folded
    execution on a 2-device mesh, vs the dense_flow step: same loss."""
    import dataclasses as _dc

    import jax
    import numpy as _np

    from sgnn_tpu.models import sgnn as M
    from sgnn_tpu.parallel import mesh as PM
    from sgnn_tpu.train import step as TS
    from sgnn_tpu.train.state import create_train_state

    cfg0, _, _, _ = setup
    rng = np.random.RandomState(1)
    mesh = PM.make_mesh(2)
    losses = {}
    for execution in ("dense_flow", "folded"):
        cfg = _dc.replace(cfg0, batch_size=1, execution=execution)
        params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
        state = create_train_state(params, stats)
        step = TS.make_train_step(
            cfg, mesh, num_refine_active=cfg.num_refine_levels,
            do_surf=True,
        )
        Z, Y, X = cfg.input_dim
        cap = cfg.input_cap
        rng = np.random.RandomState(7)
        locs = np.full((2, cap, 4), -1, np.int32)
        feats = np.zeros((2, cap, 1), np.float32)
        nums = np.zeros((2,), np.int32)
        for d in range(2):
            k = 80
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
        losses[execution] = float(metrics["loss"])
        assert _np.isfinite(losses[execution])
    np.testing.assert_allclose(losses["folded"], losses["dense_flow"],
                               rtol=1e-3)


def test_bn_conv_fused_matches_composition(rng):
    """ops/folded.py:bn_conv_folded_train == [bn_folded(train) ->
    subm_conv_folded_train]: forward, running stats, and gradients wrt
    input grid, BN scale/bias, and conv weights (the composite custom
    VJP's moment terms must fall out of autodiff exactly)."""
    import jax
    import jax.numpy as jnp

    from sgnn_tpu.ops import folded as FO

    cpad = 16
    B, Z, Y, X = 2, 8, 8, 16
    C, cout = 8, 8
    xq = FO._xq_for(X, cpad)
    data = np.zeros((B, Z + 2, Y + 2, xq, FO.LANES), np.float32)
    mask = np.zeros_like(data)
    occ = rng.rand(B, Z, Y, xq, FO.LANES // cpad) > 0.4
    occ_l = np.repeat(occ, cpad, axis=-1).reshape(mask[:, 1:-1, 1:-1].shape)
    mask[:, 1:-1, 1:-1] = occ_l
    data[:, 1:-1, 1:-1] = rng.randn(B, Z, Y, xq, FO.LANES) * occ_l
    fg = FO.FGrid(jnp.asarray(data), (Z, Y, X), C, cpad)
    fm = FO.FGrid(jnp.asarray(mask), (Z, Y, X), cpad, cpad)
    bn_p = {
        "scale": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(C).astype(np.float32) * 0.1),
    }
    bn_s = {
        "mean": jnp.zeros((C,), jnp.float32),
        "var": jnp.ones((C,), jnp.float32),
    }
    w = jnp.asarray(rng.randn(27, C, cout).astype(np.float32) * 0.1)

    def fused(data, scale, bias, w):
        g = FO.FGrid(data, (Z, Y, X), C, cpad)
        out, ns = FO.bn_conv_folded_train(
            {"scale": scale, "bias": bias}, bn_s, [g], fm, w, cout,
        )
        return jnp.sum(out.data ** 2), (out.data, ns)

    def composed(data, scale, bias, w):
        g = FO.FGrid(data, (Z, Y, X), C, cpad)
        y, ns = FO.bn_folded(
            {"scale": scale, "bias": bias}, bn_s, g, fm, training=True,
        )
        out = FO.subm_conv_folded_train([y], fm, w, cout)
        return jnp.sum(out.data ** 2), (out.data, ns)

    args = (jnp.asarray(data), bn_p["scale"], bn_p["bias"], w)
    (lf, (of, nsf)), gf = jax.value_and_grad(
        fused, argnums=(0, 1, 2, 3), has_aux=True)(*args)
    (lc, (oc, nsc)), gc = jax.value_and_grad(
        composed, argnums=(0, 1, 2, 3), has_aux=True)(*args)

    np.testing.assert_allclose(np.asarray(of), np.asarray(oc),
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(nsf[k]), np.asarray(nsc[k]),
                                   rtol=1e-6, atol=1e-6)
    for a, b, name in zip(gf, gc, ("dx", "dscale", "dbias", "dw")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )

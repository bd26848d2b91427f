"""Spatial (z-axis) sharding: halo-exchanged convs == unsharded convs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sgnn_tpu.ops import dense as D
from sgnn_tpu.parallel import mesh as PM
from sgnn_tpu.parallel import spatial as SP


def _mesh8():
    return PM.make_mesh(8)


def test_halo_conv3d_matches_unsharded(rng):
    mesh = _mesh8()
    B, Z, Y, X, Cin, Cout = 1, 32, 8, 8, 3, 5
    x = rng.randn(B, Z, Y, X, Cin).astype(np.float32)
    w = rng.randn(Cout, Cin, 3, 3, 3).astype(np.float32) * 0.2
    ref = np.asarray(D.conv3d(jnp.asarray(x), jnp.asarray(w), padding=1))

    def f(xl, w):
        return SP.sharded_conv3d(xl, w, "data", stride=1, padding=1)

    sharded = shard_map(
        f, mesh=mesh,
        in_specs=(P(None, "data"), P()), out_specs=P(None, "data"),
    )
    got = np.asarray(jax.jit(sharded)(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_strided_sharded_conv(rng):
    mesh = _mesh8()
    B, Z, Y, X, Cin, Cout = 1, 32, 8, 8, 4, 4
    x = rng.randn(B, Z, Y, X, Cin).astype(np.float32)
    w = rng.randn(Cout, Cin, 2, 2, 2).astype(np.float32) * 0.3
    ref = np.asarray(D.conv3d(jnp.asarray(x), jnp.asarray(w), stride=2))

    def f(xl, w):
        return SP.sharded_conv3d(xl, w, "data", stride=2, padding=0)

    sharded = shard_map(
        f, mesh=mesh,
        in_specs=(P(None, "data"), P()), out_specs=P(None, "data"),
    )
    got = np.asarray(jax.jit(sharded)(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_halo_exchange_boundaries(rng):
    mesh = _mesh8()
    x = rng.randn(1, 16, 4, 4, 2).astype(np.float32)

    def f(xl):
        return SP.halo_exchange(xl, 1, "data")

    sharded = shard_map(
        f, mesh=mesh, in_specs=P(None, "data"), out_specs=P(None, "data"),
    )
    out = np.asarray(jax.jit(sharded)(jnp.asarray(x)))
    # each device's output slab is [prev-halo | local 2 | next-halo] = 4
    out = out.reshape(1, 8, 4, 4, 4, 2)  # [B, dev, zl+2, Y, X, C]
    # device 0's lower halo is zeros (global boundary)
    assert (out[0, 0, 0] == 0).all()
    # device 7's upper halo is zeros
    assert (out[0, 7, 3] == 0).all()
    # device 3's lower halo == device 2's top plane
    np.testing.assert_array_equal(out[0, 3, 0], x[0, 2 * 3 - 1])
    np.testing.assert_array_equal(out[0, 3, 3], x[0, 2 * 4])


def test_bn_moments_sync_across_devices(rng):
    """BN batch moments psum'd over the mesh == single-device moments on
    the concatenated batch (the correctness condition for DP BatchNorm)."""
    import jax.numpy as jnp

    from sgnn_tpu.ops import bn as BN

    mesh = _mesh8()
    N, C = 64, 5
    x = rng.randn(8 * N, C).astype(np.float32)
    mask = rng.rand(8 * N) > 0.3
    params, stats = BN.init_bn(C)

    def f(xl, ml):
        y, new_stats = BN.batch_norm(
            params, stats, xl, ml, training=True, axis_name="data"
        )
        return y, new_stats

    sharded = shard_map(
        f, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P()),
    )
    y_sh, stats_sh = jax.jit(sharded)(jnp.asarray(x), jnp.asarray(mask))
    y_ref, stats_ref = BN.batch_norm(
        params, stats, jnp.asarray(x), jnp.asarray(mask), training=True
    )
    np.testing.assert_allclose(
        np.asarray(y_sh), np.asarray(y_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats_sh["mean"]), np.asarray(stats_ref["mean"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(stats_sh["var"]), np.asarray(stats_ref["var"]), rtol=1e-4
    )


def test_full_model_spatial_sharded_forward(rng):
    """Whole dense_flow forward over a z-sharded 4-device mesh equals the
    unsharded forward (VERDICT item 5: scenes beyond one chip's HBM via
    halo-exchanged convs + replicated 1/8-res trunk)."""
    import numpy as np
    from jax.sharding import Mesh

    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.models import dense_flow as DFM
    from sgnn_tpu.models import sgnn as M
    from sgnn_tpu.ops.sparse import make_sparse

    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("space",))
    cfg = SGNNConfig(
        encoder_dim=4, input_dim=(128, 32, 32), nf_coarse=8, nf=8,
        num_hierarchy_levels=4, batch_size=1,
        occupancy_fractions=(1.0, 1.0, 1.0, 1.0),
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)

    Z, Y, X = cfg.input_dim
    n = 600
    flat = rng.choice(Z * Y * X, size=n, replace=False)
    z, rem = flat // (Y * X), flat % (Y * X)
    y, x = rem // X, rem % X
    locs = np.zeros((1024, 4), np.int32) - 1
    locs[:n] = np.stack([z, y, x, np.zeros_like(z)], -1)
    feats = np.zeros((1024, 1), np.float32)
    feats[:n, 0] = rng.randn(n).astype(np.float32)

    def fwd(training, sp_axis=None):
        def f(locs, feats):
            st = make_sparse(locs, feats, n, cfg.input_dim, 1)
            out, new_stats = DFM.genmodel_apply_dense(
                params, stats, cfg, st,
                num_refine_active=cfg.num_refine_levels, do_surf=True,
                training=training, sp_axis=sp_axis,
            )
            flat_out = (
                out.coarse_out, *out.refine_outs,
                *[m.astype(np.int8) for m in out.refine_masks_unfilt],
                out.surf_sdf, out.surf_mask.astype(np.int8),
            )
            return flat_out, new_stats
        return f

    for training in (False, True):
        ref_out, ref_stats = jax.jit(fwd(training))(locs, feats)
        n_out = len(ref_out)
        sharded = shard_map(
            fwd(training, sp_axis="space"), mesh=mesh,
            in_specs=(P(), P()),
            out_specs=((P(None, "space"),) * n_out, P()),
            check_vma=False,
        )
        got_out, got_stats = jax.jit(sharded)(locs, feats)
        for r, g in zip(ref_out, got_out):
            assert r.shape == g.shape
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4
            )
        if training:  # BN moments psum'd over the space axis must agree
            for (pr, r), (pg, g) in zip(
                jax.tree_util.tree_leaves_with_path(ref_stats),
                jax.tree_util.tree_leaves_with_path(got_stats),
            ):
                assert pr == pg
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r), rtol=1e-3, atol=1e-5,
                    err_msg=str(pr),
                )


@pytest.mark.slow
def test_full_model_spatial_folded_forward(rng):
    """Whole FOLDED forward over a z-sharded 4-device mesh equals the
    unsharded folded forward (big scenes at folded speed: per-site z
    halo exchanges via ops/folded.py:halo_exchange_z)."""
    import numpy as np
    from jax.sharding import Mesh

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.models import folded_flow as FFM
    from sgnn_tpu.models import sgnn as M
    from sgnn_tpu.ops.sparse import make_sparse

    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        n_dev = 4
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("space",))
        cfg = SGNNConfig(
            encoder_dim=4, input_dim=(128, 32, 32), nf_coarse=8, nf=8,
            num_hierarchy_levels=4, batch_size=1,
            occupancy_fractions=(1.0, 1.0, 1.0, 1.0),
            compute_dtype="float32",
        )
        params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)

        Z, Y, X = cfg.input_dim
        n = 600
        flat = rng.choice(Z * Y * X, size=n, replace=False)
        z, rem = flat // (Y * X), flat % (Y * X)
        y, x = rem // X, rem % X
        locs = np.zeros((1024, 4), np.int32) - 1
        locs[:n] = np.stack([z, y, x, np.zeros_like(z)], -1)
        feats = np.zeros((1024, 1), np.float32)
        feats[:n, 0] = rng.randn(n).astype(np.float32)

        def fwd(sp_axis=None):
            def f(locs, feats):
                st = make_sparse(locs, feats, n, cfg.input_dim, 1)
                out = FFM.genmodel_apply_folded(
                    params, stats, cfg, st,
                    num_refine_active=cfg.num_refine_levels,
                    do_surf=True, sp_axis=sp_axis,
                )
                return (
                    out.coarse_out, *out.refine_outs,
                    *[m.astype(np.int8) for m in out.refine_masks_unfilt],
                    out.surf_sdf, out.surf_mask.astype(np.int8),
                )
            return f

        ref_out = jax.jit(fwd())(locs, feats)
        n_out = len(ref_out)
        sharded = shard_map(
            fwd(sp_axis="space"), mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(None, "space"),) * n_out,
            check_vma=False,
        )
        got_out = jax.jit(sharded)(locs, feats)
        for r, g in zip(ref_out, got_out):
            assert r.shape == g.shape
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4,
            )
    finally:
        PC.pl.pallas_call = orig

"""GenModel forward: shapes, batch independence, jit+grad."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.models import sgnn as M
from sgnn_tpu.ops.sparse import make_sparse
from sgnn_tpu import losses as L


CFG = SGNNConfig(
    encoder_dim=4,
    input_dim=(32, 32, 32),
    input_nf=1,
    nf_coarse=8,
    nf=8,
    num_hierarchy_levels=3,
    batch_size=2,
    # A randomly initialized model keeps ~half of ALL voxels at each level
    # (sigmoid(occ) ~ 0.5), unlike a trained model that keeps surfaces only.
    # Use full-occupancy capacities so nothing overflows in these tests.
    occupancy_fractions=(1.0, 1.0, 1.0),
)


def _rand_input(rng, cfg, identical_batches=False):
    n_per = 60
    cap = cfg.input_cap
    Z, Y, X = cfg.input_dim
    locs_list, feats_list = [], []
    base_zyx = None
    base_f = None
    for b in range(cfg.batch_size):
        if identical_batches and base_zyx is not None:
            zyx, f = base_zyx, base_f
        else:
            flat = rng.choice(Z * Y * X, size=n_per, replace=False)
            z, rem = flat // (Y * X), flat % (Y * X)
            y, x = rem // X, rem % X
            zyx = np.stack([z, y, x], -1).astype(np.int32)
            f = rng.randn(n_per, cfg.input_nf).astype(np.float32)
            base_zyx, base_f = zyx, f
        locs_list.append(
            np.concatenate([zyx, np.full((n_per, 1), b, np.int32)], -1)
        )
        feats_list.append(f)
    locs = np.concatenate(locs_list, 0)
    feats = np.concatenate(feats_list, 0)
    n = locs.shape[0]
    locs = np.concatenate([locs, np.zeros((cap - n, 4), np.int32)], 0)
    feats = np.concatenate([feats, np.zeros((cap - n, cfg.input_nf), np.float32)], 0)
    return make_sparse(locs, feats, n, cfg.input_dim, cfg.batch_size)


@pytest.fixture(scope="module")
def model():
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), CFG)
    return params, stats


def test_forward_shapes(rng, model):
    params, stats = model
    st = _rand_input(rng, CFG)
    out, new_stats = M.genmodel_apply(
        params, stats, CFG, st,
        num_refine_active=CFG.num_refine_levels, do_surf=True, training=False,
    )
    Z, Y, X = CFG.input_dim
    f = 2 ** (CFG.num_hierarchy_levels - 1)
    assert out.coarse_out.shape == (CFG.batch_size, Z // f, Y // f, X // f, 2)
    assert len(out.refine_outs) == CFG.num_refine_levels
    for h, (locs_u, out_u, num_u) in enumerate(out.refine_outs):
        assert locs_u.shape[1] == 4
        assert out_u.shape == (locs_u.shape[0], 2)
        assert int(num_u) >= 0
        assert np.isfinite(np.asarray(out_u)).all()
    assert out.surf_sdf.shape[1] == 1
    assert np.isfinite(np.asarray(out.surf_sdf)).all()
    assert all(int(o) == 0 for o in out.overflows)
    n = int(out.surf_num_valid)
    locs = np.asarray(out.surf_locs[:n])
    if n:
        assert locs[:, :3].min() >= 0
        assert (locs[:, 0] < Z).all() and (locs[:, 1] < Y).all() and (locs[:, 2] < X).all()
    # stats pytree structure preserved
    assert jax.tree_util.tree_structure(new_stats) == jax.tree_util.tree_structure(stats)


def test_batch_independence(rng, model):
    """Identical samples in a batch must produce identical per-sample outputs
    (the reference's own sanity invariant, model.py:404-414)."""
    params, stats = model
    st = _rand_input(rng, CFG, identical_batches=True)
    out, _ = M.genmodel_apply(
        params, stats, CFG, st,
        num_refine_active=CFG.num_refine_levels, do_surf=True, training=False,
    )
    co = np.asarray(out.coarse_out)
    np.testing.assert_allclose(co[0], co[1], rtol=1e-4, atol=1e-5)
    # surface prediction: same voxel set and values per batch element
    n = int(out.surf_num_valid)
    locs = np.asarray(out.surf_locs[:n])
    sdf = np.asarray(out.surf_sdf[:n, 0])
    per_batch = {}
    for b in range(CFG.batch_size):
        m = locs[:, 3] == b
        d = {tuple(l): v for l, v in zip(locs[m][:, :3].tolist(), sdf[m].tolist())}
        per_batch[b] = d
    assert per_batch[0].keys() == per_batch[1].keys()
    assert len(per_batch[0]) > 0
    for k in per_batch[0]:
        np.testing.assert_allclose(per_batch[0][k], per_batch[1][k], rtol=1e-3, atol=1e-4)


def test_partial_levels(rng, model):
    """Early-training gating: only some refinement levels active."""
    params, stats = model
    st = _rand_input(rng, CFG)
    out, _ = M.genmodel_apply(
        params, stats, CFG, st, num_refine_active=1, do_surf=False,
        training=False,
    )
    assert len(out.refine_outs) == 1
    assert int(out.surf_num_valid) == 0


def test_jit_grad_through_loss(rng, model):
    params, stats = model
    st = _rand_input(rng, CFG)
    Z, Y, X = CFG.input_dim
    B = CFG.batch_size
    tgt = rng.randn(B, Z, Y, X).astype(np.float32) * 2
    known = (rng.rand(B, Z, Y, X) * 3).astype(np.uint8)
    hier = [
        jnp.asarray(rng.randn(B, Z // 4, Y // 4, X // 4).astype(np.float32)),
        jnp.asarray(rng.randn(B, Z // 2, Y // 2, X // 2).astype(np.float32)),
    ]
    targets = L.compute_targets(
        jnp.asarray(tgt), hier, CFG.num_hierarchy_levels, CFG.truncation,
        True, jnp.asarray(known),
    )
    lw = jnp.ones(CFG.num_hierarchy_levels + 1, jnp.float32)

    def loss_fn(params):
        out, new_stats = M.genmodel_apply(
            params, stats, CFG, st,
            num_refine_active=CFG.num_refine_levels, do_surf=True,
            training=True,
        )
        total, _ = L.compute_loss(
            out, targets, lw, CFG.truncation,
            num_refine_active=CFG.num_refine_levels, do_surf=True,
            weight_missing_geo=5.0, input_locs=st.locs,
            input_num_valid=st.num_valid, use_loss_masking=True,
            known=jnp.asarray(known),
        )
        return total

    total, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least the encoder input conv must receive gradient
    g0 = np.asarray(grads["encoder"]["process_sparse"][0]["p1"])
    assert np.abs(g0).max() > 0

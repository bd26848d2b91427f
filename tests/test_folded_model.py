"""Folded execution vs the unfolded dense_flow on a full tiny model."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.models import dense_flow as DF
from sgnn_tpu.models import folded_flow as FF
from sgnn_tpu.models import sgnn as M
from sgnn_tpu.ops.sparse import make_sparse


@pytest.fixture
def interpret_pallas():
    import jax.experimental.pallas as pl

    import sgnn_tpu.ops.pallas.conv3d_folded as PC

    orig = pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    yield
    PC.pl.pallas_call = orig


def _inputs(cfg, seed=3, n=60):
    rng = np.random.RandomState(seed)
    Z, Y, X = cfg.input_dim
    cap = cfg.input_cap
    flat = rng.choice(Z * Y * X, n, replace=False)
    z, rem = flat // (Y * X), flat % (Y * X)
    y, x = rem // X, rem % X
    locs = np.full((cap, 4), -1, np.int32)
    locs[:n] = np.stack([z, y, x, np.zeros_like(z)], -1)
    feats = np.zeros((cap, 1), np.float32)
    feats[:n, 0] = rng.randn(n)
    return make_sparse(locs, feats, n, cfg.input_dim, 1)


def _surface_inputs(cfg, seed=0, keep=0.85):
    """Surface-like input: a partial spherical TSDF shell (occupancy
    gates of a random-init model open on real structure; pure noise can
    shut every gate and make downstream assertions vacuous)."""
    rng = np.random.RandomState(seed)
    Z, Y, X = cfg.input_dim
    zz, yy, xx = np.meshgrid(
        np.arange(Z), np.arange(Y), np.arange(X), indexing="ij"
    )
    d = np.sqrt(
        (zz - Z / 2.0) ** 2 + (yy - Y / 2.0) ** 2 + (xx - X / 2.0) ** 2
    ) - min(Z, Y, X) * 0.35
    sel = np.abs(d) < cfg.truncation
    z, y, x = np.nonzero(sel)
    m = rng.rand(len(z)) < keep
    z, y, x = z[m], y[m], x[m]
    cap = cfg.input_cap
    n = min(len(z), cap)
    locs = np.full((cap, 4), -1, np.int32)
    feats = np.zeros((cap, 1), np.float32)
    locs[:n] = np.stack([z, y, x, np.zeros_like(z)], -1)[:n]
    feats[:n, 0] = d[z, y, x][:n]
    return make_sparse(locs, feats, n, cfg.input_dim, 1)


@pytest.mark.slow
def test_folded_matches_dense_flow(rng, interpret_pallas):
    cfg = SGNNConfig(
        encoder_dim=8,
        input_dim=(16, 16, 32),
        nf_coarse=16,
        nf=16,
        num_hierarchy_levels=3,
        batch_size=1,
        execution="dense_flow",
        compute_dtype="float32",
        occupancy_fractions=(1.0, 1.0, 1.0),
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(1), cfg)
    st = _inputs(cfg)

    ref, _ = DF.genmodel_apply_dense(
        params, stats, cfg, st,
        num_refine_active=cfg.num_refine_levels, do_surf=True,
        training=False,
    )
    got = FF.genmodel_apply_folded(
        params, stats, cfg, st,
        num_refine_active=cfg.num_refine_levels, do_surf=True,
    )

    np.testing.assert_allclose(
        np.asarray(got.coarse_out), np.asarray(ref.coarse_out),
        rtol=1e-4, atol=1e-4,
    )
    for h, (a, b) in enumerate(zip(got.refine_outs, ref.refine_outs)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"refine level {h}",
        )
        np.testing.assert_array_equal(
            np.asarray(got.refine_masks_unfilt[h]),
            np.asarray(ref.refine_masks_unfilt[h]),
            err_msg=f"refine mask {h}",
        )
    np.testing.assert_array_equal(
        np.asarray(got.surf_mask), np.asarray(ref.surf_mask)
    )
    m = np.asarray(ref.surf_mask)
    np.testing.assert_allclose(
        np.asarray(got.surf_sdf)[m], np.asarray(ref.surf_sdf)[m],
        rtol=2e-3, atol=2e-3,
    )


@pytest.mark.slow
def test_folded_partial_levels(rng, interpret_pallas):
    """Level gating (num_refine_active < L, no surf) matches."""
    cfg = SGNNConfig(
        encoder_dim=4,
        input_dim=(16, 16, 16),
        nf_coarse=8,
        nf=16,
        num_hierarchy_levels=3,
        batch_size=1,
        execution="dense_flow",
        compute_dtype="float32",
        occupancy_fractions=(1.0, 1.0, 1.0),
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(2), cfg)
    st = _inputs(cfg, seed=5, n=40)
    ref, _ = DF.genmodel_apply_dense(
        params, stats, cfg, st, num_refine_active=1, do_surf=False,
        training=False,
    )
    got = FF.genmodel_apply_folded(
        params, stats, cfg, st, num_refine_active=1, do_surf=False,
    )
    assert len(got.refine_outs) == 1
    np.testing.assert_allclose(
        np.asarray(got.refine_outs[0]), np.asarray(ref.refine_outs[0]),
        rtol=2e-3, atol=2e-3,
    )
    assert not np.asarray(got.surf_mask).any()


@pytest.mark.slow
def test_folded_int8_close_to_exact(rng, interpret_pallas):
    """quantize_int8 forward stays close to the exact folded forward:
    high occupancy-mask agreement and small SDF error."""
    cfg = SGNNConfig(
        input_dim=(16, 16, 16),
        num_hierarchy_levels=3,
        encoder_dim=4,
        nf_coarse=8,
        nf=8,
        batch_size=1,
        execution="dense_flow",
        compute_dtype="float32",
        occupancy_fractions=(1.0, 1.0, 1.0),
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    st = _surface_inputs(cfg)
    exact = FF.genmodel_apply_folded(
        params, stats, cfg, st, num_refine_active=2, do_surf=True,
    )
    q = FF.genmodel_apply_folded(
        params, stats, dataclasses.replace(cfg, quantize_int8=True), st,
        num_refine_active=2, do_surf=True,
    )
    me, mq = np.asarray(exact.surf_mask), np.asarray(q.surf_mask)
    # non-vacuous by construction: an empty mask is exactly the failure
    # mode quantization would most plausibly cause (round-2 verdict)
    assert me.any(), "exact forward produced an empty surface mask"
    assert mq.any(), "int8 forward produced an empty surface mask"
    union = (me | mq).sum()
    iou = (me & mq).sum() / union
    assert iou > 0.95, iou
    both = me & mq
    assert both.any()
    err = np.abs(
        np.asarray(exact.surf_sdf)[both] - np.asarray(q.surf_sdf)[both]
    )
    scale = max(np.abs(np.asarray(exact.surf_sdf)[both]).max(), 1e-3)
    # robust bounds: int8's per-tile dynamic scales leave a thin error
    # tail (measured p99 ~15% of scale on this fixture); a broken scale
    # produces errors of O(scale) across the board, which these catch
    assert err.mean() / scale < 0.05, (err.mean(), scale)
    assert np.percentile(err, 95) / scale < 0.15, (
        np.percentile(err, 95), scale)


def test_folded_surface_only_outputs(rng, interpret_pallas):
    """want_level_outputs=False (production only-surface serving) must
    reproduce the surface outputs exactly while returning None for the
    per-level raw grids/masks."""
    cfg = SGNNConfig(
        encoder_dim=4,
        input_dim=(16, 16, 16),
        nf_coarse=8,
        nf=8,
        num_hierarchy_levels=3,
        batch_size=1,
        execution="dense_flow",
        compute_dtype="float32",
        occupancy_fractions=(1.0, 1.0, 1.0),
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    st = _surface_inputs(cfg)
    full = FF.genmodel_apply_folded(
        params, stats, cfg, st, num_refine_active=2, do_surf=True,
    )
    lite = FF.genmodel_apply_folded(
        params, stats, cfg, st, num_refine_active=2, do_surf=True,
        want_level_outputs=False,
    )
    assert all(o is None for o in lite.refine_outs)
    assert all(m is None for m in lite.refine_masks_unfilt)
    np.testing.assert_array_equal(
        np.asarray(lite.surf_mask), np.asarray(full.surf_mask)
    )
    m = np.asarray(full.surf_mask)
    assert m.any(), "degenerate fixture: empty surface"
    np.testing.assert_allclose(
        np.asarray(lite.surf_sdf)[m], np.asarray(full.surf_sdf)[m],
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(lite.coarse_out), np.asarray(full.coarse_out),
        rtol=1e-6, atol=1e-6,
    )

"""Dense conv backend == gather backend, op- and model-level."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from sgnn_tpu.ops import conv as CV
from tests.test_sparse_conv import SP, B, _rand_sparse
from tests.test_model import CFG, _rand_input
from sgnn_tpu.models import sgnn as M


def test_submanifold_dense_matches_gather(rng):
    st = _rand_sparse(rng, 60, 80, 5)
    w = jnp.asarray(rng.randn(27, 5, 7).astype(np.float32) * 0.3)
    a = CV.submanifold_conv3d(st, w)
    with CV.backend("dense"):
        b = CV.submanifold_conv3d(st, w)
    np.testing.assert_allclose(
        np.asarray(a.feats), np.asarray(b.feats), rtol=1e-4, atol=1e-5
    )


def test_strided_dense_matches_gather(rng):
    st = _rand_sparse(rng, 50, 64, 4)
    w = jnp.asarray(rng.randn(8, 4, 6).astype(np.float32) * 0.3)
    a = CV.strided_conv3d_down(st, w)
    with CV.backend("dense"):
        b = CV.strided_conv3d_down(st, w)
    assert int(a.num_valid) == int(b.num_valid)
    np.testing.assert_array_equal(np.asarray(a.locs), np.asarray(b.locs))
    np.testing.assert_allclose(
        np.asarray(a.feats), np.asarray(b.feats), rtol=1e-4, atol=1e-5
    )


def test_model_forward_backend_equivalence(rng):
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), CFG)
    st = _rand_input(rng, CFG)
    out_g, _ = M.genmodel_apply(
        params, stats, CFG, st,
        num_refine_active=CFG.num_refine_levels, do_surf=True, training=False,
    )
    cfg_d = dataclasses.replace(CFG, conv_backend="dense")
    out_d, _ = M.genmodel_apply(
        params, stats, cfg_d, st,
        num_refine_active=cfg_d.num_refine_levels, do_surf=True,
        training=False,
    )
    CV.set_backend("gather")  # restore the module default for other tests
    np.testing.assert_allclose(
        np.asarray(out_g.coarse_out), np.asarray(out_d.coarse_out),
        rtol=1e-3, atol=1e-4,
    )
    n_g, n_d = int(out_g.surf_num_valid), int(out_d.surf_num_valid)
    assert n_g == n_d
    # same surface voxel sets and close SDFs
    def as_map(out, n):
        locs = np.asarray(out.surf_locs[:n])
        sdf = np.asarray(out.surf_sdf[:n, 0])
        return {tuple(l): v for l, v in zip(locs.tolist(), sdf.tolist())}

    mg, md = as_map(out_g, n_g), as_map(out_d, n_d)
    assert mg.keys() == md.keys()
    diffs = [abs(mg[k] - md[k]) for k in mg]
    assert max(diffs) < 2e-2

"""bf16 compute path: runs, stays finite, tracks the f32 forward."""

import dataclasses

import numpy as np
import jax
import pytest

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.models import sgnn as M
from tests.test_model import CFG, _rand_input


def test_bf16_forward_close_to_f32(rng):
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), CFG)
    st = _rand_input(rng, CFG)
    out32, _ = M.genmodel_apply(
        params, stats, CFG, st,
        num_refine_active=CFG.num_refine_levels, do_surf=True, training=False,
    )
    cfg16 = dataclasses.replace(CFG, compute_dtype="bfloat16")
    out16, _ = M.genmodel_apply(
        params, stats, cfg16, st,
        num_refine_active=cfg16.num_refine_levels, do_surf=True,
        training=False,
    )
    a = np.asarray(out32.coarse_out, np.float32)
    b = np.asarray(out16.coarse_out, np.float32)
    assert b.dtype == np.float32  # heads emit f32 regardless
    assert np.isfinite(b).all()
    # bf16 has ~3 decimal digits; activations here are O(1)
    assert np.abs(a - b).mean() < 0.05
    # occupancy decisions mostly agree at the coarse level
    agree = ((a[..., 0] > 0) == (b[..., 0] > 0)).mean()
    assert agree > 0.97
    assert np.isfinite(np.asarray(out16.surf_sdf, np.float32)).all()

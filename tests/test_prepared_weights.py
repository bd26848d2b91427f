"""Prepared serving weights (prepare_folded_weights) vs inline folding.

The prep list hoists every per-site weight preparation (tap folds,
strided matrices, int8 quantization, BN eval-affines, head tiles) out of
the forward; the forward consuming it must be BITWISE-identical to the
inline path — same kernels, same operands, only their provenance moved.
"""

import numpy as np
import jax
import pytest

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.models import folded_flow as FF
from sgnn_tpu.models import sgnn as M

from tests.test_folded_model import _surface_inputs, interpret_pallas  # noqa: F401


def _cfg(quantize=False, X=32):
    return SGNNConfig(
        encoder_dim=8,
        input_dim=(16, 16, X),
        nf_coarse=16,
        nf=16,
        num_hierarchy_levels=3,
        batch_size=1,
        execution="dense_flow",
        compute_dtype="float32",
        occupancy_fractions=(1.0, 1.0, 1.0),
        quantize_int8=quantize,
    )


@pytest.mark.parametrize(
    "quantize",
    [False, pytest.param(True, marks=pytest.mark.slow)],
)
def test_prepared_matches_inline(interpret_pallas, quantize):  # noqa: F811
    cfg = _cfg(quantize=quantize)
    params, stats = M.genmodel_init(jax.random.PRNGKey(1), cfg)
    st = _surface_inputs(cfg)

    kw = dict(num_refine_active=cfg.num_refine_levels, do_surf=True,
              want_level_outputs=False)
    ref = FF.genmodel_apply_folded(params, stats, cfg, st, **kw)

    prep = FF.prepare_folded_weights(params, stats, cfg, **kw)
    assert len(prep) > 0
    got = FF.genmodel_apply_folded(params, stats, cfg, st, prep=prep, **kw)

    np.testing.assert_array_equal(
        np.asarray(got.coarse_out), np.asarray(ref.coarse_out)
    )
    np.testing.assert_array_equal(
        np.asarray(got.surf_sdf), np.asarray(ref.surf_sdf)
    )
    np.testing.assert_array_equal(
        np.asarray(got.surf_mask), np.asarray(ref.surf_mask)
    )
    assert np.asarray(ref.surf_mask).sum() > 0  # non-vacuous


@pytest.mark.slow
def test_prepared_under_jit(interpret_pallas):  # noqa: F811
    """prep consumed as ordinary jit inputs (the serving shape)."""
    cfg = _cfg()
    params, stats = M.genmodel_init(jax.random.PRNGKey(2), cfg)
    st = _surface_inputs(cfg, seed=1)
    kw = dict(num_refine_active=cfg.num_refine_levels, do_surf=True,
              want_level_outputs=False)
    prep = FF.prepare_folded_weights(params, stats, cfg, **kw)

    @jax.jit
    def fwd(params, stats, st, prep):
        return FF.genmodel_apply_folded(
            params, stats, cfg, st, prep=prep, **kw
        )

    ref = FF.genmodel_apply_folded(params, stats, cfg, st, **kw)
    got = fwd(params, stats, st, prep)
    np.testing.assert_array_equal(
        np.asarray(got.surf_sdf), np.asarray(ref.surf_sdf)
    )


def test_prep_stream_mismatch_asserts(interpret_pallas):  # noqa: F811
    """A prep list from mismatched flags must fail loudly, not mis-wire."""
    cfg = _cfg()
    params, stats = M.genmodel_init(jax.random.PRNGKey(1), cfg)
    st = _surface_inputs(cfg)
    prep = FF.prepare_folded_weights(
        params, stats, cfg, num_refine_active=cfg.num_refine_levels,
        do_surf=True, want_level_outputs=False,
    )
    with pytest.raises(AssertionError):
        FF.genmodel_apply_folded(
            params, stats, cfg, st, prep=prep[:-1],
            num_refine_active=cfg.num_refine_levels, do_surf=True,
            want_level_outputs=False,
        )

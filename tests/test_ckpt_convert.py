"""Checkpoint converter: synthetic reference state_dict -> full conversion."""

import numpy as np
import pytest
import jax

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.models.sgnn import genmodel_init
from sgnn_tpu.utils import ckpt_convert as CC


CFG = SGNNConfig(
    encoder_dim=8, input_dim=(64, 64, 64), nf_coarse=16, nf=16,
    num_hierarchy_levels=4, batch_size=1,
)


def _synthetic_sd(rng, spec):
    sd = {}
    for k, shape in spec.items():
        sd[k] = rng.randn(*shape).astype(np.float32)
    return sd


def test_spec_matches_reference_defaults():
    """Default config parameter count ~0.64M. Consistency check vs the
    7.5MB sgnn.pth (README.md:18): the .pth stores params + Adam m/v
    moments = 3x params x 4B ~= 7.7MB, matching 0.64M params."""
    spec = CC.expected_state_dict_spec(CFG)
    n_params = sum(
        int(np.prod(s)) for k, s in spec.items()
        if not any(k.endswith(x) for x in ("running_mean", "running_var"))
    )
    assert 5.5e5 < n_params < 7.5e5, n_params
    assert 6.5e6 < 3 * n_params * 4 < 8.5e6  # ~7.5MB with optimizer state
    # reference nf_per_level for defaults is [8, 12, 16] (model.py:286)
    assert CFG.nf_per_level == [8, 12, 16]
    assert spec["encoder.process_sparse.0.p1.weight"] == (27, 1, 8)
    assert spec["encoder.process_sparse.2.p3.0.weight"] == (8, 16, 16)
    # refinement input widths (model.py:296-303): 34, 34, 30
    assert spec["refinement.0.p1.weight"] == (27, 34, 16)
    assert spec["refinement.1.p1.weight"] == (27, 34, 16)
    assert spec["refinement.2.p1.weight"] == (27, 30, 16)
    # surfacepred nf_in = 8+2+16 = 26
    assert spec["surfacepred.p1.weight"] == (27, 26, 16)
    assert spec["surfacepred.linear.weight"] == (1, 48)


def test_full_conversion(rng):
    spec = CC.expected_state_dict_spec(CFG)
    sd = _synthetic_sd(rng, spec)
    params, stats = genmodel_init(jax.random.PRNGKey(0), CFG)
    new_p, new_s = CC.convert_state_dict(sd, CFG, params, stats)
    # structure preserved
    assert jax.tree_util.tree_structure(new_p) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, params)
    )
    # spot-check exact values land in the right leaves
    np.testing.assert_array_equal(
        new_p["encoder"]["process_sparse"][0]["p1"],
        sd["encoder.process_sparse.0.p1.weight"],
    )
    np.testing.assert_array_equal(
        new_p["refinement"][2]["p2"]["deeper"]["deeper"]["block"]["conv1"],
        sd["refinement.2.p2.2.1.2.2.1.2.0.1.3.weight"],
    )
    np.testing.assert_array_equal(
        new_p["surfacepred"]["linear"]["weight"],
        sd["surfacepred.linear.weight"].T,
    )
    np.testing.assert_array_equal(
        new_s["encoder"]["final"]["bn"]["mean"],
        sd["encoder.final.1.running_mean"],
    )
    np.testing.assert_array_equal(
        new_s["refinement"][0]["p2"]["down_bn"]["var"],
        sd["refinement.0.p2.2.1.0.running_var"],
    )


def test_conversion_detects_missing_and_extra(rng):
    spec = CC.expected_state_dict_spec(CFG)
    sd = _synthetic_sd(rng, spec)
    params, stats = genmodel_init(jax.random.PRNGKey(0), CFG)
    del sd["surfacepred.linear.bias"]
    with pytest.raises(CC.ConversionError, match="missing"):
        CC.convert_state_dict(sd, CFG, params, stats)
    sd = _synthetic_sd(rng, spec)
    sd["bogus.extra.weight"] = np.zeros(3, np.float32)
    with pytest.raises(CC.ConversionError, match="unconsumed"):
        CC.convert_state_dict(sd, CFG, params, stats)


def test_torch_roundtrip(tmp_path, rng):
    """Full path through torch.save -> load_reference_checkpoint."""
    torch = pytest.importorskip("torch")
    spec = CC.expected_state_dict_spec(CFG)
    sd = {k: torch.from_numpy(v) for k, v in _synthetic_sd(rng, spec).items()}
    p = str(tmp_path / "sgnn.pth")
    torch.save({"epoch": 3, "state_dict": sd, "optimizer": {}}, p)
    params, stats, meta = CC.load_reference_checkpoint(p, CFG)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(
        params["encoder"]["occpred"],
        sd["encoder.occpred.0.weight"].numpy(),
    )


def test_tap_order_flip(tmp_path, rng):
    """tap_order='flipped' reverses exactly the sparse-conv tap axes and
    nothing else; applying it twice is the identity."""
    torch = pytest.importorskip("torch")
    spec = CC.expected_state_dict_spec(CFG)
    sd = {k: torch.from_numpy(v) for k, v in _synthetic_sd(rng, spec).items()}
    p = str(tmp_path / "sgnn.pth")
    torch.save({"epoch": 0, "state_dict": sd, "optimizer": {}}, p)
    pc, sc, _ = CC.load_reference_checkpoint(p, CFG, tap_order="c")
    pf, sf, _ = CC.load_reference_checkpoint(p, CFG, tap_order="flipped")

    flat_c = {"/".join(map(str, k)): v for k, v
              in jax.tree_util.tree_flatten_with_path(pc)[0]}
    flat_f = {"/".join(map(str, k)): v for k, v
              in jax.tree_util.tree_flatten_with_path(pf)[0]}
    n_flipped = 0
    for k, vc in flat_c.items():
        vc = np.asarray(vc)
        vf = np.asarray(flat_f[k])
        if vc.ndim == 3 and vc.shape[0] in (8, 27):
            np.testing.assert_array_equal(vf, vc[::-1], err_msg=k)
            n_flipped += 1
        else:
            np.testing.assert_array_equal(vf, vc, err_msg=k)
    assert n_flipped > 10  # every subm/strided conv in the model
    # stats untouched
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(sc)[0],
        jax.tree_util.tree_flatten_with_path(sf)[0],
    ):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # involution
    p2 = CC.flip_tap_order(CC.flip_tap_order(pc))
    for k, v in {"/".join(map(str, k)): v for k, v
                 in jax.tree_util.tree_flatten_with_path(p2)[0]}.items():
        np.testing.assert_array_equal(np.asarray(v), flat_c[k])


def _assert_tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: keys {set(a)} != {set(b)}"
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=path,
        )


def _involution_check(params, stats):
    """export -> (layout == reference spec) -> convert back -> bit-equal."""
    sd = CC.export_state_dict(params, stats, CFG)
    spec = CC.expected_state_dict_spec(CFG)
    assert set(sd) == set(spec), (
        f"exported keys diverge from the reference layout: "
        f"extra={sorted(set(sd) - set(spec))[:5]} "
        f"missing={sorted(set(spec) - set(sd))[:5]}"
    )
    for k, v in sd.items():
        assert tuple(v.shape) == tuple(spec[k]), (k, v.shape, spec[k])
    p0, s0 = genmodel_init(jax.random.PRNGKey(9), CFG)  # fresh templates
    p2, s2 = CC.convert_state_dict(sd, CFG, p0, s0)
    _assert_tree_equal(params, p2, "params")
    _assert_tree_equal(stats, s2, "stats")


def test_export_involution_random_init():
    """export_state_dict o convert_state_dict == identity, and the
    exported key/shape set IS the reference layout
    (/root/reference/torch/test_scene.py:61-62 load contract)."""
    params, stats = genmodel_init(jax.random.PRNGKey(4), CFG)
    _involution_check(params, stats)


def test_export_involution_trained_ckpt():
    """Same involution on a TRAINED checkpoint (realistic weight/BN-stat
    values, not random init): point SGNN_TRAINED_CKPT at a .ckpt from
    tools/train.py with the default architecture (encoder_dim 8, nf 16,
    L=4)."""
    import os

    path = os.environ.get("SGNN_TRAINED_CKPT", "")
    if not path:
        pytest.skip("set SGNN_TRAINED_CKPT=<model.ckpt> to run")
    from sgnn_tpu.train.checkpoint import load_checkpoint
    from sgnn_tpu.train.state import create_train_state

    params, stats = genmodel_init(jax.random.PRNGKey(0), CFG)
    state, _ = load_checkpoint(path, create_train_state(params, stats))
    # trained BN stats must be non-degenerate or the test proves nothing.
    # Check an ALWAYS-ACTIVE layer (the TSDF encoder): refinement/surface
    # BN stats legitimately sit at init until their level fades in
    # (schedules.get_loss_weights), so a mid-schedule checkpoint would
    # fail a surface-head guard while being perfectly trained.
    v = np.asarray(state.stats["encoder"]["encode_dense0"]["bn"]["var"])
    assert np.abs(v - 1.0).max() > 1e-3, "BN stats look untrained"
    _involution_check(state.params, state.stats)

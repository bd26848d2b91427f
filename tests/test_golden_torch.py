"""Golden-fixture certification against plain-torch reference semantics.

tests/golden/golden_torch.npz holds activations from torch re-executions
of the reference layer graph's dense pieces (generated once by
tools/make_golden_fixtures.py; torch is NOT imported here). These pin our
op numerics to torch semantics — BN eps/momentum/unbiased-var, conv and
transposed-conv geometry, head ordering, pooling with the -1 sentinel,
clamping, log transform, weighted BCE — so the residual sgnn.pth parity
risk reduces to the sparse-conv tap order, which tools/evaluate.py
--tap_order auto certifies empirically (VERDICT r2 item 7).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from sgnn_tpu import losses as L
from sgnn_tpu.ops import bn as BN
from sgnn_tpu.ops import dense as D

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_torch.npz")


@pytest.fixture(scope="module")
def g():
    assert os.path.exists(GOLDEN), (
        "golden fixtures missing; run tools/make_golden_fixtures.py"
    )
    return np.load(GOLDEN)


def _to_cl(x):  # torch NCDHW -> channels-last NDHWC
    return np.transpose(x, (0, 2, 3, 4, 1))


def _from_cl(x):
    return np.transpose(x, (0, 4, 1, 2, 3))


def test_conv3d_k4s2p1(g):
    y = D.conv3d(
        jnp.asarray(_to_cl(g["conv_k4s2p1_x"])),
        jnp.asarray(g["conv_k4s2p1_w"]), stride=2, padding=1,
    )
    np.testing.assert_allclose(
        _from_cl(np.asarray(y)), g["conv_k4s2p1_y"], atol=2e-5, rtol=1e-5
    )


def test_conv_transpose3d_k4s2p1(g):
    y = D.conv_transpose3d(
        jnp.asarray(_to_cl(g["convt_k4s2p1_x"])),
        jnp.asarray(g["convt_k4s2p1_w"]), stride=2, padding=1,
    )
    np.testing.assert_allclose(
        _from_cl(np.asarray(y)), g["convt_k4s2p1_y"], atol=2e-5, rtol=1e-5
    )


def test_conv3d_k1_head(g):
    y = D.conv3d(
        jnp.asarray(_to_cl(g["conv_k1_x"])), jnp.asarray(g["conv_k1_w"])
    )
    np.testing.assert_allclose(
        _from_cl(np.asarray(y)), g["conv_k1_y"], atol=2e-5, rtol=1e-5
    )


def test_bn3d_train_matches_torch(g):
    params = {"scale": jnp.asarray(g["bn3d_scale"]),
              "bias": jnp.asarray(g["bn3d_bias"])}
    stats = {"mean": jnp.asarray(g["bn3d_rm0"]),
             "var": jnp.asarray(g["bn3d_rv0"])}
    y, ns = BN.batch_norm_dense(
        params, stats, jnp.asarray(_to_cl(g["bn3d_x"])), training=True
    )
    np.testing.assert_allclose(
        _from_cl(np.asarray(y)), g["bn3d_y_train"], atol=1e-5, rtol=1e-5
    )
    # running stats follow torch's momentum-0.1 unbiased-var update
    np.testing.assert_allclose(ns["mean"], g["bn3d_rm1"], atol=1e-6)
    np.testing.assert_allclose(ns["var"], g["bn3d_rv1"], atol=1e-5)


def test_bn3d_eval_matches_torch(g):
    params = {"scale": jnp.asarray(g["bn3d_scale"]),
              "bias": jnp.asarray(g["bn3d_bias"])}
    # the torch oracle ran eval after its train step, so the running
    # stats in effect are the post-update ones
    stats = {"mean": jnp.asarray(g["bn3d_rm1"]),
             "var": jnp.asarray(g["bn3d_rv1"])}
    y, _ = BN.batch_norm_dense(
        params, stats, jnp.asarray(_to_cl(g["bn3d_x"])), training=False
    )
    np.testing.assert_allclose(
        _from_cl(np.asarray(y)), g["bn3d_y_eval"], atol=1e-5, rtol=1e-5
    )


def test_row_bn_scn_eps_train(g):
    params = {"scale": jnp.asarray(g["bnrow_scale"]),
              "bias": jnp.asarray(g["bnrow_bias"])}
    stats = {"mean": jnp.asarray(g["bnrow_rm0"]),
             "var": jnp.asarray(g["bnrow_rv0"])}
    y, ns = BN.batch_norm(
        params, stats, jnp.asarray(g["bnrow_x"]),
        training=True, eps=BN.SPARSE_BN_EPS, relu=True,
    )
    assert BN.SPARSE_BN_EPS == 1e-4  # scn's default
    np.testing.assert_allclose(
        np.asarray(y), g["bnrow_y_train"], atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(ns["mean"], g["bnrow_rm1"], atol=1e-6)
    np.testing.assert_allclose(ns["var"], g["bnrow_rv1"], atol=1e-5)


def test_row_bn_scn_eps_eval(g):
    params = {"scale": jnp.asarray(g["bnrow_scale"]),
              "bias": jnp.asarray(g["bnrow_bias"])}
    stats = {"mean": jnp.asarray(g["bnrow_rm1"]),
             "var": jnp.asarray(g["bnrow_rv1"])}
    y, _ = BN.batch_norm(
        params, stats, jnp.asarray(g["bnrow_x"]),
        training=False, eps=BN.SPARSE_BN_EPS, relu=True,
    )
    np.testing.assert_allclose(
        np.asarray(y), g["bnrow_y_eval"], atol=1e-5, rtol=1e-5
    )


def test_linear_head(g):
    y = g["linear_x"] @ g["linear_w"].T + g["linear_b"]
    np.testing.assert_allclose(y, g["linear_y"], atol=1e-6)
    # and through our jnp path as the models use it
    yj = jnp.asarray(g["linear_x"]) @ jnp.asarray(g["linear_w"]).T + (
        jnp.asarray(g["linear_b"])
    )
    np.testing.assert_allclose(np.asarray(yj), g["linear_y"], atol=1e-5)


def test_maxpool_pyramid_with_unk_sentinel(g):
    x = jnp.asarray(g["maxpool_x"][:, 0])  # [B, Z, Y, X]
    y = D.max_pool3d(x)
    np.testing.assert_array_equal(np.asarray(y), g["maxpool_y"][:, 0])


def test_preprocess_sdf_clamp(g):
    y = L.preprocess_sdf(jnp.asarray(g["clamp_x"]), 3.0)
    np.testing.assert_allclose(np.asarray(y), g["clamp_y"], atol=0)


def test_apply_log_transform(g):
    y = L.apply_log_transform(jnp.asarray(g["logt_x"]))
    np.testing.assert_allclose(np.asarray(y), g["logt_y"], atol=1e-6)


def test_weighted_bce_with_logits(g):
    l = L.bce_with_logits(jnp.asarray(g["bce_logits"]),
                          jnp.asarray(g["bce_tgts"]))
    val = jnp.mean(l * jnp.asarray(g["bce_w"]))
    np.testing.assert_allclose(float(val), float(g["bce_y"]), atol=1e-6)


def test_l1_on_log_transformed(g):
    d = jnp.abs(
        L.apply_log_transform(jnp.asarray(g["l1log_p"]))
        - L.apply_log_transform(jnp.asarray(g["l1log_t"]))
    )
    np.testing.assert_allclose(
        float(jnp.mean(d)), float(g["l1log_y"]), atol=1e-6
    )

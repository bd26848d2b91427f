"""Dense conv/BN parity vs PyTorch (CPU) — the reference's dense layers."""

import numpy as np
import jax.numpy as jnp
import torch

from sgnn_tpu.ops import bn as BN
from sgnn_tpu.ops import dense as D


def test_conv3d_matches_torch(rng):
    x = rng.randn(2, 8, 8, 8, 3).astype(np.float32)
    w = rng.randn(5, 3, 4, 4, 4).astype(np.float32) * 0.2
    got = np.asarray(D.conv3d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    ref = torch.nn.functional.conv3d(xt, torch.from_numpy(w), stride=2, padding=1)
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv3d_1x1_matches_torch(rng):
    x = rng.randn(2, 4, 5, 6, 8).astype(np.float32)
    w = rng.randn(3, 8, 1, 1, 1).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    got = np.asarray(D.conv3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    ref = torch.nn.functional.conv3d(xt, torch.from_numpy(w), torch.from_numpy(b))
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose3d_matches_torch(rng):
    x = rng.randn(2, 4, 4, 4, 6).astype(np.float32)
    w = rng.randn(6, 3, 4, 4, 4).astype(np.float32) * 0.2  # [Cin, Cout, k,k,k]
    got = np.asarray(
        D.conv_transpose3d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1)
    )
    assert got.shape == (2, 8, 8, 8, 3)
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    ref = torch.nn.functional.conv_transpose3d(
        xt, torch.from_numpy(w), stride=2, padding=1
    )
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_max_pool3d_matches_torch(rng):
    x = rng.randn(2, 1, 8, 6, 4).astype(np.float32)  # [B, C... no: B,Z,Y,X] rank4
    x4 = x[:, 0]
    got = np.asarray(D.max_pool3d(jnp.asarray(x4)))
    ref = torch.nn.MaxPool3d(kernel_size=2)(torch.from_numpy(x)).numpy()[:, 0]
    np.testing.assert_allclose(got, ref)


def test_batch_norm_dense_eval_matches_torch(rng):
    x = rng.randn(2, 4, 4, 4, 5).astype(np.float32)
    params, stats = BN.init_bn(5)
    params["scale"] = jnp.asarray(rng.rand(5).astype(np.float32) + 0.5)
    params["bias"] = jnp.asarray(rng.randn(5).astype(np.float32))
    stats["mean"] = jnp.asarray(rng.randn(5).astype(np.float32))
    stats["var"] = jnp.asarray(rng.rand(5).astype(np.float32) + 0.5)
    got, _ = BN.batch_norm_dense(
        params, stats, jnp.asarray(x), training=False, relu=True
    )
    m = torch.nn.BatchNorm3d(5, eps=BN.DENSE_BN_EPS)
    m.eval()
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        m.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
        m.running_mean.copy_(torch.from_numpy(np.asarray(stats["mean"])))
        m.running_var.copy_(torch.from_numpy(np.asarray(stats["var"])))
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        ref = torch.relu(m(xt)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_batch_norm_train_moments(rng):
    """Masked sparse BN: moments over valid rows only; running stats updated."""
    x = rng.randn(20, 3).astype(np.float32)
    mask = np.zeros(20, bool)
    mask[:12] = True
    params, stats = BN.init_bn(3)
    y, new_stats = BN.batch_norm(
        params, stats, jnp.asarray(x), jnp.asarray(mask), training=True
    )
    sub = x[:12]
    mean, var = sub.mean(0), sub.var(0)
    norm = (sub - mean) / np.sqrt(var + BN.SPARSE_BN_EPS)
    np.testing.assert_allclose(np.asarray(y[:12]), norm, rtol=1e-4, atol=1e-4)
    assert (np.asarray(y[12:]) == 0).all()
    unbiased = var * 12 / 11
    np.testing.assert_allclose(
        np.asarray(new_stats["mean"]), 0.1 * mean, rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_stats["var"]), 0.9 * 1.0 + 0.1 * unbiased, rtol=1e-4
    )

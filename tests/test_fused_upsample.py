"""Fused upsample+conv == repeat-upsample then conv."""

import numpy as np
import jax.numpy as jnp

from sgnn_tpu.ops import dense as D


def _upsample2(grid):
    g = np.repeat(grid, 2, axis=1)
    g = np.repeat(g, 2, axis=2)
    return np.repeat(g, 2, axis=3)


def test_upsampled_conv_matches_reference(rng):
    B, Z, Y, X, Cin, Cout = 2, 4, 5, 6, 7, 3
    x = rng.randn(B, Z, Y, X, Cin).astype(np.float32)
    w27 = rng.randn(27, Cin, Cout).astype(np.float32) * 0.3
    got = np.asarray(D.upsampled_conv3d(jnp.asarray(x), jnp.asarray(w27)))
    assert got.shape == (B, 2 * Z, 2 * Y, 2 * X, Cout)
    # reference: NN upsample then zero-padded 3^3 conv
    up = _upsample2(x)
    w = w27.reshape(3, 3, 3, Cin, Cout)
    ref = np.zeros_like(got)
    P = 2 * np.array([Z, Y, X])
    padded = np.zeros((B, P[0] + 2, P[1] + 2, P[2] + 2, Cin), np.float32)
    padded[:, 1:-1, 1:-1, 1:-1] = up
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                ref += (
                    padded[:, dz:dz + P[0], dy:dy + P[1], dx:dx + P[2]]
                    @ w[dz, dy, dx]
                )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

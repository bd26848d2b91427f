"""Pallas fused gather-GEMM vs the XLA reference path (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from sgnn_tpu.ops import conv as CV
from sgnn_tpu.ops.pallas.gather_gemm import gather_gemm_pallas


def test_pallas_gather_gemm_matches_xla(rng):
    cap, cin, cout, K = 700, 16, 16, 27  # cap not a tile multiple
    feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    nbr = jnp.asarray(rng.randint(0, cap + 1, size=(cap, K)), jnp.int32)
    w = jnp.asarray(rng.randn(K, cin, cout).astype(np.float32) * 0.2)
    ref = CV.gather_gemm(feats, nbr, w)
    got = gather_gemm_pallas(feats, nbr, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_gather_gemm_zero_rows(rng):
    cap, cin, cout, K = 512, 8, 4, 8
    feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    nbr = jnp.zeros((cap, K), jnp.int32)  # all missing -> zeros
    w = jnp.asarray(rng.randn(K, cin, cout).astype(np.float32))
    got = gather_gemm_pallas(feats, nbr, w, interpret=True)
    assert (np.asarray(got) == 0).all()


def test_pallas_conv3d_interpret(rng):
    """Narrow-channel conv kernel: interpret-mode correctness (see the
    module docstring for TPU lowering status)."""
    import jax.experimental.pallas as pl

    import sgnn_tpu.ops.pallas.conv3d as PC
    from sgnn_tpu.ops import dense as D

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    PC.pl.pallas_call = patched
    try:
        B, Z, Y, X, C, Cout = 1, 4, 8, 16, 8, 8
        x = jnp.asarray(rng.randn(B, Z, Y, X, C).astype(np.float32))
        w = jnp.asarray(rng.randn(27, C, Cout).astype(np.float32) * 0.2)
        got = PC.conv3d_3x3x3_pallas(x, w)
        wt = jnp.transpose(w.reshape(3, 3, 3, C, Cout), (4, 3, 0, 1, 2))
        ref = D.conv3d(x, wt, padding=1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )
    finally:
        PC.pl.pallas_call = orig


def test_pallas_conv3d_folded_interpret(rng):
    """Lane-folded conv kernel (runs on real TPU; see module docstring):
    interpret-mode correctness across shapes incl. cout < cin."""
    import jax.experimental.pallas as pl

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops import dense as D

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    PC.pl.pallas_call = patched
    try:
        for (B, Z, Y, X, C, Cout) in [(1, 8, 16, 64, 16, 16),
                                      (2, 4, 8, 64, 16, 16),
                                      (1, 6, 8, 128, 16, 1)]:
            x = jnp.asarray(rng.randn(B, Z, Y, X, C).astype(np.float32))
            w = jnp.asarray(rng.randn(27, C, Cout).astype(np.float32) * 0.2)
            got = PC.conv3d_3x3x3_folded(x, w)
            wt = jnp.transpose(w.reshape(3, 3, 3, C, Cout), (4, 3, 0, 1, 2))
            ref = D.conv3d(x, wt, padding=1)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
            )
    finally:
        PC.pl.pallas_call = orig

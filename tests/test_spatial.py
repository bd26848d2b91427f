"""Spatial (z-axis) sharding: halo-exchanged convs == unsharded convs."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sgnn_tpu.ops import dense as D
from sgnn_tpu.parallel import mesh as PM
from sgnn_tpu.parallel import spatial as SP


def _mesh8():
    return PM.make_mesh(8)


def test_halo_conv3d_matches_unsharded(rng):
    mesh = _mesh8()
    B, Z, Y, X, Cin, Cout = 1, 32, 8, 8, 3, 5
    x = rng.randn(B, Z, Y, X, Cin).astype(np.float32)
    w = rng.randn(Cout, Cin, 3, 3, 3).astype(np.float32) * 0.2
    ref = np.asarray(D.conv3d(jnp.asarray(x), jnp.asarray(w), padding=1))

    def f(xl, w):
        return SP.sharded_conv3d(xl, w, "data", stride=1, padding=1)

    sharded = shard_map(
        f, mesh=mesh,
        in_specs=(P(None, "data"), P()), out_specs=P(None, "data"),
    )
    got = np.asarray(jax.jit(sharded)(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_strided_sharded_conv(rng):
    mesh = _mesh8()
    B, Z, Y, X, Cin, Cout = 1, 32, 8, 8, 4, 4
    x = rng.randn(B, Z, Y, X, Cin).astype(np.float32)
    w = rng.randn(Cout, Cin, 2, 2, 2).astype(np.float32) * 0.3
    ref = np.asarray(D.conv3d(jnp.asarray(x), jnp.asarray(w), stride=2))

    def f(xl, w):
        return SP.sharded_conv3d(xl, w, "data", stride=2, padding=0)

    sharded = shard_map(
        f, mesh=mesh,
        in_specs=(P(None, "data"), P()), out_specs=P(None, "data"),
    )
    got = np.asarray(jax.jit(sharded)(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_halo_exchange_boundaries(rng):
    mesh = _mesh8()
    x = rng.randn(1, 16, 4, 4, 2).astype(np.float32)

    def f(xl):
        return SP.halo_exchange(xl, 1, "data")

    sharded = shard_map(
        f, mesh=mesh, in_specs=P(None, "data"), out_specs=P(None, "data"),
    )
    out = np.asarray(jax.jit(sharded)(jnp.asarray(x)))
    # each device's output slab is [prev-halo | local 2 | next-halo] = 4
    out = out.reshape(1, 8, 4, 4, 4, 2)  # [B, dev, zl+2, Y, X, C]
    # device 0's lower halo is zeros (global boundary)
    assert (out[0, 0, 0] == 0).all()
    # device 7's upper halo is zeros
    assert (out[0, 7, 3] == 0).all()
    # device 3's lower halo == device 2's top plane
    np.testing.assert_array_equal(out[0, 3, 0], x[0, 2 * 3 - 1])
    np.testing.assert_array_equal(out[0, 3, 3], x[0, 2 * 4])


def test_bn_moments_sync_across_devices(rng):
    """BN batch moments psum'd over the mesh == single-device moments on
    the concatenated batch (the correctness condition for DP BatchNorm)."""
    import jax.numpy as jnp

    from sgnn_tpu.ops import bn as BN

    mesh = _mesh8()
    N, C = 64, 5
    x = rng.randn(8 * N, C).astype(np.float32)
    mask = rng.rand(8 * N) > 0.3
    params, stats = BN.init_bn(C)

    def f(xl, ml):
        y, new_stats = BN.batch_norm(
            params, stats, xl, ml, training=True, axis_name="data"
        )
        return y, new_stats

    sharded = shard_map(
        f, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P()),
    )
    y_sh, stats_sh = jax.jit(sharded)(jnp.asarray(x), jnp.asarray(mask))
    y_ref, stats_ref = BN.batch_norm(
        params, stats, jnp.asarray(x), jnp.asarray(mask), training=True
    )
    np.testing.assert_allclose(
        np.asarray(y_sh), np.asarray(y_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats_sh["mean"]), np.asarray(stats_ref["mean"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(stats_sh["var"]), np.asarray(stats_ref["var"]), rtol=1e-4
    )

"""Sparse convolution correctness vs a dense XLA-conv oracle.

The oracle identity: with inactive sites holding zero features,
  * submanifold conv == dense zero-padded conv evaluated at the active sites
  * stride-2 conv    == dense stride-2 conv evaluated at the active parents
This is the only trustworthy cross-check available (SparseConvNet itself is
not installable here); see SURVEY.md §7.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sgnn_tpu.ops import coords as C
from sgnn_tpu.ops import dense as D
from sgnn_tpu.ops import sparse as S
from sgnn_tpu.ops import conv as CV


SP = (8, 10, 12)
B = 2


def _rand_sparse(rng, n, cap, cin):
    total = B * SP[0] * SP[1] * SP[2]
    flat = rng.choice(total, size=n, replace=False)
    b, rem = flat // (SP[0] * SP[1] * SP[2]), flat % (SP[0] * SP[1] * SP[2])
    z, rem = rem // (SP[1] * SP[2]), rem % (SP[1] * SP[2])
    y, x = rem // SP[2], rem % SP[2]
    locs = np.stack([z, y, x, b], -1).astype(np.int32)
    locs = np.concatenate([locs, np.zeros((cap - n, 4), np.int32)], 0)
    feats = rng.randn(cap, cin).astype(np.float32)
    return S.make_sparse(locs, feats, n, SP, B)


def _dense_conv_oracle(st, weight_taps, offsets, stride=1):
    """Dense conv via explicit tap shifts on the full grid (numpy)."""
    dense = np.asarray(S.sparse_to_dense(st))  # [B,Z,Y,X,C]
    Z, Y, X = SP
    cout = weight_taps.shape[-1]
    if stride == 1:
        out = np.zeros((B, Z, Y, X, cout), np.float32)
        out_dims = (Z, Y, X)
    else:
        out_dims = (Z // 2, Y // 2, X // 2)
        out = np.zeros((B,) + out_dims + (cout,), np.float32)
    for k, (dz, dy, dx) in enumerate(np.asarray(offsets)):
        for z in range(out_dims[0]):
            for y in range(out_dims[1]):
                for x in range(out_dims[2]):
                    sz, sy, sx = z * stride + dz, y * stride + dy, x * stride + dx
                    if 0 <= sz < Z and 0 <= sy < Y and 0 <= sx < X:
                        out[:, z, y, x] += dense[:, sz, sy, sx] @ np.asarray(
                            weight_taps[k]
                        )
    return out


def test_submanifold_conv_matches_dense(rng):
    cin, cout = 3, 5
    st = _rand_sparse(rng, 60, 80, cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.3
    out = CV.submanifold_conv3d(st, jnp.asarray(w))
    assert out.locs.shape == st.locs.shape
    oracle = _dense_conv_oracle(st, w, C.neighbor_offsets(3))
    got = np.asarray(out.feats)
    locs = np.asarray(st.locs)
    n = int(st.num_valid)
    for i in range(n):
        z, y, x, b = locs[i]
        np.testing.assert_allclose(got[i], oracle[b, z, y, x], rtol=1e-4, atol=1e-5)
    assert (got[n:] == 0).all()


def test_submanifold_conv_empty(rng):
    st = _rand_sparse(rng, 0, 16, 3)
    w = jnp.asarray(rng.randn(27, 3, 4).astype(np.float32))
    out = CV.submanifold_conv3d(st, w)
    assert (np.asarray(out.feats) == 0).all()


def test_strided_conv_matches_dense(rng):
    cin, cout = 4, 6
    st = _rand_sparse(rng, 50, 64, cin)
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.3
    out = CV.strided_conv3d_down(st, jnp.asarray(w))
    assert out.spatial_size == (SP[0] // 2, SP[1] // 2, SP[2] // 2)
    # expected active parents
    locs = np.asarray(st.locs[: int(st.num_valid)])
    parents = set()
    for z, y, x, b in locs:
        parents.add((z // 2, y // 2, x // 2, b))
    n_out = int(out.num_valid)
    got_locs = set(map(tuple, np.asarray(out.locs[:n_out]).tolist()))
    assert got_locs == parents
    oracle = _dense_conv_oracle(st, w, C.neighbor_offsets(2), stride=2)
    got = np.asarray(out.feats)
    olocs = np.asarray(out.locs)
    for i in range(n_out):
        z, y, x, b = olocs[i]
        np.testing.assert_allclose(got[i], oracle[b, z, y, x], rtol=1e-4, atol=1e-5)


def test_unpool_roundtrip(rng):
    cin = 4
    st = _rand_sparse(rng, 50, 64, cin)
    w = jnp.asarray(rng.randn(8, cin, cin).astype(np.float32))
    coarse = CV.strided_conv3d_down(st, w)
    up = CV.unpool_x2(st.locs, st.num_valid, coarse)
    assert up.spatial_size == SP
    # every fine site gets its parent's coarse feature
    cmap = {}
    for i in range(int(coarse.num_valid)):
        cmap[tuple(np.asarray(coarse.locs[i]).tolist())] = np.asarray(coarse.feats[i])
    locs = np.asarray(st.locs)
    got = np.asarray(up.feats)
    for i in range(int(st.num_valid)):
        z, y, x, b = locs[i]
        np.testing.assert_allclose(got[i], cmap[(z // 2, y // 2, x // 2, b)], rtol=1e-5)


def test_gather_gemm_grouping_invariance(rng):
    """Tap grouping must not change results."""
    cap, cin, cout, K = 32, 7, 5, 27
    feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    nbr = jnp.asarray(rng.randint(0, cap + 1, size=(cap, K)), jnp.int32)
    w = jnp.asarray(rng.randn(K, cin, cout).astype(np.float32))
    ref = CV.gather_gemm(feats, nbr, w)
    # force single-tap groups
    table = jnp.concatenate([jnp.zeros((1, cin)), feats], 0)
    manual = sum(table[nbr[:, k]] @ w[k] for k in range(K))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(manual), rtol=1e-4, atol=1e-5)


def test_sparse_dense_roundtrip(rng):
    st = _rand_sparse(rng, 30, 40, 2)
    dense = S.sparse_to_dense(st, default_val=-7.0)
    vals = S.gather_dense(dense, st.locs)
    n = int(st.num_valid)
    np.testing.assert_allclose(
        np.asarray(vals[:n]), np.asarray(st.feats[:n]), rtol=1e-6
    )
    back = S.dense_to_sparse(dense, jnp.all(dense != -7.0, axis=-1), 40)
    assert int(back.num_valid) == n
    got = {
        tuple(l): tuple(f)
        for l, f in zip(np.asarray(back.locs[:n]).tolist(), np.asarray(back.feats[:n]).tolist())
    }
    expect = {
        tuple(l): tuple(f)
        for l, f in zip(np.asarray(st.locs[:n]).tolist(), np.asarray(st.feats[:n]).tolist())
    }
    assert got == expect


def test_conv_jit_and_grad(rng):
    """Sparse conv must be jittable and differentiable."""
    cin, cout = 3, 4
    st = _rand_sparse(rng, 40, 64, cin)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))

    @jax.jit
    def f(w, st):
        out = CV.submanifold_conv3d(st, w)
        return jnp.sum(out.feats ** 2)

    g = jax.grad(f)(w, st)
    assert g.shape == w.shape
    assert np.isfinite(np.asarray(g)).all()
    # numeric check on one element (coarse: fp32 central differences)
    eps = 1e-2
    wp = w.at[5, 1, 2].add(eps)
    wm = w.at[5, 1, 2].add(-eps)
    fd = (f(wp, st) - f(wm, st)) / (2 * eps)
    np.testing.assert_allclose(float(g[5, 1, 2]), float(fd), rtol=5e-2)

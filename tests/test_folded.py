"""Folded (lane-dense) grid ops vs dense oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgnn_tpu.ops import folded as FO
from sgnn_tpu.ops import bn as BN
from sgnn_tpu.ops import dense as D


def _rand_grid(rng, B, Z, Y, X, C, dtype=np.float32):
    return rng.randn(B, Z, Y, X, C).astype(dtype)


@pytest.mark.parametrize("shape", [(1, 4, 6, 24, 16), (2, 3, 5, 12, 2),
                                   (1, 2, 2, 20, 8), (1, 4, 4, 30, 16)])
def test_fold_unfold_roundtrip(rng, shape):
    x = _rand_grid(rng, *shape)
    fg = FO.fold(jnp.asarray(x))
    assert fg.data.shape[3] % 8 == 0
    np.testing.assert_allclose(np.asarray(FO.unfold(fg)), x)
    # halo ring and dead lanes are zero
    d = np.asarray(fg.data)
    assert (d[:, 0] == 0).all() and (d[:, -1] == 0).all()
    assert (d[:, :, 0] == 0).all() and (d[:, :, -1] == 0).all()


def test_scatter_sparse_matches_fold(rng):
    B, Z, Y, X, C = 2, 4, 6, 24, 3
    n, cap = 37, 64
    locs = np.stack([
        rng.randint(0, Z, n), rng.randint(0, Y, n),
        rng.randint(0, X, n), rng.randint(0, B, n),
    ], -1).astype(np.int32)
    locs = np.unique(locs, axis=0)
    n = len(locs)
    pad = np.full((cap - n, 4), -1, np.int32)
    locs_p = np.concatenate([locs, pad])
    feats = np.zeros((cap, C), np.float32)
    feats[:n] = rng.randn(n, C)
    fg, fm = FO.scatter_sparse(
        jnp.asarray(locs_p), jnp.asarray(feats), jnp.int32(n),
        (Z, Y, X), B, dtype=jnp.float32,
    )
    dense = np.zeros((B, Z, Y, X, C), np.float32)
    mask = np.zeros((B, Z, Y, X), bool)
    dense[locs[:, 3], locs[:, 0], locs[:, 1], locs[:, 2]] = feats[:n]
    mask[locs[:, 3], locs[:, 0], locs[:, 1], locs[:, 2]] = True
    np.testing.assert_allclose(np.asarray(FO.unfold(fg)), dense)
    ref_m = FO.fold_mask(jnp.asarray(mask), dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(fm.data), np.asarray(ref_m.data))


def test_strided_conv_folded(rng):
    B, Z, Y, X = 1, 4, 6, 20
    cin, cout = 5, 16
    x = _rand_grid(rng, B, Z, Y, X, cin)
    w8 = rng.randn(8, cin, cout).astype(np.float32) * 0.3
    fg = FO.fold(jnp.asarray(x))
    out = FO.strided_conv_folded([fg], jnp.asarray(w8), cout)
    got = np.asarray(FO.unfold(out))
    w = jnp.asarray(w8).reshape(2, 2, 2, cin, cout)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), w, window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_strided_conv_folded_groups(rng):
    B, Z, Y, X = 1, 4, 4, 16
    x1 = _rand_grid(rng, B, Z, Y, X, 16)
    x2 = _rand_grid(rng, B, Z, Y, X, 2)
    w8 = rng.randn(8, 18, 8).astype(np.float32) * 0.3
    out = FO.strided_conv_folded(
        [FO.fold(jnp.asarray(x1)), FO.fold(jnp.asarray(x2))],
        jnp.asarray(w8), 8,
    )
    cat = jnp.concatenate([jnp.asarray(x1), jnp.asarray(x2)], -1)
    ref = jax.lax.conv_general_dilated(
        cat, jnp.asarray(w8).reshape(2, 2, 2, 18, 8),
        window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(FO.unfold(out)), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_mask_down_folded(rng):
    B, Z, Y, X = 2, 4, 6, 20
    mask = rng.rand(B, Z, Y, X) > 0.6
    fm = FO.fold_mask(jnp.asarray(mask), dtype=jnp.float32)
    got = FO.unfold(FO.mask_down_folded(fm))
    ref = np.asarray(D.max_pool3d(jnp.asarray(mask.astype(np.int8)))) > 0
    np.testing.assert_array_equal(
        np.asarray(got)[..., 0] > 0.5, ref
    )
    # replicated across lanes
    g = np.asarray(got)
    assert (g == g[..., :1]).all()


def test_upsample2_folded(rng):
    B, Z, Y, X, C = 1, 3, 4, 12, 16
    x = _rand_grid(rng, B, Z, Y, X, C)
    got = FO.unfold(FO.upsample2_folded(FO.fold(jnp.asarray(x))))
    ref = np.repeat(np.repeat(np.repeat(x, 2, 1), 2, 2), 2, 3)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_linear_folded(rng):
    B, Z, Y, X, C = 1, 2, 3, 20, 16
    x = _rand_grid(rng, B, Z, Y, X, C)
    W = rng.randn(C, 2).astype(np.float32) * 0.3
    b = rng.randn(2).astype(np.float32)
    out = FO.linear_folded(FO.fold(jnp.asarray(x)), jnp.asarray(W),
                           jnp.asarray(b))
    got = np.asarray(FO.unfold(out))
    ref = x @ W + b
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_occ_mask_folded(rng):
    B, Z, Y, X = 1, 2, 3, 20
    out = _rand_grid(rng, B, Z, Y, X, 2)
    fg = FO.fold(jnp.asarray(out))
    m = FO.occ_mask_folded(fg, dtype=jnp.float32)
    got = np.asarray(FO.unfold(m))
    ref = (out[..., 0] > 0)
    np.testing.assert_array_equal(got[..., 0] > 0.5, ref)
    assert (got == got[..., :1]).all()


def test_bn_folded(rng):
    B, Z, Y, X, C = 2, 3, 4, 20, 12
    x = _rand_grid(rng, B, Z, Y, X, C)
    mask = rng.rand(B, Z, Y, X) > 0.4
    xm = x * mask[..., None]
    params = {"scale": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5),
              "bias": jnp.asarray(rng.randn(C).astype(np.float32))}
    stats = {"mean": jnp.asarray(rng.randn(C).astype(np.float32)),
             "var": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)}
    fg = FO.fold(jnp.asarray(xm))
    fm = FO.fold_mask(jnp.asarray(mask), dtype=jnp.float32)
    for training in (False, True):
        got_fg, ns = FO.bn_folded(params, stats, fg, fm, training=training)
        ref, ns_ref = BN.batch_norm(
            params, stats, jnp.asarray(xm).reshape(-1, C),
            jnp.asarray(mask).reshape(-1), training=training, relu=True,
            eps=1e-4,
        )
        got = np.asarray(FO.unfold(got_fg))
        np.testing.assert_allclose(
            got, np.asarray(ref).reshape(B, Z, Y, X, C),
            rtol=1e-4, atol=1e-4, err_msg=f"training={training}",
        )
        if training:
            np.testing.assert_allclose(
                np.asarray(ns["mean"]), np.asarray(ns_ref["mean"]),
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(ns["var"]), np.asarray(ns_ref["var"]),
                rtol=1e-4, atol=1e-5,
            )


def test_subm_conv_folded_interpret(rng):
    """Grouped folded conv (Pallas, interpret mode) vs the XLA conv."""
    import jax.experimental.pallas as pl

    import sgnn_tpu.ops.pallas.conv3d_folded as PC

    orig = pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        B, Z, Y, X = 1, 4, 4, 16
        x1 = _rand_grid(rng, B, Z, Y, X, 16)
        x2 = _rand_grid(rng, B, Z, Y, X, 2)
        mask = rng.rand(B, Z, Y, X) > 0.3
        w27 = rng.randn(27, 18, 16).astype(np.float32) * 0.2
        fgs = [FO.fold(jnp.asarray(x1 * mask[..., None])),
               FO.fold(jnp.asarray(x2 * mask[..., None]))]
        fm = FO.fold_mask(jnp.asarray(mask), dtype=jnp.float32)
        out = FO.subm_conv_folded(fgs, fm, jnp.asarray(w27), 16)
        got = np.asarray(FO.unfold(out))
        cat = jnp.asarray(
            np.concatenate([x1, x2], -1) * mask[..., None]
        )
        ref = jax.lax.conv_general_dilated(
            cat, jnp.asarray(w27).reshape(3, 3, 3, 18, 16),
            window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) * jnp.asarray(mask[..., None].astype(np.float32))
        np.testing.assert_allclose(
            got, np.asarray(ref), rtol=1e-4, atol=1e-4
        )
    finally:
        PC.pl.pallas_call = orig


def test_fused_conv_folded_interpret(rng):
    """Fused conv site kernel (v3: multi-group + BN affine + mask + halo'd
    output) vs the composed XLA reference, interpret mode."""
    import jax
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops import folded as FO

    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        B, Z, Y, X = 1, 8, 16, 16
        cpad = 16
        widths = (16, 8)
        G = len(widths)
        mask_dense = rng.rand(B, Z, Y, X) > 0.4
        fm = FO.fold_mask(jnp.asarray(mask_dense), cpad, jnp.float32)
        xs, ws, affines, dens = [], [], [], []
        for c in widths:
            d = (rng.randn(B, Z, Y, X, c) * mask_dense[..., None]).astype(
                np.float32
            )
            dens.append(d)
            xs.append(FO.fold(jnp.asarray(d), cpad))
            ws.append(jnp.asarray(rng.randn(27, c, 12).astype(np.float32) * 0.2))
            a = np.zeros(cpad, np.float32)
            b = np.zeros(cpad, np.float32)
            a[:c] = rng.rand(c) + 0.5
            b[:c] = rng.randn(c) * 0.1
            affines.append((
                jnp.asarray(np.tile(a, FO.LANES // cpad)),
                jnp.asarray(np.tile(b, FO.LANES // cpad)),
            ))

        for use_affine in (False, True):
            out = PC.fused_conv_folded(
                [x.data for x in xs], fm.data, ws, cpad,
                affines=affines if use_affine else None, relu=True,
            )
            fg_out = FO.FGrid(out, (Z, Y, X), 12, cpad)
            got = np.asarray(FO.unfold(fg_out))
            # reference: per-group (affine+relu+mask) -> conv -> sum -> mask
            acc = None
            for d, w, (av, bv) in zip(dens, ws, affines):
                c = d.shape[-1]
                t = d
                if use_affine:
                    t = np.maximum(
                        d * np.asarray(av)[None, None, None, None, :c]
                        + np.asarray(bv)[None, None, None, None, :c], 0.0
                    ) * mask_dense[..., None]
                wk = np.asarray(w).reshape(3, 3, 3, c, 12)
                ref = jax.lax.conv_general_dilated(
                    jnp.asarray(t), jnp.asarray(wk),
                    window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
                acc = ref if acc is None else acc + ref
            ref = np.asarray(acc) * mask_dense[..., None]
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
            # halo ring written zero
            assert (np.asarray(out)[:, 0] == 0).all()
            assert (np.asarray(out)[:, -1] == 0).all()
            assert (np.asarray(out)[:, :, 0] == 0).all()
            assert (np.asarray(out)[:, :, -1] == 0).all()
    finally:
        PC.pl.pallas_call = orig


def test_fused_upconv_folded_interpret(rng):
    """Fused upsample->conv kernel vs composed reference: BN affine ->
    2x NN upsample -> 3^3 conv -> fine mask, interpret mode."""
    import jax
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops import folded as FO

    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        B, Zc, Yc, Xc = 1, 4, 8, 16
        Zf, Yf, Xf = 2 * Zc, 2 * Yc, 2 * Xc
        cpad = 16
        widths = (16, 8)
        cmask_dense = rng.rand(B, Zc, Yc, Xc) > 0.4
        fmask_dense = np.repeat(np.repeat(np.repeat(
            cmask_dense, 2, 1), 2, 2), 2, 3)
        # make the fine mask differ from the pure upsample in places
        fmask_dense = fmask_dense & (rng.rand(B, Zf, Yf, Xf) > 0.1)
        cfm = FO.fold_mask(jnp.asarray(cmask_dense), cpad, jnp.float32)
        ffm = FO.fold_mask(jnp.asarray(fmask_dense), cpad, jnp.float32)
        xs, ws, affines, dens = [], [], [], []
        for c in widths:
            d = (rng.randn(B, Zc, Yc, Xc, c) * cmask_dense[..., None]
                 ).astype(np.float32)
            dens.append(d)
            xs.append(FO.fold(jnp.asarray(d), cpad))
            ws.append(jnp.asarray(
                rng.randn(27, c, 12).astype(np.float32) * 0.2))
            a = np.zeros(cpad, np.float32)
            b = np.zeros(cpad, np.float32)
            a[:c] = rng.rand(c) + 0.5
            b[:c] = rng.randn(c) * 0.1
            affines.append((
                jnp.asarray(np.tile(a, FO.LANES // cpad)),
                jnp.asarray(np.tile(b, FO.LANES // cpad)),
            ))

        for use_affine in (False, True):
            out = PC.fused_upconv_folded(
                [x.data for x in xs], cfm.data, ffm.data, ws, cpad,
                affines=affines if use_affine else None, relu=True,
            )
            got = np.asarray(FO.unfold(FO.FGrid(out, (Zf, Yf, Xf), 12, cpad)))
            acc = None
            for d, w, (av, bv) in zip(dens, ws, affines):
                c = d.shape[-1]
                t = d
                if use_affine:
                    t = np.maximum(
                        d * np.asarray(av)[None, None, None, None, :c]
                        + np.asarray(bv)[None, None, None, None, :c], 0.0
                    ) * cmask_dense[..., None]
                tu = np.repeat(np.repeat(np.repeat(t, 2, 1), 2, 2), 2, 3)
                wk = np.asarray(w).reshape(3, 3, 3, c, 12)
                ref = jax.lax.conv_general_dilated(
                    jnp.asarray(tu), jnp.asarray(wk),
                    window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
                acc = ref if acc is None else acc + ref
            ref = np.asarray(acc) * fmask_dense[..., None]
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
            for ax, idx in ((1, 0), (1, -1), (2, 0), (2, -1)):
                assert (np.take(np.asarray(out), idx, ax) == 0).all()
    finally:
        PC.pl.pallas_call = orig


def test_fused_downconv_folded_interpret(rng):
    """Fused strided-down kernel vs composed reference: BN affine ->
    stride-2 conv -> coarse mask, interpret mode."""
    import jax
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops import folded as FO

    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        B, Z, Y, X = 1, 8, 16, 16
        cpad = 16
        c, cout = 16, 12
        mask_dense = rng.rand(B, Z, Y, X) > 0.4
        fm = FO.fold_mask(jnp.asarray(mask_dense), cpad, jnp.float32)
        d = (rng.randn(B, Z, Y, X, c) * mask_dense[..., None]).astype(
            np.float32)
        fg = FO.fold(jnp.asarray(d), cpad)
        w8 = jnp.asarray(rng.randn(8, c, cout).astype(np.float32) * 0.3)
        a = np.zeros(cpad, np.float32)
        bv = np.zeros(cpad, np.float32)
        a[:c] = rng.rand(c) + 0.5
        bv[:c] = rng.randn(c) * 0.1
        bn_p = {"scale": jnp.asarray(a[:c]), "bias": jnp.asarray(bv[:c])}
        bn_s = {"mean": jnp.zeros(c), "var": jnp.ones(c) - 1e-4}
        for use_bn in (False, True):
            got_fg, got_fm = FO.downconv_fused(
                fg, fm, w8, cout,
                bn_params=bn_p if use_bn else None,
                bn_stats=bn_s if use_bn else None,
            )
            got = np.asarray(FO.unfold(got_fg))
            got_m = np.asarray(FO.unfold(got_fm))[..., 0] > 0.5
            t = d
            if use_bn:  # var 1-eps + eps = 1, mean 0 -> scale*x + bias
                t = np.maximum(d * a[:c] + bv[:c], 0.0) * mask_dense[..., None]
            wk = np.asarray(w8).reshape(2, 2, 2, c, cout)
            ref = jax.lax.conv_general_dilated(
                jnp.asarray(t), jnp.asarray(wk), window_strides=(2, 2, 2),
                padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            ref_m = mask_dense.reshape(B, Z // 2, 2, Y // 2, 2, X // 2, 2
                                       ).max((2, 4, 6)) > 0
            ref = np.asarray(ref) * ref_m[..., None]
            np.testing.assert_allclose(got, ref[..., :cout], rtol=1e-4,
                                       atol=1e-4)
            np.testing.assert_array_equal(got_m, ref_m)
    finally:
        PC.pl.pallas_call = orig


def test_fused_head_folded_interpret(rng):
    """Fused head-site kernel vs composed reference: n2-BN -> heads ->
    occupancy gate -> masked outputs; and the surface (grouped, no gate)
    variant."""
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops import folded as FO

    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        B, Z, Y, X = 1, 8, 16, 16
        cpad, c = 16, 10
        mask_dense = rng.rand(B, Z, Y, X) > 0.45
        fm = FO.fold_mask(jnp.asarray(mask_dense), cpad, jnp.float32)
        d = (rng.randn(B, Z, Y, X, c) * mask_dense[..., None]).astype(
            np.float32)
        up = FO.fold(jnp.asarray(d), cpad)
        bn_p = {"scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
                "bias": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)}
        bn_s = {"mean": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
                "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)}
        w2 = jnp.asarray(rng.randn(c, 2).astype(np.float32))
        b2 = jnp.asarray(rng.randn(2).astype(np.float32))

        upm, o2m, fmn, o2f = FO.head_site_fused(up, fm, bn_p, bn_s, w2, b2)

        # emit_raw=False: identical gated outputs, raw grid skipped
        upm2, o2m2, fmn2, o2f2 = FO.head_site_fused(
            up, fm, bn_p, bn_s, w2, b2, emit_raw=False
        )
        assert o2f2 is None
        for a, b in ((upm2, upm), (o2m2, o2m), (fmn2, fmn)):
            np.testing.assert_allclose(
                np.asarray(a.data), np.asarray(b.data), rtol=1e-6, atol=1e-6
            )

        # composed reference (the SGNN_NO_HEADK path)
        ub = FO.bn_folded({"scale": bn_p["scale"], "bias": bn_p["bias"]},
                          bn_s, up, fm, training=False)[0]
        out2 = FO.linear_folded(ub, w2, b2)
        nf = FO.occ_mask_folded(out2, dtype=jnp.float32)
        nf = nf.with_data(nf.data * fm.data)
        np.testing.assert_allclose(
            np.asarray(FO.unfold(fmn)), np.asarray(FO.unfold(nf)),
            atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(FO.unfold(o2f)), np.asarray(FO.unfold(out2)),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(FO.unfold(upm)),
            np.asarray(FO.unfold(ub)) * np.asarray(FO.unfold(nf))[..., :1]
            .repeat(c, -1)[..., :c],
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(FO.unfold(o2m)),
            (np.asarray(FO.unfold(out2))
             * np.asarray(FO.unfold(nf))[..., :2]).astype(np.float32),
            rtol=1e-2, atol=1e-2,
        )
        # halo rings of the three halo'd outputs are zero
        for g in (upm, o2m, fmn):
            arr = np.asarray(g.data)
            for ax in (1, 2):
                for idx in (0, arr.shape[ax] - 1):
                    assert (np.take(arr, idx, ax) == 0).all()

        # ---- surface variant: grouped, ungated
        cs = [6, 4]
        groups, Ws = [], []
        Wfull = rng.randn(sum(cs), 1).astype(np.float32)
        bn_pg = {"scale": jnp.asarray(
                     rng.rand(sum(cs)).astype(np.float32) + 0.5),
                 "bias": jnp.asarray(
                     rng.randn(sum(cs)).astype(np.float32) * 0.1)}
        bn_sg = {"mean": jnp.asarray(
                     rng.randn(sum(cs)).astype(np.float32) * 0.1),
                 "var": jnp.asarray(
                     rng.rand(sum(cs)).astype(np.float32) + 0.5)}
        off = 0
        for ci in cs:
            di = (rng.randn(B, Z, Y, X, ci)
                  * mask_dense[..., None]).astype(np.float32)
            groups.append(FO.fold(jnp.asarray(di), cpad))
            off += ci
        surf = FO.surf_head_fused(groups, fm, bn_pg, bn_sg,
                                  jnp.asarray(Wfull), jnp.zeros(1) + 0.3)
        # composed
        acc = None
        off = 0
        for g, ci in zip(groups, cs):
            p = {k: bn_pg[k][off:off + ci] for k in ("scale", "bias")}
            s = {k: bn_sg[k][off:off + ci] for k in ("mean", "var")}
            gb = FO.bn_folded(p, s, g, fm, training=False)[0]
            o = FO.linear_folded(gb, jnp.asarray(Wfull[off:off + ci]), None)
            acc = o if acc is None else acc.with_data(acc.data + o.data)
            off += ci
        ref = np.asarray(FO.unfold(acc))[..., 0] + 0.3
        np.testing.assert_allclose(
            np.asarray(FO.unfold(surf))[..., 0], ref, rtol=1e-4, atol=1e-4,
        )
    finally:
        PC.pl.pallas_call = orig


def test_conv_folded_train_vjp(rng):
    """conv_folded_train custom VJP vs conv_folded_xla autodiff: loss,
    dW exact, dx exact on the interior (ring cotangents are dropped by
    every producer's zero-pad, so they may differ)."""
    import jax
    import jax.numpy as jnp

    from sgnn_tpu.ops import folded as FO

    B, Z, Y, X, c, cout = 1, 8, 8, 16, 10, 12
    cpad = 16
    mask = rng.rand(B, Z, Y, X) > 0.4
    fm = FO.fold_mask(jnp.asarray(mask), cpad, jnp.float32)
    d = (rng.randn(B, Z, Y, X, c) * mask[..., None]).astype(np.float32)
    fg = FO.fold(jnp.asarray(d), cpad)
    w = jnp.asarray(rng.randn(27, c, cout).astype(np.float32) * 0.2)
    cotf = FO.fold(
        jnp.asarray(rng.randn(B, Z, Y, X, cout).astype(np.float32)), cpad
    )

    def loss(conv, w, xd):
        out = conv([FO.FGrid(xd, fg.dims, c, cpad)], fm, w, cout)
        return jnp.sum(out.data * cotf.data)

    l1, (gw1, gx1) = jax.value_and_grad(
        lambda w, x: loss(FO.subm_conv_folded_xla, w, x), argnums=(0, 1)
    )(w, fg.data)
    l2, (gw2, gx2) = jax.value_and_grad(
        lambda w, x: loss(FO.subm_conv_folded_train, w, x), argnums=(0, 1)
    )(w, fg.data)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gx2)[:, 1:-1, 1:-1], np.asarray(gx1)[:, 1:-1, 1:-1],
        rtol=1e-4, atol=1e-4,
    )


def test_fused_conv_int8_interpret(rng):
    """int8 quantized conv site vs the exact path: small relative error
    (dynamic per-tile activation scales, per-column weight scales)."""
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops import folded as FO

    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        B, Z, Y, X = 1, 8, 16, 16
        cpad, c, cout = 16, 16, 16
        mask_dense = rng.rand(B, Z, Y, X) > 0.4
        fm = FO.fold_mask(jnp.asarray(mask_dense), cpad, jnp.float32)
        d = (rng.randn(B, Z, Y, X, c) * mask_dense[..., None]).astype(
            np.float32)
        fg = FO.fold(jnp.asarray(d), cpad)
        w = jnp.asarray(rng.randn(27, c, cout).astype(np.float32) * 0.2)
        exact = np.asarray(FO.unfold(
            FO.subm_conv_fused([fg], fm, w, cout)))
        q = np.asarray(FO.unfold(
            FO.subm_conv_fused([fg], fm, w, cout, quantize=True)))
        scale = np.abs(exact).max()
        rel = np.abs(q - exact).max() / scale
        assert rel < 0.02, rel  # int8 rounding: ~1% of dynamic range
        # and well-correlated
        cc = np.corrcoef(exact.ravel(), q.ravel())[0, 1]
        assert cc > 0.999
    finally:
        PC.pl.pallas_call = orig


def test_fused_downconv_int8_interpret(rng):
    """int8 quantized downconv vs the exact fused path: small relative
    error; the coarse mask must be bit-identical (mask GEMM stays exact)."""
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops import folded as FO

    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        B, Z, Y, X = 1, 8, 16, 16
        cpad, c, cout = 16, 16, 12
        mask_dense = rng.rand(B, Z, Y, X) > 0.4
        fm = FO.fold_mask(jnp.asarray(mask_dense), cpad, jnp.float32)
        d = (rng.randn(B, Z, Y, X, c) * mask_dense[..., None]).astype(
            np.float32)
        fg = FO.fold(jnp.asarray(d), cpad)
        w8 = jnp.asarray(rng.randn(8, c, cout).astype(np.float32) * 0.3)
        bn_p = {"scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
                "bias": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)}
        bn_s = {"mean": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
                "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)}
        for cpad_out in (None, 2 * cpad):
            ex_g, ex_m = FO.downconv_fused(
                fg, fm, w8, cout, bn_params=bn_p, bn_stats=bn_s,
                cpad_out=cpad_out,
            )
            q_g, q_m = FO.downconv_fused(
                fg, fm, w8, cout, bn_params=bn_p, bn_stats=bn_s,
                cpad_out=cpad_out, quantize=True,
            )
            exact = np.asarray(FO.unfold(ex_g))
            q = np.asarray(FO.unfold(q_g))
            assert np.abs(exact).max() > 0
            scale = np.abs(exact).max()
            rel = np.abs(q - exact).max() / scale
            assert rel < 0.02, (rel, cpad_out)
            cc = np.corrcoef(exact.ravel(), q.ravel())[0, 1]
            assert cc > 0.999, (cc, cpad_out)
            np.testing.assert_array_equal(
                np.asarray(ex_m.data), np.asarray(q_m.data)
            )
    finally:
        PC.pl.pallas_call = orig


def test_scatter_slots_folded_interpret(rng):
    """Binned Pallas scatter == XLA scatter-set on the same rows, sorted
    and unsorted, including rows straddling plane boundaries and dropped
    out-of-range rows."""
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.scatter_folded as SF

    orig = SF.pl.pallas_call
    SF.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        nplanes, S = 6, 2 * 128
        total = nplanes * S
        cap, n = 512, 391
        flat = rng.choice(total, n, replace=False).astype(np.int32)
        vals = rng.randn(cap).astype(np.float32)
        base = np.full(cap, -(1 << 30), np.int32)
        base[:n] = flat
        ref = np.zeros(total, np.float32)
        ref[flat] = vals[:n]

        got = np.asarray(SF.scatter_slots_folded(
            jnp.asarray(base), jnp.asarray(vals), nplanes, S,
        ))
        np.testing.assert_allclose(got, ref, atol=0)

        # presorted path: ascending valid rows, padding at the tail
        order = np.argsort(flat)
        base_s = np.full(cap, -(1 << 30), np.int32)
        base_s[:n] = flat[order]
        vals_s = np.zeros(cap, np.float32)
        vals_s[:n] = vals[:n][order]
        got_s = np.asarray(SF.scatter_slots_folded(
            jnp.asarray(base_s), jnp.asarray(vals_s), nplanes, S,
            presorted=True,
        ))
        np.testing.assert_allclose(got_s, ref, atol=0)
    finally:
        SF.pl.pallas_call = orig


def test_scatter_sparse_kernel_path_matches(rng, monkeypatch):
    """scatter_sparse with the Pallas kernel forced on (interpret mode)
    equals the XLA scatter path bit-for-bit."""
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.scatter_folded as SF
    from sgnn_tpu.ops import folded as FO

    B, Z, Y, X, cpad = 2, 4, 6, 32, 16
    n, cap = 80, 128
    locs = np.stack([
        rng.randint(0, Z, n), rng.randint(0, Y, n),
        rng.randint(0, X, n), rng.randint(0, B, n),
    ], -1).astype(np.int32)
    locs = np.unique(locs, axis=0)
    n = len(locs)
    locs_p = np.concatenate([locs, np.full((cap - n, 4), -1, np.int32)])
    feats = np.zeros((cap, 1), np.float32)
    feats[:n, 0] = rng.randn(n) * 2.5
    args = (jnp.asarray(locs_p), jnp.asarray(feats), jnp.int32(n),
            (Z, Y, X), B)
    ref_g, ref_m = FO.scatter_sparse(*args, cpad=cpad, dtype=jnp.float32,
                                     feat_bound=3.0)

    orig = SF.pl.pallas_call
    SF.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    monkeypatch.setattr(
        "jax.default_backend", lambda: "tpu"
    )
    try:
        got_g, got_m = FO.scatter_sparse(
            *args, cpad=cpad, dtype=jnp.float32, feat_bound=3.0,
        )
    finally:
        SF.pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(got_g.data),
                                  np.asarray(ref_g.data))
    np.testing.assert_array_equal(np.asarray(got_m.data),
                                  np.asarray(ref_m.data))


def test_surf_head_packed_interpret(rng):
    """Multi-scale packed surface head == composed path (upsample2 per
    scale step -> surf_head_fused -> unfold), bitwise, including the
    mask output and coarse tail-pad block handling."""
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops import folded as FO

    B, Z, Y, X = 1, 32, 32, 64
    cpad, nf = 16, 4
    scales = (1, 2, 4)
    groups = []
    for s in scales:
        d = rng.randn(B, Z // s, Y // s, X // s, nf).astype(np.float32)
        groups.append(FO.fold(jnp.asarray(d), cpad))
    mask = rng.rand(B, Z, Y, X) < 0.3
    fm = FO.fold_mask(jnp.asarray(mask), cpad, jnp.float32)

    C = nf * len(scales)
    bn_params = {
        "scale": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(C).astype(np.float32)),
    }
    bn_stats = {
        "mean": jnp.asarray(rng.randn(C).astype(np.float32)),
        "var": jnp.asarray(rng.rand(C).astype(np.float32) + 0.2),
    }
    W = jnp.asarray(rng.randn(C, 1).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.randn(1).astype(np.float32))

    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        # composed reference: materialize the upsampled groups
        mats = []
        for g, s in zip(groups, scales):
            m = g
            while s > 1:
                m = FO.upsample2_folded(m)
                s //= 2
            mats.append(m)
        ref_fg = FO.surf_head_fused(mats, fm, bn_params, bn_stats, W, bias)
        ref_sdf = np.asarray(FO.unfold(ref_fg))[..., 0]
        ref_mask = np.asarray(FO.unfold(fm))[..., 0] > 0.5

        got_sdf, got_mask = FO.surf_head_packed(
            list(zip(groups, scales)), fm, bn_params, bn_stats, W, bias
        )
    finally:
        PC.pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(got_mask), ref_mask)
    np.testing.assert_array_equal(np.asarray(got_sdf), ref_sdf)
    assert ref_mask.any()


def test_upconv_inregister_mask_interpret(rng):
    """upconv_fused(ffm=None) (fine mask expanded in-register from the
    coarse mask) == upconv_fused with the materialized fine mask."""
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops import folded as FO

    B, Zc, Yc, Xc = 1, 8, 16, 24
    cpad, nf, cout = 16, 4, 6
    groups = []
    for _ in range(2):
        d = rng.randn(B, Zc, Yc, Xc, nf).astype(np.float32)
        groups.append(FO.fold(jnp.asarray(d), cpad))
    cm = FO.fold_mask(
        jnp.asarray(rng.rand(B, Zc, Yc, Xc) < 0.4), cpad, jnp.float32
    )
    w27 = jnp.asarray(rng.randn(27, 2 * nf, cout).astype(np.float32) * 0.2)
    bn_p = {
        "scale": jnp.asarray(rng.rand(2 * nf).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(2 * nf).astype(np.float32)),
    }
    bn_s = {
        "mean": jnp.asarray(rng.randn(2 * nf).astype(np.float32)),
        "var": jnp.asarray(rng.rand(2 * nf).astype(np.float32) + 0.2),
    }

    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        ffm = FO.upsample2_folded(cm)
        ref = FO.upconv_fused(groups, cm, ffm, w27, cout,
                              bn_params=bn_p, bn_stats=bn_s)
        got = FO.upconv_fused(groups, cm, None, w27, cout,
                              bn_params=bn_p, bn_stats=bn_s)
    finally:
        PC.pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(ref.data))
    assert float(np.abs(np.asarray(ref.data)).max()) > 0


def test_head_site_coarse_mask_interpret(rng):
    """head_site_fused(fm_scale=2) (coarse mask expanded in-register) ==
    fm_scale=1 with the materialized upsampled mask, all four outputs."""
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    from sgnn_tpu.ops import folded as FO

    B, Zc, Yc, Xc = 1, 8, 8, 16
    cpad, nf = 16, 6
    cm = FO.fold_mask(
        jnp.asarray(rng.rand(B, Zc, Yc, Xc) < 0.5), cpad, jnp.float32
    )
    up = FO.fold(
        jnp.asarray(
            rng.randn(B, 2 * Zc, 2 * Yc, 2 * Xc, nf).astype(np.float32)
        ),
        cpad,
    )
    bn_p = {
        "scale": jnp.asarray(rng.rand(nf).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(nf).astype(np.float32)),
    }
    bn_s = {
        "mean": jnp.asarray(rng.randn(nf).astype(np.float32)),
        "var": jnp.asarray(rng.rand(nf).astype(np.float32) + 0.2),
    }
    W2 = jnp.asarray(rng.randn(nf, 2).astype(np.float32) * 0.5)
    b2 = jnp.asarray(rng.randn(2).astype(np.float32))

    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        fmu = FO.upsample2_folded(cm)
        refs = FO.head_site_fused(up, fmu, bn_p, bn_s, W2, b2,
                                  dtype=jnp.float32, emit_raw=False)
        gots = FO.head_site_fused(up, cm, bn_p, bn_s, W2, b2,
                                  dtype=jnp.float32, emit_raw=False,
                                  fm_scale=2)
    finally:
        PC.pl.pallas_call = orig
    for got, ref in zip(gots[:3], refs[:3]):
        np.testing.assert_array_equal(np.asarray(got.data),
                                      np.asarray(ref.data))
    assert float(np.abs(np.asarray(refs[2].data)).max()) > 0


@pytest.mark.parametrize("cpad_in,X", [(8, 32), (16, 24), (8, 48)])
def test_repack_cpad(rng, cpad_in, X):
    """reshape-based repack == the _repack_matrix lane-GEMM formulation,
    and unfold(repack(fold(x))) == x."""
    C = cpad_in - 2
    x = _rand_grid(rng, 1, 3, 4, X, C)
    fg = FO.fold(jnp.asarray(x), cpad=cpad_in)
    out = FO.repack_cpad(fg, 2 * cpad_in)
    assert out.cpad == 2 * cpad_in and out.real_c == C
    assert out.data.shape[3] == FO._xq_for(X, 2 * cpad_in)
    np.testing.assert_array_equal(np.asarray(FO.unfold(out)), x)

    # pin against the lane-GEMM formulation the reshape path replaced
    M = jnp.asarray(FO._repack_matrix(cpad_in, 2 * cpad_in),
                    fg.data.dtype)
    ref = jax.lax.dot_general(
        fg.data, M, dimension_numbers=(((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(fg.data.dtype)
    ref = FO._unpairs(ref)
    xq_out = FO._xq_for(X, 2 * cpad_in)
    if ref.shape[3] > xq_out:
        ref = ref[:, :, :, :xq_out]
    elif ref.shape[3] < xq_out:
        ref = jnp.pad(
            ref, ((0, 0),) * 3 + ((0, xq_out - ref.shape[3]), (0, 0))
        )
    np.testing.assert_array_equal(np.asarray(out.data), np.asarray(ref))

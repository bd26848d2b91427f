"""Compiled-Mosaic vs interpret-mode parity for every folded Pallas
kernel family, runnable on the attached TPU chip.

The CPU test suite exercises these kernels in interpret mode only (the
Mosaic compiler needs a TPU); this suite certifies that the COMPILED
kernels agree with interpret mode on identical inputs — the durable
answer to "compiled-vs-interpret equivalence rests on ad-hoc session
scripts". Families covered (ops/pallas/conv3d_folded.py):

  1. conv-site   fused_conv_folded          (f32 + int8)
  2. upconv      fused_upconv_folded        (f32 + int8)
  3. downconv    FO.downconv_fused          (f32, BN affine)
  4. head        FO.head_site_fused / surf_head_fused
  5. train conv  conv3d_3x3x3_folded fwd + custom-VJP grads
plus a whole-model folded forward (bf16 and int8) that runs the
production composition end to end.

Run on the chip (minutes, mostly compile):
  SGNN_TESTS_TPU=1 python -m pytest tests/test_tpu_parity.py -m tpu -q

Off-TPU the suite skips (compiled == interpret is vacuous there).
"""

import contextlib
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sgnn_tpu.ops.pallas.conv3d_folded as PC
from sgnn_tpu.ops import folded as FO

pytestmark = pytest.mark.tpu

if jax.default_backend() != "tpu":  # pragma: no cover
    pytest.skip(
        "TPU parity suite needs the attached chip "
        "(SGNN_TESTS_TPU=1, TPU backend)",
        allow_module_level=True,
    )


@contextlib.contextmanager
def _interpret_mode():
    orig = PC.pl.pallas_call
    PC.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        yield
    finally:
        PC.pl.pallas_call = orig


def _both(fn):
    """Run fn twice — compiled Mosaic, then interpret mode — and return
    both results as numpy pytrees. fn must be a fresh closure (no jit
    cache shared between the two calls)."""
    compiled = jax.tree.map(np.asarray, fn())
    with _interpret_mode():
        interp = jax.tree.map(np.asarray, fn())
    return compiled, interp


def _assert_close(a, b, rtol, atol, msg=""):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            x, y, rtol=rtol, atol=atol, err_msg=msg
        ),
        a, b,
    )


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _masked_grid(rng, B, Z, Y, X, c, mask):
    return (rng.randn(B, Z, Y, X, c) * mask[..., None]).astype(np.float32)


def _affine(rng, c, cpad):
    a = np.zeros(cpad, np.float32)
    b = np.zeros(cpad, np.float32)
    a[:c] = rng.rand(c) + 0.5
    b[:c] = rng.randn(c) * 0.1
    return (
        jnp.asarray(np.tile(a, FO.LANES // cpad)),
        jnp.asarray(np.tile(b, FO.LANES // cpad)),
    )


@pytest.mark.parametrize("quantize", [False, True])
def test_conv_site_parity(rng, quantize):
    B, Z, Y, X, cpad = 1, 8, 16, 32, 16
    widths = (16, 8)
    mask = rng.rand(B, Z, Y, X) > 0.4
    fm = FO.fold_mask(jnp.asarray(mask), cpad, jnp.float32)
    xs = [FO.fold(jnp.asarray(_masked_grid(rng, B, Z, Y, X, c, mask)), cpad)
          for c in widths]
    ws = [jnp.asarray(rng.randn(27, c, 12).astype(np.float32) * 0.2)
          for c in widths]
    affines = [_affine(rng, c, cpad) for c in widths]

    def run():
        return PC.fused_conv_folded(
            [x.data for x in xs], fm.data, ws, cpad,
            affines=affines, relu=True, quantize=quantize,
        )

    got, ref = _both(run)
    tol = 5e-2 if quantize else 1e-5
    _assert_close(got, ref, tol, tol, f"conv-site quantize={quantize}")
    assert np.abs(got).max() > 0, "degenerate fixture: all-zero output"


@pytest.mark.parametrize("quantize", [False, True])
def test_upconv_parity(rng, quantize):
    B, Zc, Yc, Xc, cpad = 1, 4, 8, 16, 16
    widths = (16, 8)
    cmask = rng.rand(B, Zc, Yc, Xc) > 0.4
    fmask = np.repeat(np.repeat(np.repeat(cmask, 2, 1), 2, 2), 2, 3)
    fmask = fmask & (rng.rand(*fmask.shape) > 0.1)
    cfm = FO.fold_mask(jnp.asarray(cmask), cpad, jnp.float32)
    ffm = FO.fold_mask(jnp.asarray(fmask), cpad, jnp.float32)
    xs = [FO.fold(jnp.asarray(_masked_grid(rng, B, Zc, Yc, Xc, c, cmask)),
                  cpad) for c in widths]
    ws = [jnp.asarray(rng.randn(27, c, 12).astype(np.float32) * 0.2)
          for c in widths]
    affines = [_affine(rng, c, cpad) for c in widths]

    def run():
        return PC.fused_upconv_folded(
            [x.data for x in xs], cfm.data, ffm.data, ws, cpad,
            affines=affines, relu=True, quantize=quantize,
        )

    got, ref = _both(run)
    tol = 5e-2 if quantize else 1e-5
    _assert_close(got, ref, tol, tol, f"upconv quantize={quantize}")
    assert np.abs(got).max() > 0


@pytest.mark.parametrize("quantize", [False, True])
def test_downconv_parity(rng, quantize):
    B, Z, Y, X, cpad = 1, 8, 16, 32, 16
    c, cout = 16, 12
    mask = rng.rand(B, Z, Y, X) > 0.4
    fm = FO.fold_mask(jnp.asarray(mask), cpad, jnp.float32)
    fg = FO.fold(jnp.asarray(_masked_grid(rng, B, Z, Y, X, c, mask)), cpad)
    w8 = jnp.asarray(rng.randn(8, c, cout).astype(np.float32) * 0.3)
    bn_p = {"scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)}
    bn_s = {"mean": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
            "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)}

    def run():
        g, m = FO.downconv_fused(fg, fm, w8, cout,
                                 bn_params=bn_p, bn_stats=bn_s,
                                 quantize=quantize)
        return g.data, m.data

    got, ref = _both(run)
    tol = 5e-2 if quantize else 1e-5
    _assert_close(got, ref, tol, tol, f"downconv quantize={quantize}")
    assert np.abs(got[0]).max() > 0


def test_head_site_parity(rng):
    B, Z, Y, X, cpad, c = 1, 8, 16, 32, 16, 10
    mask = rng.rand(B, Z, Y, X) > 0.45
    fm = FO.fold_mask(jnp.asarray(mask), cpad, jnp.float32)
    up = FO.fold(jnp.asarray(_masked_grid(rng, B, Z, Y, X, c, mask)), cpad)
    bn_p = {"scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)}
    bn_s = {"mean": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
            "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)}
    w2 = jnp.asarray(rng.randn(c, 2).astype(np.float32))
    b2 = jnp.asarray(rng.randn(2).astype(np.float32))

    def run():
        upm, o2m, fmn, o2f = FO.head_site_fused(up, fm, bn_p, bn_s, w2, b2)
        # the raw f32 grid's halo ring is unspecified by contract (it is
        # only ever unfolded, which slices the interior) — compare interior
        return upm.data, o2m.data, fmn.data, o2f.data[:, 1:-1, 1:-1]

    got, ref = _both(run)
    _assert_close(got, ref, 1e-5, 1e-5, "head-site")
    assert np.abs(got[3]).max() > 0


def test_surf_head_parity(rng):
    B, Z, Y, X, cpad = 1, 8, 16, 32, 16
    cs = (6, 4)
    mask = rng.rand(B, Z, Y, X) > 0.45
    fm = FO.fold_mask(jnp.asarray(mask), cpad, jnp.float32)
    groups = [FO.fold(jnp.asarray(_masked_grid(rng, B, Z, Y, X, c, mask)),
                      cpad) for c in cs]
    tot = sum(cs)
    bn_p = {"scale": jnp.asarray(rng.rand(tot).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(tot).astype(np.float32) * 0.1)}
    bn_s = {"mean": jnp.asarray(rng.randn(tot).astype(np.float32) * 0.1),
            "var": jnp.asarray(rng.rand(tot).astype(np.float32) + 0.5)}
    W = jnp.asarray(rng.randn(tot, 1).astype(np.float32))
    b = jnp.asarray(rng.randn(1).astype(np.float32))

    def run():
        # raw f32 output: halo ring unspecified (see head-site test)
        return FO.surf_head_fused(
            groups, fm, bn_p, bn_s, W, b
        ).data[:, 1:-1, 1:-1]

    got, ref = _both(run)
    _assert_close(got, ref, 1e-5, 1e-5, "surf-head")
    assert np.abs(got).max() > 0


def test_train_conv_vjp_parity(rng):
    """The training conv (custom VJP: Pallas fwd + Pallas dx) — value and
    gradients must agree compiled vs interpret."""
    B, Z, Y, X, c, cout, cpad = 1, 8, 8, 32, 10, 12, 16
    mask = rng.rand(B, Z, Y, X) > 0.4
    fm = FO.fold_mask(jnp.asarray(mask), cpad, jnp.float32)
    d = _masked_grid(rng, B, Z, Y, X, c, mask)
    fg = FO.fold(jnp.asarray(d), cpad)
    w = jnp.asarray(rng.randn(27, c, cout).astype(np.float32) * 0.2)
    cotf = FO.fold(
        jnp.asarray(rng.randn(B, Z, Y, X, cout).astype(np.float32)), cpad
    )

    def run():
        def loss(xd, ww):
            out = FO.subm_conv_folded_train(
                [FO.FGrid(xd, fg.dims, c, cpad)], fm, ww, cout
            )
            return jnp.sum(out.data * cotf.data.astype(out.data.dtype))

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        v, (dx, dw) = f(fg.data, w)
        return v, dx, dw

    got, ref = _both(run)
    _assert_close(got, ref, 1e-4, 1e-4, "train-conv vjp")
    assert float(np.abs(got[2]).max()) > 0


@pytest.mark.parametrize("presorted", [False, True])
def test_scatter_parity(rng, presorted):
    """Binned input scatter: compiled Mosaic == interpret, exact."""
    import sgnn_tpu.ops.pallas.scatter_folded as SF

    nplanes, S = 34, 6 * 128
    total = nplanes * S
    cap, n = 4096, 2931
    flat = np.sort(rng.choice(total, n, replace=False)).astype(np.int32)
    if not presorted:
        flat = flat[rng.permutation(n)]
    base = np.full(cap, -(1 << 30), np.int32)
    base[:n] = flat
    vals = np.zeros(cap, np.float32)
    vals[:n] = rng.randn(n)

    def run():
        return SF.scatter_slots_folded(
            jnp.asarray(base), jnp.asarray(vals), nplanes, S,
            presorted=presorted,
        )

    got, ref = _both(run)
    np.testing.assert_array_equal(got, ref)
    ref_np = np.zeros(total, np.float32)
    ref_np[flat] = vals[:n]
    np.testing.assert_allclose(got, ref_np, atol=0)


@pytest.mark.parametrize("int8", [False, True])
def test_whole_model_parity(int8):
    """Production folded forward end to end (all kernel families wired
    together), compiled vs interpret, bf16 and int8."""
    import dataclasses

    import test_folded_model as TFM
    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.models import folded_flow as FF
    from sgnn_tpu.models import sgnn as M

    cfg = SGNNConfig(
        encoder_dim=8, input_dim=(32, 32, 64), nf_coarse=16, nf=16,
        num_hierarchy_levels=3, batch_size=1, execution="folded",
        compute_dtype="bfloat16", occupancy_fractions=(1.0, 0.5, 0.3),
        use_pallas_conv=True,
    )
    if int8:
        cfg = dataclasses.replace(cfg, quantize_int8=True)
    params, stats = M.genmodel_init(jax.random.PRNGKey(1), cfg)
    st = TFM._surface_inputs(cfg)

    def run():
        fwd = jax.jit(lambda p, s: FF.genmodel_apply_folded(
            p, s, cfg, st, num_refine_active=cfg.num_refine_levels,
            do_surf=True,
        ))
        out = fwd(params, stats)
        return (out.coarse_out.astype(jnp.float32),
                [o.astype(jnp.float32) for o in out.refine_outs],
                out.surf_mask,
                out.surf_sdf.astype(jnp.float32))

    got, ref = _both(run)
    # bf16 accumulation order differs compiled-vs-interpret; bound the
    # deviation rather than demand bit equality
    tol = 0.1 if int8 else 0.05
    _assert_close(got[:2], ref[:2], tol, tol, f"model outs int8={int8}")
    m_got, m_ref = got[2], ref[2]
    agree = (m_got == m_ref).mean()
    assert agree > 0.999, f"surf masks diverge: {agree:.4f}"
    assert m_got.sum() > 0, "degenerate: empty surface"
    both = m_got & m_ref
    np.testing.assert_allclose(got[3][both], ref[3][both],
                               rtol=tol, atol=tol)


def test_surf_head_ms_parity(rng=None):
    """Multi-scale surface head: compiled == interpret, exact."""
    rng = np.random.RandomState(11)
    B, Z, Y, X = 1, 32, 64, 64
    cpad, nf = 16, 4
    scales = (1, 2, 4)
    groups = [
        FO.fold(jnp.asarray(
            rng.randn(B, Z // s, Y // s, X // s, nf).astype(np.float32)
        ), cpad)
        for s in scales
    ]
    fm = FO.fold_mask(
        jnp.asarray(rng.rand(B, Z, Y, X) < 0.3), cpad, jnp.float32
    )
    C = nf * len(scales)
    bn_p = {"scale": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(C).astype(np.float32))}
    bn_s = {"mean": jnp.asarray(rng.randn(C).astype(np.float32)),
            "var": jnp.asarray(rng.rand(C).astype(np.float32) + 0.2)}
    W = jnp.asarray(rng.randn(C, 1).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.randn(1).astype(np.float32))

    def run():
        sdf, mask = FO.surf_head_packed(
            list(zip(groups, scales)), fm, bn_p, bn_s, W, bias
        )
        return sdf, mask

    (got_sdf, got_m), (ref_sdf, ref_m) = _both(run)
    np.testing.assert_array_equal(got_m, ref_m)
    np.testing.assert_array_equal(got_sdf, ref_sdf)
    assert ref_m.any()


def test_upconv_inregister_mask_parity():
    """upconv with the fine mask expanded in-register: compiled ==
    interpret, exact."""
    rng = np.random.RandomState(12)
    B, Zc, Yc, Xc = 1, 16, 32, 32
    cpad, nf, cout = 16, 4, 6
    groups = [
        FO.fold(jnp.asarray(
            rng.randn(B, Zc, Yc, Xc, nf).astype(np.float32)
        ), cpad)
        for _ in range(2)
    ]
    cm = FO.fold_mask(
        jnp.asarray(rng.rand(B, Zc, Yc, Xc) < 0.4), cpad, jnp.float32
    )
    w27 = jnp.asarray(rng.randn(27, 2 * nf, cout).astype(np.float32) * 0.2)
    bn_p = {"scale": jnp.asarray(rng.rand(2 * nf).astype(np.float32) + .5),
            "bias": jnp.asarray(rng.randn(2 * nf).astype(np.float32))}
    bn_s = {"mean": jnp.asarray(rng.randn(2 * nf).astype(np.float32)),
            "var": jnp.asarray(rng.rand(2 * nf).astype(np.float32) + 0.2)}

    def run():
        return FO.upconv_fused(groups, cm, None, w27, cout,
                               bn_params=bn_p, bn_stats=bn_s).data

    got, ref = _both(run)
    np.testing.assert_array_equal(got, ref)
    assert float(np.abs(ref).max()) > 0


def test_head_site_coarse_mask_parity():
    """head site with fm_scale=2 (coarse mask expanded in-register):
    compiled == interpret, exact, all three outputs."""
    rng = np.random.RandomState(13)
    B, Zc, Yc, Xc = 1, 16, 16, 32
    cpad, nf = 16, 6
    cm = FO.fold_mask(
        jnp.asarray(rng.rand(B, Zc, Yc, Xc) < 0.5), cpad, jnp.float32
    )
    up = FO.fold(jnp.asarray(
        rng.randn(B, 2 * Zc, 2 * Yc, 2 * Xc, nf).astype(np.float32)
    ), cpad)
    bn_p = {"scale": jnp.asarray(rng.rand(nf).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(nf).astype(np.float32))}
    bn_s = {"mean": jnp.asarray(rng.randn(nf).astype(np.float32)),
            "var": jnp.asarray(rng.rand(nf).astype(np.float32) + 0.2)}
    W2 = jnp.asarray(rng.randn(nf, 2).astype(np.float32) * 0.5)
    b2 = jnp.asarray(rng.randn(2).astype(np.float32))

    def run():
        outs = FO.head_site_fused(up, cm, bn_p, bn_s, W2, b2,
                                  dtype=jnp.float32, emit_raw=False,
                                  fm_scale=2)
        return tuple(o.data for o in outs[:3])

    got, ref = _both(run)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g, r)
    assert float(np.abs(ref[2]).max()) > 0


def test_int8_mesh_chamfer():
    """Task-level int8 acceptance: the MESH a user gets from the int8
    serving mode (cfg.quantize_int8, the 48 scenes/sec path) stays within
    a fraction of a voxel (chamfer) of the bf16 mesh — ties the kernel-
    level int8 approximation to the save_predictions output contract
    (/root/reference/torch/data_util.py:250-284).

    By default runs on random init; point SGNN_TRAINED_CKPT at a
    tools/train.py checkpoint (default architecture) to assert the same
    bound on TRAINED weights — their BN stats and wider activation
    ranges are the production int8 case."""
    import dataclasses

    from scipy.spatial import cKDTree

    import test_folded_model as TFM
    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.meshing.marching_cubes import run_marching_cubes
    from sgnn_tpu.models import folded_flow as FF
    from sgnn_tpu.models import sgnn as M

    cfg = SGNNConfig(
        encoder_dim=8, input_dim=(64, 96, 96), nf_coarse=16, nf=16,
        num_hierarchy_levels=4, batch_size=1, execution="folded",
        compute_dtype="bfloat16", occupancy_fractions=(1.0, 0.5, 0.3, 0.15),
        use_pallas_conv=True,
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(3), cfg)
    ckpt = os.environ.get("SGNN_TRAINED_CKPT", "")
    if ckpt:
        from sgnn_tpu.train.checkpoint import load_checkpoint
        from sgnn_tpu.train.state import create_train_state

        state, _ = load_checkpoint(
            ckpt, create_train_state(params, stats)
        )
        params, stats = state.params, state.stats
        print(f"int8 chamfer on trained ckpt: {ckpt}")
    st = TFM._surface_inputs(cfg)

    def mesh(quant):
        c = dataclasses.replace(cfg, quantize_int8=quant)
        fwd = jax.jit(lambda p, s: FF.genmodel_apply_folded(
            p, s, c, st, num_refine_active=c.num_refine_levels,
            do_surf=True,
        ))
        out = fwd(params, stats)
        mask = np.asarray(out.surf_mask[0])
        sdf = np.asarray(out.surf_sdf[0], np.float32)
        assert mask.sum() > 1000, "degenerate surface"
        dense = np.where(mask, sdf, -np.inf)
        verts, _, faces = run_marching_cubes(
            dense, None, 0.0, cfg.truncation - 0.1, 10.0
        )
        assert len(verts) > 1000 and len(faces) > 0
        return verts

    v_bf16 = mesh(False)
    v_int8 = mesh(True)
    d_ab = cKDTree(v_int8).query(v_bf16, workers=-1)[0]
    d_ba = cKDTree(v_bf16).query(v_int8, workers=-1)[0]
    chamfer = 0.5 * (d_ab.mean() + d_ba.mean())
    p95 = max(np.percentile(d_ab, 95), np.percentile(d_ba, 95))
    print(f"int8 mesh chamfer={chamfer:.4f} voxels, p95={p95:.4f}")
    # 2 cm voxels: mean < 0.15 voxel (3 mm), p95 < 1 voxel (2 cm)
    assert chamfer < 0.15, f"int8 mesh drifted: chamfer {chamfer:.4f} vox"
    assert p95 < 1.0, f"int8 mesh tail drifted: p95 {p95:.4f} vox"

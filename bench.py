#!/usr/bin/env python
"""Benchmark: whole-scene SG-NN completion throughput on one TPU chip.

Workload: the BASELINE.json headline config — fully-convolutional scene
completion (4 hierarchy levels + surface SDF prediction) on a synthetic
mp-rooms-sized volume (96x192x192 voxels @ 2cm ~ a 1.9m x 3.8m x 3.8m
room, ~68k active input voxels), matching test_scene.py's per-scene
forward. On TPU this runs the FOLDED lane-dense execution
(models/folded_flow.py + the fused Pallas kernel family) in bf16 — the
fastest of the four execution modes (see BENCH_NOTES.md for the measured
comparison; override with SGNN_BENCH_EXEC / SGNN_BENCH_DTYPE /
SGNN_BENCH_INT8). The forward is the only-surface serving configuration
(want_level_outputs=False): per-level raw head grids are not
materialized, matching what the reference's test_scene.py keeps per
scene (test_scene.py:96-100 exports inputs + surface SDF only).

Timing method: the execution tunnel on this host reports async dispatch
times (block_until_ready does not block on remote completion), so naive
wall-clocking lies. Instead K forwards are CHAINED inside one jitted
lax.fori_loop whose final scalar is fetched to host — fetching forces the
whole chain — and two K values are differenced to cancel the fixed
fetch/tunnel overhead. The loop bound is a traced argument so one compile
serves all K.

vs_baseline: the CPU inference path the reference supports
(test_scene.py --cpu). Proxy: this same model jitted on the host CPU in
its fastest configuration (sparse/gather f32, all cores) measures
0.0355 scenes/sec (28.2 s/scene) on this machine; override with
SGNN_BENCH_CPU_BASELINE.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

SCENE_DIM = (96, 192, 192)
FRACTIONS = (1.0, 0.4, 0.2, 0.1)
CPU_BASELINE_SCENES_PER_SEC = float(
    os.environ.get("SGNN_BENCH_CPU_BASELINE", 0.0355)
)


def _parity_canaries():
    """Max |compiled - interpret| of ONE tiny instance of EVERY fused
    Pallas kernel family (conv-site, downconv, upconv, head-site,
    multi-scale surf head, binned scatter). Cheap (~seconds/family) and
    catches Mosaic compiler/lowering regressions in the driver loop
    itself, per family, instead of as a silently wrong bench number."""
    import jax
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC
    import sgnn_tpu.ops.pallas.scatter_folded as SF
    from sgnn_tpu.ops import folded as FO

    r = np.random.RandomState(7)
    B, Z, Y, X, cpad = 1, 8, 16, 32, 16
    widths = (16, 8)
    mask = r.rand(B, Z, Y, X) > 0.4
    fm = FO.fold_mask(jnp.asarray(mask), cpad, jnp.float32)

    def grid(c, zyx=(Z, Y, X), m=mask):
        z, y, x = zyx
        return jnp.asarray(
            (r.randn(B, z, y, x, c) * m[..., None]).astype(np.float32)
        )

    def bnp(c):
        return (
            {"scale": jnp.asarray(r.rand(c).astype(np.float32) + 0.5),
             "bias": jnp.asarray(r.randn(c).astype(np.float32) * 0.1)},
            {"mean": jnp.asarray(r.randn(c).astype(np.float32) * 0.1),
             "var": jnp.asarray(r.rand(c).astype(np.float32) + 0.5)},
        )

    xs = [FO.fold(grid(c), cpad) for c in widths]
    ws = [jnp.asarray(r.randn(27, c, 12).astype(np.float32) * 0.2)
          for c in widths]

    fams = {}
    fams["conv_site"] = lambda: PC.fused_conv_folded(
        [x.data for x in xs], fm.data, ws, cpad, relu=True
    )

    cw, cout = 16, 12
    fg16 = FO.fold(grid(cw), cpad)
    w8 = jnp.asarray(r.randn(8, cw, cout).astype(np.float32) * 0.3)
    dbn_p, dbn_s = bnp(cw)
    fams["downconv"] = lambda: (
        lambda gm: (gm[0].data, gm[1].data)
    )(FO.downconv_fused(fg16, fm, w8, cout, bn_params=dbn_p, bn_stats=dbn_s))

    cmask = r.rand(B, Z // 2, Y // 2, X // 2) > 0.4
    cfm = FO.fold_mask(jnp.asarray(cmask), cpad, jnp.float32)
    fmask = np.repeat(np.repeat(np.repeat(cmask, 2, 1), 2, 2), 2, 3)
    ffm = FO.fold_mask(jnp.asarray(fmask), cpad, jnp.float32)
    uxs = [FO.fold(grid(c, (Z // 2, Y // 2, X // 2), cmask), cpad)
           for c in widths]
    fams["upconv"] = lambda: PC.fused_upconv_folded(
        [x.data for x in uxs], cfm.data, ffm.data, ws, cpad, relu=True
    )

    hc = 10
    hup = FO.fold(grid(hc), cpad)
    hbn_p, hbn_s = bnp(hc)
    hw2 = jnp.asarray(r.randn(hc, 2).astype(np.float32))
    hb2 = jnp.asarray(r.randn(2).astype(np.float32))
    fams["head_site"] = lambda: (
        # raw f32 grid's halo ring is unspecified by contract: interior
        lambda t: (t[0].data, t[1].data, t[2].data, t[3].data[:, 1:-1, 1:-1])
    )(FO.head_site_fused(hup, fm, hbn_p, hbn_s, hw2, hb2))

    nf, scales = 4, (1, 2, 4)
    Zm, Ym, Xm = 16, 32, 32
    msgroups = [
        FO.fold(jnp.asarray(
            r.randn(B, Zm // s, Ym // s, Xm // s, nf).astype(np.float32)
        ), cpad)
        for s in scales
    ]
    msfm = FO.fold_mask(
        jnp.asarray(r.rand(B, Zm, Ym, Xm) < 0.3), cpad, jnp.float32
    )
    C = nf * len(scales)
    mbn_p, mbn_s = bnp(C)
    mW = jnp.asarray(r.randn(C, 1).astype(np.float32) * 0.3)
    mb = jnp.asarray(r.randn(1).astype(np.float32))
    fams["surf_head_ms"] = lambda: FO.surf_head_packed(
        list(zip(msgroups, scales)), msfm, mbn_p, mbn_s, mW, mb
    )

    nplanes, S = 10, 2 * 128
    cap, n = 1024, 700
    flat = np.sort(
        r.choice(nplanes * S, n, replace=False)
    ).astype(np.int32)
    sbase = np.full(cap, -(1 << 30), np.int32)
    sbase[:n] = flat
    svals = np.zeros(cap, np.float32)
    svals[:n] = r.randn(n)
    fams["scatter"] = lambda: SF.scatter_slots_folded(
        jnp.asarray(sbase), jnp.asarray(svals), nplanes, S, presorted=True
    )

    orig = PC.pl.pallas_call
    results = {}
    for name, run in fams.items():
        compiled = jax.tree.map(np.asarray, run())
        PC.pl.pallas_call = (
            lambda *a, **k: orig(*a, **{**k, "interpret": True})
        )
        try:
            interp = jax.tree.map(np.asarray, run())
        finally:
            PC.pl.pallas_call = orig
        errs = jax.tree.map(
            lambda a, b: float(
                np.abs(np.asarray(a, np.float32)
                       - np.asarray(b, np.float32)).max()
            ),
            compiled, interp,
        )
        results[name] = max(jax.tree.leaves(errs))
    return results


def main():
    if os.environ.get("SGNN_BENCH_ON_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    # persistent compile cache: the model graph takes minutes to compile on
    # TPU; cached executables make repeat benchmark runs near-instant
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.models import dense_flow as DF
    from sgnn_tpu.models import sgnn as M
    from sgnn_tpu.ops.sparse import make_sparse
    from __graft_entry__ import _synthetic_sparse_input

    execution = os.environ.get("SGNN_BENCH_EXEC", "dense_flow")
    dtype = os.environ.get("SGNN_BENCH_DTYPE", "bfloat16")
    # the lane-folded Pallas conv needs the Mosaic compiler (TPU only)
    use_pallas = jax.default_backend() == "tpu" and not os.environ.get(
        "SGNN_BENCH_NO_PALLAS"
    )
    cfg = SGNNConfig(
        input_dim=SCENE_DIM, batch_size=1, num_hierarchy_levels=4,
        occupancy_fractions=FRACTIONS, execution=execution,
        compute_dtype=dtype, use_pallas_conv=use_pallas,
        quantize_int8=bool(os.environ.get("SGNN_BENCH_INT8")),
        # _synthetic_sparse_input emits np.nonzero C-order rows, so the
        # binned input scatter skips its device sort
        input_presorted=True,
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    locs, feats, num = _synthetic_sparse_input(cfg)
    jl, jf, jn = jnp.asarray(locs), jnp.asarray(feats), jnp.asarray(num)

    prep = None
    if cfg.execution == "dense_flow" and use_pallas:
        # folded lane-dense execution: the TPU inference fast path
        from sgnn_tpu.models import folded_flow as FF

        # production serving shape: per-site weight prep hoisted out of
        # the forward (prepare once, pass as jit inputs)
        prep = FF.prepare_folded_weights(
            params, stats, cfg,
            num_refine_active=cfg.num_refine_levels, do_surf=True,
            want_level_outputs=False,
        )

        def fwd(params, stats, st, prep):
            out = FF.genmodel_apply_folded(
                params, stats, cfg, st,
                num_refine_active=cfg.num_refine_levels, do_surf=True,
                # only-surface serving: the chain consumes surf + coarse
                # only, and Pallas outputs are opaque to XLA DCE
                want_level_outputs=False,
                prep=prep,
            )
            return jnp.sum(
                jnp.where(out.surf_mask, out.surf_sdf, 0.0)
            ) + jnp.mean(out.coarse_out)
    elif cfg.execution == "dense_flow":
        def fwd(params, stats, st, prep):
            del prep
            out, _ = DF.genmodel_apply_dense(
                params, stats, cfg, st,
                num_refine_active=cfg.num_refine_levels, do_surf=True,
                training=False,
            )
            return jnp.sum(
                jnp.where(out.surf_mask, out.surf_sdf, 0.0)
            ) + jnp.mean(out.coarse_out)
    else:
        def fwd(params, stats, st, prep):
            del prep
            out, _ = M.genmodel_apply(
                params, stats, cfg, st,
                num_refine_active=cfg.num_refine_levels, do_surf=True,
                training=False,
            )
            return jnp.sum(out.surf_sdf) + jnp.mean(out.coarse_out)

    @jax.jit
    def chain(params, stats, prep, locs, feats, num_valid, k):
        def body(i, carry):
            f, acc = carry
            st = make_sparse(locs, f, num_valid, cfg.input_dim, 1)
            s = fwd(params, stats, st, prep)
            # feed a perturbation forward so iteration i+1 depends on i
            return (f * (1.0 + 1e-6 * jnp.tanh(s)), acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (feats, jnp.float32(0.0)))
        return acc

    def run(k):
        t0 = time.time()
        v = float(chain(params, stats, prep, jl, jf, jn, jnp.int32(k)))
        return time.time() - t0, v

    def run_retrying(k, attempts=3):
        # the remote TPU worker occasionally crashes and recovers within
        # ~1-2 min; retry instead of failing the whole benchmark
        for a in range(attempts):
            try:
                return run(k)
            except Exception as e:  # jax.errors.JaxRuntimeError etc.
                if a == attempts - 1:
                    raise
                print(f"retrying after device error: {e}", file=sys.stderr)
                time.sleep(90)

    # Mosaic parity canaries (driver-loop coverage for the opt-in TPU
    # parity suite, tests/test_tpu_parity.py): one tiny instance of EVERY
    # fused kernel family, compiled Mosaic vs interpret mode. A Mosaic/
    # lowering regression shows up as a nonzero/NaN entry in the
    # "parity_canary_families" field (and "parity_canary" = the max)
    # instead of silently skewing the throughput number.
    parity_canary = None
    parity_families = None
    parity_canary_error = None
    if use_pallas:
        try:
            parity_families = _parity_canaries()
            parity_canary = max(parity_families.values())
        except Exception as e:  # pragma: no cover - diagnostic path
            parity_canary_error = f"{type(e).__name__}: {e}"
        print(f"parity canaries: {parity_families}"
              f" {parity_canary_error or ''}", file=sys.stderr)

    print("compiling + warmup...", file=sys.stderr)
    t_compile, _ = run_retrying(1)
    print(f"compile+first: {t_compile:.1f}s", file=sys.stderr)
    k1 = int(os.environ.get("SGNN_BENCH_K1", 2))
    k2 = int(os.environ.get("SGNN_BENCH_K2", 22))
    t1, _ = run_retrying(k1)
    t2, _ = run_retrying(k2)
    print(f"t(k={k1})={t1:.3f}s t(k={k2})={t2:.3f}s", file=sys.stderr)
    per_scene = (t2 - t1) / (k2 - k1)
    if per_scene <= 0:
        # timing noise swamped the difference; report a lower bound
        per_scene = t2 / k2
    scenes_per_sec = 1.0 / per_scene
    result = {
        "metric": "whole-scene completion fwd, 96x192x192@2cm, "
                  "L=4+surface, scenes/sec/chip",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / CPU_BASELINE_SCENES_PER_SEC, 2),
    }
    if parity_canary is not None:
        result["parity_canary"] = parity_canary
    if parity_families is not None:
        result["parity_canary_families"] = parity_families
    if parity_canary_error is not None:
        result["parity_canary_error"] = parity_canary_error
    print(json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""End-to-end scene->mesh benchmark: forward + device fetch + marching
cubes + vertex weld + PLY on disk, pipelined.

This measures what the reference's test_scene.py actually does per scene
(/root/reference/torch/test_scene.py:59-103: model forward, padding crop,
save_predictions -> marching_cubes.cpp:459-478), not just the forward.
Scenes are synthetic spheres at the BASELINE headline dims (96x192x192 @
2cm, ~mp-rooms size) with per-scene jittered geometry so every scene
fetches and meshes a distinct surface.

Usage: python tools/bench_e2e.py [--scenes 12] [--serial]
Prints one JSON line {"e2e_scenes_per_sec": ..., ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

SCENE_DIM = (96, 192, 192)
FRACTIONS = (1.0, 0.4, 0.2, 0.1)


def synthetic_scene(dims, seed):
    """Sphere-shell TSDF scan with per-seed center/radius jitter."""
    rng = np.random.RandomState(seed)
    Z, Y, X = dims
    zz, yy, xx = np.meshgrid(
        np.arange(Z), np.arange(Y), np.arange(X), indexing="ij"
    )
    r = min(Z, Y, X) * (0.30 + 0.08 * rng.rand())
    cz = Z * (0.45 + 0.1 * rng.rand())
    cy = Y * (0.45 + 0.1 * rng.rand())
    cx = X * (0.45 + 0.1 * rng.rand())
    d = np.sqrt((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) - r
    sel = np.abs(d) < 3.0
    z, y, x = np.nonzero(sel)
    keep = rng.rand(len(z)) < 0.8  # partial scan
    z, y, x = z[keep], y[keep], x[keep]
    return {
        "name": f"synth{seed:03d}__cmp",
        "input_locs": np.stack([z, y, x], -1).astype(np.int32),
        "input_sdf": d[z, y, x].astype(np.float32),
        # only .shape is consumed by dispatch; no dense target needed
        "sdf": np.broadcast_to(np.float32(0), dims),
        "world2grid": np.eye(4, dtype=np.float32),
        "orig_dims": np.array(dims, np.int64),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=12)
    ap.add_argument("--serial", action="store_true",
                    help="no dispatch/mesh overlap (the naive loop)")
    ap.add_argument("--no_compact", action="store_true",
                    help="fetch full dense output grids (pre-round-3)")
    ap.add_argument("--execution", default="folded")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--keep_output", default="")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.infer import SceneInferencer
    from sgnn_tpu.models.sgnn import genmodel_init

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ))
    from test_scene import run_pipeline

    use_pallas = jax.default_backend() == "tpu"
    cfg = SGNNConfig(
        input_dim=SCENE_DIM, batch_size=1, num_hierarchy_levels=4,
        occupancy_fractions=FRACTIONS, execution=args.execution,
        compute_dtype=args.compute_dtype, use_pallas_conv=use_pallas,
        quantize_int8=args.int8,
    )
    params, stats = genmodel_init(jax.random.PRNGKey(0), cfg)
    scenes = [synthetic_scene(SCENE_DIM, s) for s in range(args.scenes)]
    out_dir = args.keep_output or tempfile.mkdtemp(prefix="bench_e2e_")

    inf = SceneInferencer(
        cfg, params, stats, compact=not args.no_compact, want_levels=False
    )

    # warmup / compile on scene 0 (one padded shape -> one executable)
    t0 = time.perf_counter()
    r = inf(scenes[0])
    compile_s = time.perf_counter() - t0
    surf_n = len(r["surf_locs"])
    assert surf_n > 0, "degenerate warmup: no surface voxels"

    t0 = time.perf_counter()
    if args.serial:
        n_ok = 0
        from sgnn_tpu.meshing.export import save_predictions

        for s in scenes:
            res = inf(s)
            save_predictions(
                out_dir, res["name"], res["input_locs"], res["input_sdf"],
                tuple(int(d) for d in res["orig_dims"]),
                pred_surf=(res["surf_locs"], res["surf_sdf"]),
                truncation=3.0,
            )
            n_ok += 1
    else:
        stats_out = run_pipeline(inf, scenes, out_dir, 3.0)
        n_ok = stats_out["num_meshed"]
    wall = time.perf_counter() - t0

    meshes = [f for f in os.listdir(out_dir) if f.endswith("pred-mesh.ply")]
    mesh_bytes = sum(
        os.path.getsize(os.path.join(out_dir, f)) for f in meshes
    )
    assert len(meshes) == args.scenes, (len(meshes), args.scenes)
    print(json.dumps({
        "e2e_scenes_per_sec": round(n_ok / wall, 2),
        "mean_scene_ms": round(wall / n_ok * 1e3, 1),
        "scenes": n_ok,
        "surf_voxels_scene0": surf_n,
        "pred_mesh_files": len(meshes),
        "pred_mesh_mb": round(mesh_bytes / 1e6, 2),
        "compile_plus_first_s": round(compile_s, 1),
        "mode": ("serial" if args.serial else "pipelined")
        + ("+dense_fetch" if args.no_compact else "+compact_fetch"),
    }))
    if not args.keep_output:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

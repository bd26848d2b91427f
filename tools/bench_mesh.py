#!/usr/bin/env python
"""Host meshing throughput: save_predictions (sparse->dense scatter +
marching cubes + vertex weld + binary PLY x2 meshes) per scene vs worker
count, at the headline scene dims — no TPU needed.

This isolates the host half of the scene->mesh pipeline
(tools/test_scene.py:run_pipeline's mesh_one) so the --mesh_workers
setting can be sized to the host and the PCIe projection in BENCH_NOTES
rests on measured numbers (the reference's per-scene export is
data_util.py:250-284 -> marching_cubes.cpp:459-478).

Usage: env JAX_PLATFORMS=cpu python tools/bench_mesh.py \
          [--scenes 8] [--workers 1 2 4]
Prints one JSON line per worker count.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--dims", type=int, nargs=3, default=[96, 192, 192])
    args = ap.parse_args()

    from bench_e2e import synthetic_scene
    from sgnn_tpu.meshing.export import save_predictions

    dims = tuple(args.dims)
    # surf = the scan shell itself (same density class as a real pred)
    results = []
    for s in range(args.scenes):
        sc = synthetic_scene(dims, s)
        results.append({
            "name": sc["name"],
            "input_locs": sc["input_locs"],
            "input_sdf": sc["input_sdf"],
            "orig_dims": np.array(dims, np.int64),
            "surf_locs": sc["input_locs"],
            "surf_sdf": sc["input_sdf"] * 0.5,
        })

    def mesh_one(out_dir, r):
        save_predictions(
            out_dir, r["name"], r["input_locs"], r["input_sdf"],
            tuple(int(d) for d in r["orig_dims"]),
            target_for_sdf=None, target_for_occs=None,
            pred_surf=(r["surf_locs"], r["surf_sdf"]),
            pred_occ_locs=None, truncation=3.0,
        )

    # warm the native MC lib + page caches outside the timed runs
    warm = tempfile.mkdtemp(prefix="bench_mesh_warm_")
    mesh_one(warm, results[0])
    shutil.rmtree(warm, ignore_errors=True)

    host_cpus = os.cpu_count()
    for w in args.workers:
        out_dir = tempfile.mkdtemp(prefix="bench_mesh_")
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=w) as pool:
            futs = [pool.submit(mesh_one, out_dir, r) for r in results]
            for f in futs:
                f.result()
        dt = time.perf_counter() - t0
        n_ply = len([f for f in os.listdir(out_dir) if f.endswith(".ply")])
        shutil.rmtree(out_dir, ignore_errors=True)
        print(json.dumps({
            "mesh_workers": w,
            "host_cpus": host_cpus,
            "scenes": args.scenes,
            "ply_files": n_ply,
            "ms_per_scene": round(dt / args.scenes * 1e3, 1),
            "scenes_per_sec": round(args.scenes / dt, 2),
        }))


if __name__ == "__main__":
    main()

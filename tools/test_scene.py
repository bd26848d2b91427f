#!/usr/bin/env python
"""Whole-scene inference CLI, flag-compatible with the reference
test_scene.py.

Example:
    python tools/test_scene.py --input_data_path ./data/mp_sdf_vox_2cm_input \
        --target_data_path ./data/mp_sdf_vox_2cm_target \
        --test_file_list filelists/mp-rooms_test-scenes.txt \
        --model_path sgnn.pth --output output/mp

--model_path accepts either a reference .pth (converted on the fly) or an
sgnn_tpu .ckpt.
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def parse_args():
    # mirrors /root/reference/torch/test_scene.py:20-46
    p = argparse.ArgumentParser()
    p.add_argument("--gpu", type=int, default=0,
                   help="accepted for reference-CLI compatibility (no-op)")
    p.add_argument("--input_data_path", required=True)
    p.add_argument("--target_data_path", required=True)
    p.add_argument("--test_file_list", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--output", default="./output")
    p.add_argument("--num_hierarchy_levels", type=int, default=4)
    p.add_argument("--max_input_height", type=int, default=128)
    p.add_argument("--truncation", type=float, default=3.0)
    p.add_argument("--input_dim", type=int, default=128)
    p.add_argument("--encoder_dim", type=int, default=8)
    p.add_argument("--coarse_feat_dim", type=int, default=16)
    p.add_argument("--refine_feat_dim", type=int, default=16)
    p.add_argument("--no_pass_occ", action="store_true")
    p.add_argument("--no_pass_feats", action="store_true")
    p.add_argument("--use_skip_sparse", type=int, default=1)
    p.add_argument("--use_skip_dense", type=int, default=1)
    p.add_argument("--max_to_vis", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--dim_round", type=int, nargs="+", default=[0],
                   help="pad scene dims to a multiple of this (0 = x32); "
                        "larger buckets = fewer XLA compiles. One value "
                        "or a per-axis 'z y x' triple (the height axis "
                        "is capped at max_input_height, so e.g. "
                        "'32 128 128' rounds laterally without tripling "
                        "the z volume)")
    # trained-checkpoint-informed defaults (see tools/evaluate.py); the
    # inferencer refits a shape bucket automatically on overflow
    p.add_argument("--occupancy_fractions", type=float, nargs="+",
                   default=[1.0, 0.5, 0.25, 0.2])
    p.add_argument("--execution", default="dense_flow",
                   choices=["sparse", "dense_flow", "folded"])
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tap_order", default="c", choices=["c", "flipped"],
                   help="scn filter-tap enumeration convention for .pth "
                        "conversion; certify with tools/evaluate.py "
                        "--tap_order auto")
    p.add_argument("--mesh_workers", type=int, default=2,
                   help="host meshing worker threads (the native MC core "
                        "releases the GIL and is itself OpenMP-parallel; "
                        "size to spare cores, see tools/bench_mesh.py)")
    args = p.parse_args()
    assert not (args.no_pass_feats and args.no_pass_occ)
    assert args.num_hierarchy_levels > 1
    if len(args.dim_round) not in (1, 3):
        p.error(
            f"--dim_round takes 1 value or a 'z y x' triple, got "
            f"{len(args.dim_round)}: {args.dim_round}"
        )
    return args


def load_params(model_path, cfg, tap_order="c"):
    """Load model weights from a reference .pth or an sgnn_tpu .ckpt."""
    import jax

    from sgnn_tpu.models.sgnn import genmodel_init

    if model_path.endswith(".pth"):
        from sgnn_tpu.utils.ckpt_convert import load_reference_checkpoint

        params, stats, _ = load_reference_checkpoint(
            model_path, cfg, tap_order=tap_order
        )
        return params, stats
    from sgnn_tpu.train.checkpoint import load_checkpoint
    from sgnn_tpu.train.state import create_train_state

    params, stats = genmodel_init(jax.random.PRNGKey(0), cfg)
    template = create_train_state(params, stats)
    state, _ = load_checkpoint(model_path, template)
    return state.params, state.stats


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.data import formats as F
    from sgnn_tpu.data.dataset import SceneDataset
    from sgnn_tpu.infer import SceneInferencer
    from sgnn_tpu.meshing.export import save_predictions

    f = 2 ** (args.num_hierarchy_levels - 1) * 4
    cfg = SGNNConfig(
        encoder_dim=args.encoder_dim,
        input_dim=(f,) * 3,  # placeholder; per-scene dims via for_scene
        nf_coarse=args.coarse_feat_dim,
        nf=args.refine_feat_dim,
        num_hierarchy_levels=args.num_hierarchy_levels,
        pass_occ=not args.no_pass_occ,
        pass_feats=not args.no_pass_feats,
        use_skip_sparse=bool(args.use_skip_sparse),
        use_skip_dense=bool(args.use_skip_dense),
        truncation=args.truncation,
        batch_size=1,
        occupancy_fractions=tuple(args.occupancy_fractions),
        execution=args.execution,
        compute_dtype=args.compute_dtype,
    )
    params, stats = load_params(args.model_path, cfg, args.tap_order)
    print(f"loaded model: {args.model_path}")

    test_files, _ = F.get_train_files(
        args.input_data_path, args.test_file_list, ""
    )
    if len(test_files) > args.max_to_vis:
        test_files = test_files[: args.max_to_vis]
    random.seed(42)  # test_scene.py:114
    random.shuffle(test_files)
    print(f"#test files = {len(test_files)}")
    ds = SceneDataset(
        test_files, args.truncation, args.num_hierarchy_levels,
        max_input_height=args.max_input_height,
        target_path=args.target_data_path,
        dim_round=(args.dim_round[0] if len(args.dim_round) == 1
                   else tuple(args.dim_round)),
    )
    os.makedirs(args.output, exist_ok=True)
    # The reference discards the per-level outputs at save time
    # (test_scene.py:96-100 only exports inputs + surface SDF);
    # want_levels=False skips fetching them entirely.
    inferencer = SceneInferencer(cfg, params, stats, want_levels=False)
    stats_out = run_pipeline(inferencer, ds, args.output, args.truncation,
                             mesh_workers=args.mesh_workers)
    times = stats_out["scene_times"]
    if len(times) > 1:
        print(f"\ndone; mean scene->mesh time {np.mean(times[1:]):.3f}s "
              f"(excl. first/compile)")
    elif times:
        print(f"\ndone; scene->mesh time {times[0]:.3f}s (incl. compile)")
    else:
        print("\ndone")


def run_pipeline(inferencer, ds, output, truncation, max_scenes=None,
                 save=True, mesh_workers=2):
    """Scene->mesh pipeline: overlap scene i+1's device forward with
    scene i's fetch + host meshing (marching cubes + weld + PLY run in a
    worker thread; the native MC core releases the GIL).

    Matches the reference loop's work (test_scene.py:59-103 + the MC
    export at data_util.py:250-284) but pipelined: while the device runs
    scene i+1, the host fetches and meshes scene i.
    """
    from concurrent.futures import ThreadPoolExecutor

    from sgnn_tpu.meshing.export import save_predictions

    n_total = len(ds) if max_scenes is None else min(len(ds), max_scenes)
    times = []
    mesh_futs = []

    def mesh_one(result):
        if not save:
            return result["name"]
        save_predictions(
            output, result["name"],
            result["input_locs"], result["input_sdf"],
            tuple(int(d) for d in result["orig_dims"]),
            target_for_sdf=None, target_for_occs=None,
            pred_surf=(result["surf_locs"], result["surf_sdf"]),
            pred_occ_locs=None,
            truncation=truncation,
        )
        return result["name"]

    pool = ThreadPoolExecutor(max_workers=max(1, mesh_workers))
    pending = None  # (t0, handle) of the scene in flight
    skipped = 0
    try:
        for i in range(n_total + 1):
            handle = None
            if i < n_total:
                sample = ds[i]
                dims = sample["sdf"].shape
                sys.stdout.write(
                    f"\r[ {i} | {n_total} ] {sample['name']} "
                    f"({dims[0]}, {dims[1]}, {dims[2]})    "
                )
                sys.stdout.flush()
                try:
                    handle = (time.time(), inferencer.dispatch(sample))
                except Exception as e:  # skip-and-continue
                    print(f"\nexception at {sample['name']}: {e}")
                    skipped += 1
            if pending is not None:
                t0, h = pending
                try:
                    result = inferencer.collect(h)
                    mesh_futs.append(pool.submit(mesh_one, result))
                    times.append(time.time() - t0)
                except Exception as e:
                    print(f"\nexception at {h[0]['name']}: {e}")
                    skipped += 1
            pending = handle
        for f in mesh_futs:
            f.result()  # surface meshing exceptions
    finally:
        pool.shutdown(wait=True)
    return {"scene_times": times, "num_meshed": len(mesh_futs),
            "skipped": skipped}


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-scene evaluation harness: SDF L1 + occupancy IoU on scene pairs.

The parity surface for comparing against the reference (SURVEY.md §7.6):
run any checkpoint (.pth converted on the fly, or .ckpt) over
input/target scene volumes and emit per-scene + aggregate metrics as JSON.

    python tools/evaluate.py --input_data_path ... --target_data_path ... \
        --test_file_list filelists/mp-rooms_val-scenes.txt \
        --model_path sgnn.pth --output metrics.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_data_path", required=True)
    p.add_argument("--target_data_path", required=True)
    p.add_argument("--test_file_list", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--output", default="metrics.json")
    p.add_argument("--num_hierarchy_levels", type=int, default=4)
    p.add_argument("--max_input_height", type=int, default=128)
    p.add_argument("--truncation", type=float, default=3.0)
    p.add_argument("--encoder_dim", type=int, default=8)
    p.add_argument("--coarse_feat_dim", type=int, default=16)
    p.add_argument("--refine_feat_dim", type=int, default=16)
    p.add_argument("--max_scenes", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    # defaults informed by trained-checkpoint occupancy (round-4 eval:
    # surface ~0.14-0.15 of scene voxels); SceneInferencer refits a
    # bucket automatically if a scene still overflows
    p.add_argument("--occupancy_fractions", type=float, nargs="+",
                   default=[1.0, 0.5, 0.25, 0.2])
    p.add_argument("--dim_round", type=int, nargs="+", default=[0],
                   help="pad scene dims to multiples of this (0 = x32); "
                        "one value or a per-axis 'z y x' triple. Coarser "
                        "buckets = fewer XLA compiles across scenes "
                        "(e.g. '32 128 128')")
    p.add_argument("--execution", default="dense_flow",
                   choices=["sparse", "dense_flow", "folded"])
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tap_order", default="c",
                   choices=["c", "flipped", "auto"],
                   help="scn filter-tap enumeration convention for .pth "
                        "conversion. 'auto' certifies it empirically: the "
                        "first scene is evaluated under both conventions "
                        "and the self-consistent one (lower SDF L1 at "
                        "predicted voxels) wins; the verdict is printed "
                        "and recorded in the output JSON")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sgnn_tpu import losses as L
    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.data import formats as F
    from sgnn_tpu.data.dataset import SceneDataset
    from sgnn_tpu.infer import SceneInferencer
    from tools.test_scene import load_params

    f = 2 ** (args.num_hierarchy_levels - 1) * 4
    cfg = SGNNConfig(
        encoder_dim=args.encoder_dim,
        input_dim=(f,) * 3,
        nf_coarse=args.coarse_feat_dim,
        nf=args.refine_feat_dim,
        num_hierarchy_levels=args.num_hierarchy_levels,
        truncation=args.truncation,
        batch_size=1,
        occupancy_fractions=tuple(args.occupancy_fractions),
        execution=args.execution,
        compute_dtype=args.compute_dtype,
    )
    files, _ = F.get_train_files(args.input_data_path, args.test_file_list)
    if args.max_scenes:
        files = files[: args.max_scenes]
    if len(args.dim_round) not in (1, 3):
        p.error(f"--dim_round takes 1 or 3 values, got {args.dim_round}")
    ds = SceneDataset(
        files, args.truncation, args.num_hierarchy_levels,
        max_input_height=args.max_input_height,
        target_path=args.target_data_path,
        dim_round=(args.dim_round[0] if len(args.dim_round) == 1
                   else tuple(args.dim_round)),
    )

    tap_verdict = None
    if args.tap_order == "auto":
        # Certify the scn tap-enumeration convention empirically
        # (/root/reference/torch/test_scene.py:61-62 checkpoint load): a
        # wrong tap order scrambles every 3^3/2^3 conv, so the SDF L1 at
        # predicted voxels degrades by orders of magnitude — evaluate the
        # first scene under both and keep the self-consistent one.
        assert args.model_path.endswith(".pth"), (
            "--tap_order auto certifies reference .pth conversions"
        )
        sample0 = ds[0]
        scores = {}
        for order in ("c", "flipped"):
            pp, ss = load_params(args.model_path, cfg, order)
            inf0 = SceneInferencer(cfg, pp, ss)
            rec = _eval_scene(inf0, sample0, args)
            scores[order] = rec["l1_pred"] if rec else float("inf")
            print(f"[tap-order {order}] l1_pred = {scores[order]}")
        best = min(scores, key=lambda k: scores[k]
                   if scores[k] >= 0 else float("inf"))
        tap_verdict = {
            "chosen": best, "l1_pred_c": scores["c"],
            "l1_pred_flipped": scores["flipped"],
        }
        print(f"[tap-order] certified: '{best}' "
              f"(c={scores['c']:.4g}, flipped={scores['flipped']:.4g})")
        args.tap_order = best

    params, stats = load_params(args.model_path, cfg, args.tap_order)
    inferencer = SceneInferencer(cfg, params, stats)
    per_scene = []
    for i in range(len(ds)):
        sample = ds[i]
        rec = _eval_scene(inferencer, sample, args)
        if rec is None:
            continue
        per_scene.append(rec)
        print(rec)
    agg = {}
    for k in ("l1_pred", "l1_tgt", "iou_surface", "seconds"):
        vals = [s[k] for s in per_scene if s[k] >= 0]
        agg[k] = float(np.mean(vals)) if vals else -1.0
    out = {"aggregate": agg, "scenes": per_scene}
    # calibration record: observed per-level occupancy fractions and any
    # capacity refits (bake these into --occupancy_fractions to serve
    # this checkpoint without a single recompile)
    out["measured_occupancy_fractions"] = {
        "x".join(map(str, dims)): fr
        for dims, fr in inferencer.measured_fractions().items()
    }
    if inferencer._cap_override:
        out["refit_capacities"] = {
            "x".join(map(str, dims)): list(caps)
            for dims, caps in inferencer._cap_override.items()
        }
    if tap_verdict is not None:
        out["tap_order"] = tap_verdict
    with open(args.output, "w") as fo:
        json.dump(out, fo, indent=1)
    print("aggregate:", agg)


def _eval_scene(inferencer, sample, args):
    """Metrics for one scene; None on (skipped) failure."""
    import jax.numpy as jnp

    from sgnn_tpu import losses as L

    t0 = time.time()
    try:
        r = inferencer(sample)
    except Exception as e:
        print(f"exception at {sample['name']}: {e}")
        return None
    dt = time.time() - t0
    tgt = jnp.asarray(sample["sdf"][None])
    known = jnp.asarray(sample["known"][None])
    tgt_clamped = L.preprocess_sdf(tgt, args.truncation)
    n = len(r["surf_locs"])
    locs4 = np.concatenate(
        [r["surf_locs"], np.zeros((n, 1), np.int32)], -1
    )
    # pad to a static-ish cap for the jitted metric fns (plain numpy here)
    l1p = float(
        L.compute_l1_predsurf_sparse_dense(
            jnp.asarray(locs4), jnp.int32(n), jnp.asarray(r["surf_sdf"]),
            tgt_clamped, None, False, True,
            known >= L.UNK_THRESH,
        )
    ) if n else -1.0
    l1t = float(
        L.compute_l1_tgtsurf_sparse_dense(
            jnp.asarray(locs4), jnp.int32(n), jnp.asarray(r["surf_sdf"]),
            tgt_clamped, args.truncation, True, known,
        )
    ) if n else -1.0
    occ_t = jnp.where(
        known >= L.UNK_THRESH, L.UNK_ID,
        (jnp.abs(tgt_clamped) < args.truncation).astype(jnp.float32),
    )
    iou = float(
        L.compute_iou_sparse_dense(
            jnp.asarray(locs4), jnp.int32(n),
            jnp.ones((n,), bool), occ_t, True,
        )
    ) if n else -1.0
    return {
        "name": r["name"], "l1_pred": l1p, "l1_tgt": l1t,
        "iou_surface": iou, "seconds": round(dt, 3),
        "surf_voxels": n,
    }


if __name__ == "__main__":
    main()

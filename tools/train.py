#!/usr/bin/env python
"""Training CLI, flag-compatible with the reference train.py.

Example:
    python tools/train.py --data_path ./data/completion_blocks \
        --train_file_list train_list.txt --val_file_list val_list.txt \
        --save logs/mp
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def parse_args():
    # mirrors /root/reference/torch/train.py:21-58
    p = argparse.ArgumentParser()
    p.add_argument("--gpu", type=int, default=0,
                   help="accepted for reference-CLI compatibility (no-op: "
                        "device selection is JAX's)")
    p.add_argument("--vis_dfs", type=int, default=0,
                   help="accepted for reference-CLI compatibility")
    p.add_argument("--data_path", required=True)
    p.add_argument("--train_file_list", required=True)
    p.add_argument("--val_file_list", default="")
    p.add_argument("--save", default="./logs")
    p.add_argument("--retrain", type=str, default="")
    p.add_argument("--input_dim", type=int, default=0)
    p.add_argument("--encoder_dim", type=int, default=8)
    p.add_argument("--coarse_feat_dim", type=int, default=16)
    p.add_argument("--refine_feat_dim", type=int, default=16)
    p.add_argument("--no_pass_occ", action="store_true")
    p.add_argument("--no_pass_feats", action="store_true")
    p.add_argument("--use_skip_sparse", type=int, default=1)
    p.add_argument("--use_skip_dense", type=int, default=1)
    p.add_argument("--no_logweight_target_sdf", dest="logweight_target_sdf",
                   action="store_false")
    p.add_argument("--num_hierarchy_levels", type=int, default=4)
    p.add_argument("--num_iters_per_level", type=int, default=2000)
    p.add_argument("--truncation", type=float, default=3.0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--max_epoch", type=int, default=5)
    p.add_argument("--save_epoch", type=int, default=1)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--decay_lr", type=int, default=10)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--weight_sdf_loss", type=float, default=1.0)
    p.add_argument("--weight_missing_geo", type=float, default=5.0)
    p.add_argument("--no_loss_masking", dest="use_loss_masking",
                   action="store_false")
    p.add_argument("--scheduler_step_size", type=int, default=0)
    # TPU-specific
    p.add_argument("--num_devices", type=int, default=0, help="0 = all")
    p.add_argument("--input_capacity", type=int, default=0)
    p.add_argument("--autotune_capacity", type=int, default=0,
                   help="sparse execution: derive per-level capacities "
                        "from the target-occupancy statistics of N sampled "
                        "train chunks (0 = use --occupancy_fractions "
                        "defaults); see sgnn_tpu/data/capacity.py")
    p.add_argument("--occupancy_fractions", type=float, nargs="+",
                   default=[1.0, 0.5, 0.25, 0.125])
    p.add_argument("--ckpt_backend", default="npz",
                   choices=["npz", "orbax"],
                   help="orbax = async multi-host sharded checkpointing")
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--execution", default="dense_flow",
                   choices=["sparse", "dense_flow", "folded"],
                   help="dense_flow = masked dense grids; folded = lane-dense\n                   layout (fastest on TPU)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--dense_transfer", action="store_true",
                   help="ship dense target/known/hierarchy grids to the "
                        "device (the reference's transfer layout, "
                        "train.py:256-261) instead of the default sparse-"
                        "row transfer densified on device (~10x fewer "
                        "H2D bytes)")
    p.add_argument("--transfer_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="dtype float batch arrays are shipped to the "
                        "device in (bfloat16 halves H2D bytes; loss "
                        "math stays f32 on device)")
    p.add_argument("--fuse_train_bn", type=int, default=1,
                   help="folded execution: fuse train-mode BN+ReLU into "
                        "the conv/downconv/upconv/head Pallas kernels "
                        "(0 = composed BN->op XLA passes, ablation)")
    p.add_argument("--rss_restart_gb", type=float, default=0.0,
                   help="checkpoint + exit(75) when host RSS exceeds this "
                        "(GiB) for a supervised restart; counters the "
                        "axon tunnel client's per-transfer host-memory "
                        "retention (tools/probe_transfer_leak.py). 0=off")
    p.set_defaults(logweight_target_sdf=True, use_loss_masking=True)
    args = p.parse_args()
    assert not (args.no_pass_feats and args.no_pass_occ)
    assert args.weight_missing_geo >= 1
    assert args.num_hierarchy_levels > 1
    return args


def infer_input_dim(args):
    # /root/reference/torch/train.py:62-71
    if args.input_dim != 0:
        return (args.input_dim,) * 3
    dim = (128, 64, 64)
    if "64-64-128" in args.data_path:
        dim = (128, 64, 64)
    elif "96-96-160" in args.data_path:
        dim = (160, 96, 96)
    if "64-64-64" in args.data_path:
        dim = (64, 64, 64)
    return dim


def main():
    args = parse_args()
    input_dim = infer_input_dim(args)
    print(f"input_dim: {input_dim}")

    # Persistent compile cache: an elastic-resume restart (supervised
    # long runs restart after host OOM / preemption) must pay a warm
    # compile, not the multi-hundred-second cold compile of the
    # all-levels train step. Same cache dir as the bench/trace tools.
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from sgnn_tpu.data import formats as F
    from sgnn_tpu.data.dataset import BatchLoader, SceneDataset
    from sgnn_tpu.train.loop import TrainOptions, Trainer

    train_files, val_files = F.get_train_files(
        args.data_path, args.train_file_list, args.val_file_list
    )
    overfit = len(train_files) == 1  # train.py:93-98
    use_loss_masking = args.use_loss_masking and not overfit
    print(f"#train files = {len(train_files)}  #val files = {len(val_files)}")

    occupancy_fractions = tuple(args.occupancy_fractions)
    if args.autotune_capacity > 0:
        from sgnn_tpu.data.capacity import estimate_occupancy_fractions

        occupancy_fractions, _ = estimate_occupancy_fractions(
            train_files, args.num_hierarchy_levels, args.truncation,
            sample=args.autotune_capacity,
        )
        print(f"autotuned occupancy_fractions = "
              f"{tuple(round(f, 4) for f in occupancy_fractions)}")

    opts = TrainOptions(
        data_path=args.data_path,
        save=args.save,
        retrain=args.retrain,
        input_dim=input_dim,
        encoder_dim=args.encoder_dim,
        coarse_feat_dim=args.coarse_feat_dim,
        refine_feat_dim=args.refine_feat_dim,
        no_pass_occ=args.no_pass_occ,
        no_pass_feats=args.no_pass_feats,
        use_skip_sparse=args.use_skip_sparse,
        use_skip_dense=args.use_skip_dense,
        logweight_target_sdf=args.logweight_target_sdf,
        num_hierarchy_levels=args.num_hierarchy_levels,
        num_iters_per_level=args.num_iters_per_level,
        truncation=args.truncation,
        batch_size=args.batch_size,
        start_epoch=args.start_epoch,
        max_epoch=args.max_epoch,
        save_epoch=args.save_epoch,
        lr=args.lr,
        decay_lr=args.decay_lr,
        weight_decay=args.weight_decay,
        weight_sdf_loss=args.weight_sdf_loss,
        weight_missing_geo=args.weight_missing_geo,
        use_loss_masking=use_loss_masking,
        seed=args.seed,
        num_devices=args.num_devices,
        input_capacity=args.input_capacity,
        occupancy_fractions=occupancy_fractions,
        max_steps=args.max_steps,
        execution=args.execution,
        compute_dtype=args.compute_dtype,
        transfer_dtype=args.transfer_dtype,
        scheduler_step_size=args.scheduler_step_size,
        ckpt_backend=args.ckpt_backend,
        sparse_targets=not args.dense_transfer,
        rss_restart_gb=args.rss_restart_gb,
        fuse_train_bn=bool(args.fuse_train_bn),
    )
    trainer = Trainer(opts)

    target_cap, hier_caps = 0, None
    if not args.dense_transfer:
        from sgnn_tpu.data.capacity import estimate_row_capacities

        target_cap, hier_caps = estimate_row_capacities(
            train_files, args.num_hierarchy_levels, args.truncation,
            args.batch_size,
        )
        print(f"sparse-target transfer: target_capacity={target_cap} "
              f"hier_capacities={hier_caps}")

    num_overfit_train = 640 if overfit else 0
    num_overfit_val = 160 if overfit else 0
    train_ds = SceneDataset(
        train_files, args.truncation, args.num_hierarchy_levels,
        num_overfit=num_overfit_train,
        sparse_targets=not args.dense_transfer,
    )
    train_loader = BatchLoader(
        train_ds, args.batch_size, trainer.cfg.input_cap * trainer.num_devices,
        shuffle=True, seed=args.seed, transform=trainer.device_transform,
        target_capacity=target_cap, hier_capacities=hier_caps,
    )
    val_loader = None
    if val_files:
        val_ds = SceneDataset(
            val_files, args.truncation, args.num_hierarchy_levels,
            num_overfit=num_overfit_val,
            sparse_targets=not args.dense_transfer,
        )
        val_loader = BatchLoader(
            val_ds, args.batch_size,
            trainer.cfg.input_cap * trainer.num_devices,
            transform=trainer.device_transform,
            target_capacity=target_cap, hier_capacities=hier_caps,
        )

    os.makedirs(args.save, exist_ok=True)
    with open(os.path.join(args.save, "args.txt"), "w") as f:
        f.write(str(vars(args)) + "\n")
    trainer.fit(train_loader, val_loader, log_dir=args.save)


if __name__ == "__main__":
    main()

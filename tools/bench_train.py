"""Training-throughput benchmark on synthetic chunks.

Measures full optimization steps (fwd + bwd + Adam + metrics cadence) at
the reference train config (batch 8, chunks 128x64x64 @ 2 cm, L=4 —
/root/reference/torch/train.py:40-64) through the real Trainer loop,
including the data loader, per-device re-collation, and device prefetch —
so loader/pipeline improvements show up here, not just kernel wins.

Usage: python tools/bench_train.py [--steps 30] [--batch_size 8]
Prints one JSON line {"step_ms": ..., "chunks_per_sec": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def make_chunk(rng, dims=(128, 64, 64), vs=0.02, n_surface=8000):
    from sgnn_tpu.data import formats as F

    Z, Y, X = dims
    flat = rng.choice(Z * Y * X, size=n_surface, replace=False)
    z, rem = flat // (Y * X), flat % (Y * X)
    y, x = rem // X, rem % X
    in_locs = np.stack([z, y, x], -1).astype(np.int32)
    in_sdf = rng.randn(n_surface).astype(np.float32)
    target = np.full(dims, -np.inf, np.float32)
    target[z, y, x] = in_sdf
    known = (rng.rand(*dims) * 3).astype(np.uint8)
    hier = []
    # ~8% occupancy per hierarchy level: matches real scan chunks
    # (a 12-voxel truncFactor-6 band around room surfaces; the sparse
    # transfer path's row counts are workload-dependent, so the synthetic
    # data must carry realistic sparsity)
    for f in (8, 4, 2):
        hd = (Z // f, Y // f, X // f)
        g = np.full(hd, -np.inf, np.float32)
        m = rng.rand(*hd) > 0.92
        g[m] = rng.randn(int(m.sum())).astype(np.float32)
        hier.append(g)
    return F.TrainChunk(
        in_locs, in_sdf, target, dims, vs,
        np.eye(4, dtype=np.float32), known, hier,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_chunks", type=int, default=64)
    ap.add_argument("--execution", default="dense_flow")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--transfer_dtype", default="float32")
    ap.add_argument("--log_every", type=int, default=20)
    ap.add_argument("--window", type=int, default=1,
                    help=">1: time windows of N steps with one completion "
                         "fetch per window (the production sync cadence) "
                         "instead of fetching every step")
    ap.add_argument("--dense_transfer", action="store_true",
                    help="ship dense target grids (the pre-round-3 "
                         "layout) instead of sparse rows")
    ap.add_argument("--no_fuse_train_bn", action="store_true",
                    help="folded ablation: composed BN->conv instead of "
                         "the fused train-BN kernels")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from sgnn_tpu.data import formats as F
    from sgnn_tpu.data.dataset import BatchLoader, SceneDataset
    from sgnn_tpu import schedules as S
    from sgnn_tpu.train.loop import TrainOptions, Trainer

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="bench_train_")
    files = []
    for i in range(args.num_chunks):
        p = os.path.join(tmp, f"c{i}.sdfs")
        F.save_train_file(p, make_chunk(rng))
        files.append(p)

    opts = TrainOptions(
        input_dim=(128, 64, 64),
        num_hierarchy_levels=4,
        # all levels + surface active from step 0: the steady-state cost
        num_iters_per_level=0,
        batch_size=args.batch_size,
        max_epoch=1000,
        lr=1e-3,
        execution=args.execution,
        compute_dtype=args.compute_dtype,
        transfer_dtype=args.transfer_dtype,
        log_every=args.log_every,
        ckpt_every=0,
        save_epoch=0,
        save=os.path.join(tmp, "logs"),
        sparse_targets=not args.dense_transfer,
        fuse_train_bn=not args.no_fuse_train_bn,
    )
    # num_iters_per_level=0 would divide by zero in the schedule; emulate
    # "all active" by starting the iteration counter past the fade-in
    opts.num_iters_per_level = 1
    trainer = Trainer(opts)
    trainer.iteration = 10 * opts.num_hierarchy_levels  # all levels active
    trainer.epoch = 0
    lw = S.get_loss_weights(
        trainer.iteration, opts.num_hierarchy_levels, 1, opts.weight_sdf_loss
    )
    assert S.active_levels(lw) == (opts.num_hierarchy_levels - 1, True)

    ds = SceneDataset(
        files, truncation=3.0, num_hierarchy_levels=4,
        sparse_targets=not args.dense_transfer,
    )
    target_cap, hier_caps = 0, None
    if not args.dense_transfer:
        from sgnn_tpu.data.capacity import estimate_row_capacities

        target_cap, hier_caps = estimate_row_capacities(
            files, 4, 3.0, args.batch_size
        )
        print(f"sparse-target caps: {target_cap} {hier_caps}",
              file=sys.stderr)
    loader = BatchLoader(
        ds, args.batch_size, trainer.cfg.input_cap * trainer.num_devices,
        shuffle=True, seed=0, transform=trainer.device_transform,
        target_capacity=target_cap, hier_capacities=hier_caps,
    )

    import jax

    # Two timing modes, both forcing completion with a device->host fetch
    # (on this tunnel block_until_ready returns at dispatch):
    #  * per-step: fetch the loss after EVERY step — upper bound; adds one
    #    tunnel RTT per step the production loop does not pay.
    #  * windowed: fetch once per --window steps (the production cadence:
    #    train/loop.py only syncs on the log_every boundary); window time /
    #    window = the pipeline's true sustained step time.
    times = []
    win_times = []
    done = 0
    t_prev = None
    t_win = None
    while done < args.steps + args.warmup:
        for batch, dev in trainer._prefetch(loader):
            with_metrics = trainer.iteration % args.log_every == 0
            metrics, _ = trainer.run_step(batch, with_metrics, dev_batch=dev)
            done += 1
            if args.window <= 1 or done % args.window == 0 or (
                done >= args.steps + args.warmup
            ):
                float(np.asarray(metrics["loss"]))
                t = time.perf_counter()
                if args.window > 1:
                    if t_win is not None and done > args.warmup:
                        # final window may be partial: divide by the steps
                        # it actually contains, but drop windows shorter
                        # than half the nominal size — the single
                        # completion-fetch RTT amortizes over too few
                        # steps there and biases the sample high
                        n = done - t_win[1]
                        if n >= max(1, args.window // 2):
                            win_times.append((t - t_win[0]) / n)
                    t_win = (t, done)
            if args.window <= 1:
                t = time.perf_counter()
                if t_prev is not None:
                    times.append(t - t_prev)
                t_prev = t
            if done >= args.steps + args.warmup:
                break
        # epoch boundary: per-step mode excludes the loader restart (it
        # times single steps); windowed mode INTENTIONALLY keeps t_win
        # running across the boundary — sustained throughput includes
        # loader restarts, and at the default 8-steps/epoch a reset here
        # would kill every window before its fetch point
        t_prev = None

    if args.window > 1:
        steady = np.array(win_times)
    else:
        steady = np.array(times[args.warmup:])
    step_ms = float(np.median(steady) * 1e3)
    print(json.dumps({
        "step_ms": round(step_ms, 1),
        "chunks_per_sec": round(args.batch_size / (step_ms / 1e3), 2),
        "mean_step_ms": round(float(steady.mean() * 1e3), 1),
        "p90_step_ms": round(float(np.percentile(steady, 90) * 1e3), 1),
        "steps": len(steady),
        "window": args.window,
        "loss": float(metrics["loss"]),
        "times_ms": [round(t * 1e3, 1) for t in steady],
    }))


if __name__ == "__main__":
    main()

"""Capture a device trace of the production TRAINING step (folded
execution, sparse-target transfer, batch 8 chunks 128x64x64, all levels
+ surface active — the bench_train.py workload) and print the
per-category/per-source attribution via tools/trace_summary.py.

The training counterpart of tools/trace_forward.py; VERDICT round-3
asked for a fresh post-BN-fusion trace to substantiate (or refute) the
claim that the train-step wall clock is tunnel-bound.

Usage: python tools/trace_train.py [--execution folded] [--reps 3]
                                   [--out /tmp/sgnn_train_trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execution", default="folded")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--with_metrics", action="store_true",
                    help="trace the metrics step variant instead of the "
                         "steady-state no-metrics one")
    ap.add_argument("--out", default="/tmp/sgnn_train_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from bench_train import make_chunk
    from sgnn_tpu import schedules as S
    from sgnn_tpu.data import formats as F
    from sgnn_tpu.data.capacity import estimate_row_capacities
    from sgnn_tpu.data.dataset import BatchLoader, SceneDataset
    from sgnn_tpu.train.loop import TrainOptions, Trainer
    from sgnn_tpu.utils.profiling import trace

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="trace_train_")
    files = []
    for i in range(max(args.batch_size * 2, 16)):
        p = os.path.join(tmp, f"c{i}.sdfs")
        F.save_train_file(p, make_chunk(rng))
        files.append(p)

    opts = TrainOptions(
        input_dim=(128, 64, 64),
        num_hierarchy_levels=4,
        num_iters_per_level=1,
        batch_size=args.batch_size,
        max_epoch=1000,
        lr=1e-3,
        execution=args.execution,
        compute_dtype=args.compute_dtype,
        log_every=20,
        ckpt_every=0,
        save_epoch=0,
        save=os.path.join(tmp, "logs"),
        sparse_targets=True,
    )
    trainer = Trainer(opts)
    trainer.iteration = 10 * opts.num_hierarchy_levels  # all levels active
    trainer.epoch = 0
    lw = S.get_loss_weights(
        trainer.iteration, opts.num_hierarchy_levels, 1, opts.weight_sdf_loss
    )
    assert S.active_levels(lw) == (opts.num_hierarchy_levels - 1, True)

    ds = SceneDataset(files, truncation=3.0, num_hierarchy_levels=4,
                      sparse_targets=True)
    target_cap, hier_caps = estimate_row_capacities(
        files, 4, 3.0, args.batch_size
    )
    loader = BatchLoader(
        ds, args.batch_size, trainer.cfg.input_cap * trainer.num_devices,
        shuffle=True, seed=0, transform=trainer.device_transform,
        target_capacity=target_cap, hier_capacities=hier_caps,
    )

    # keep iteration off the log_every boundary so run_step compiles the
    # steady-state (no-metrics) variant, unless --with_metrics
    print("compile + warmup...", file=sys.stderr)
    batches = []
    for batch, dev in trainer._prefetch(loader):
        batches.append((batch, dev))
        if len(batches) >= args.reps + 1:
            break
    if args.with_metrics:
        trainer.iteration = 20
    else:
        trainer.iteration = 41
    m, _ = trainer.run_step(batches[0][0], args.with_metrics,
                            dev_batch=batches[0][1])
    print(f"warmup loss {float(np.asarray(m['loss'])):.4f}",
          file=sys.stderr)

    with trace(args.out):
        for batch, dev in batches[1:]:
            if args.with_metrics:
                trainer.iteration = 20
            else:
                trainer.iteration = 41
            m, _ = trainer.run_step(batch, args.with_metrics, dev_batch=dev)
        float(np.asarray(m["loss"]))  # force completion inside the trace
    print(f"traced {len(batches) - 1} steps -> {args.out}", file=sys.stderr)

    import trace_summary

    trace_summary.summarize(args.out, args.top)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

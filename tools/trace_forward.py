"""Capture a device trace of the production inference forward (the
bench.py workload: folded execution, 96x192x192 scene, only-surface
serving) and print the per-category/per-source attribution via
tools/trace_summary.py.

Usage: python tools/trace_forward.py [--int8] [--reps 3]
                                     [--out /tmp/sgnn_trace]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/sgnn_trace")
    ap.add_argument("--full_outputs", action="store_true",
                    help="materialize per-level outputs too")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_sparse_input
    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.models import folded_flow as FF
    from sgnn_tpu.models import sgnn as M
    from sgnn_tpu.ops.sparse import make_sparse
    from sgnn_tpu.utils.profiling import trace

    cfg = SGNNConfig(
        input_dim=(96, 192, 192), batch_size=1, num_hierarchy_levels=4,
        occupancy_fractions=(1.0, 0.4, 0.2, 0.1), execution="dense_flow",
        compute_dtype="bfloat16",
        use_pallas_conv=jax.default_backend() == "tpu",
        quantize_int8=args.int8,
        input_presorted=True,  # _synthetic_sparse_input is C-ordered
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    locs, feats, num = _synthetic_sparse_input(cfg)
    jl, jf, jn = jnp.asarray(locs), jnp.asarray(feats), jnp.asarray(num)

    @jax.jit
    def fwd(params, stats, locs, feats, num_valid):
        st = make_sparse(locs, feats, num_valid, cfg.input_dim, 1)
        out = FF.genmodel_apply_folded(
            params, stats, cfg, st,
            num_refine_active=cfg.num_refine_levels, do_surf=True,
            want_level_outputs=args.full_outputs,
        )
        return jnp.sum(
            jnp.where(out.surf_mask, out.surf_sdf, 0.0)
        ) + jnp.mean(out.coarse_out)

    print("compile + warmup...", file=sys.stderr)
    float(fwd(params, stats, jl, jf, jn))  # compile outside the trace
    with trace(args.out):
        acc = 0.0
        for _ in range(args.reps):
            acc += float(fwd(params, stats, jl, jf, jn))
    print(f"traced {args.reps} forwards (acc={acc:.3f}) -> {args.out}",
          file=sys.stderr)

    import trace_summary

    trace_summary.summarize(args.out, args.top)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

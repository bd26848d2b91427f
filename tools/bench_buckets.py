"""Serving compile budget, measured ON CHIP per dim_round bucket.

VERDICT r4 item 4: the per-axis dim_round bucket model (tools/
compile_budget.py bucket_report) was derived analytically but no bucket
was ever compiled on the TPU. This tool closes that: it takes a scene-
dims population, applies a dim_round, picks the TOP-K most-populated
padded shapes, and compiles + times the production serving forward
(folded bf16, only-surface — the same graph tools/test_scene.py and
tools/evaluate.py build per bucket) for each.

Reports per bucket: population share, compile+first seconds, steady-state
forward ms (chained-K differencing like bench.py). Run twice to get the
.jax_cache warm-hit time (the second run's compile+first).

Usage:
  python tools/bench_buckets.py --scene_dims_file dims.txt \
      --dim_round 32 96 96 --top 4
Matches the reference's per-scene update_sizes serving contract
(/root/reference/torch/model.py:357-369) under static-shape compilation.
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dims_file", required=True)
    ap.add_argument("--dim_round", type=int, nargs="+", default=[32, 96, 96])
    ap.add_argument("--top", type=int, default=4)
    ap.add_argument("--k", type=int, default=12,
                    help="chained forwards for the steady-state number")
    args = ap.parse_args()
    rr = np.asarray(
        args.dim_round * 3 if len(args.dim_round) == 1 else args.dim_round,
        np.int64,
    )

    dims = np.asarray(
        [[int(t) for t in ln.split()[:3]]
         for ln in open(args.scene_dims_file) if ln.strip()],
        np.int64,
    )
    padded = ((dims + rr - 1) // rr) * rr
    counts = collections.Counter(tuple(int(v) for v in p) for p in padded)
    top = counts.most_common(args.top)
    n = len(dims)
    print(f"population: {n} scenes, round {tuple(rr)}, "
          f"{len(counts)} buckets; top {args.top} cover "
          f"{sum(c for _, c in top) / n:.1%}", file=sys.stderr)

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

    rows = []
    for shape, cnt in top:
        cfg = SGNNConfig(
            input_dim=shape, batch_size=1, num_hierarchy_levels=4,
            occupancy_fractions=(1.0, 0.5, 0.25, 0.2),
            execution="dense_flow", compute_dtype="bfloat16",
            use_pallas_conv=jax.default_backend() == "tpu",
            input_presorted=True,
        )
        params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
        locs, feats, num = _synthetic_sparse_input(cfg)
        jl, jf, jn = jnp.asarray(locs), jnp.asarray(feats), jnp.asarray(num)

        def fwd(params, stats, st):
            out = FF.genmodel_apply_folded(
                params, stats, cfg, st,
                num_refine_active=cfg.num_refine_levels, do_surf=True,
                want_level_outputs=False,
            )
            return jnp.sum(
                jnp.where(out.surf_mask, out.surf_sdf, 0.0)
            ) + jnp.mean(out.coarse_out)

        @jax.jit
        def chain(params, stats, locs, feats, num_valid, k):
            def body(i, carry):
                f, acc = carry
                st = make_sparse(locs, f, num_valid, cfg.input_dim, 1)
                s = fwd(params, stats, st)
                return (f * (1.0 + 1e-6 * jnp.tanh(s)), acc + s)

            _, acc = jax.lax.fori_loop(
                0, k, body, (feats, jnp.float32(0.0)))
            return acc

        t0 = time.time()
        float(chain(params, stats, jl, jf, jn, jnp.int32(1)))
        t_compile = time.time() - t0
        t0 = time.time()
        float(chain(params, stats, jl, jf, jn, jnp.int32(2)))
        t2 = time.time() - t0
        t0 = time.time()
        float(chain(params, stats, jl, jf, jn, jnp.int32(2 + args.k)))
        tk = time.time() - t0
        ms = (tk - t2) / args.k * 1e3
        rows.append({
            "bucket": list(shape), "scenes": cnt, "share": cnt / n,
            "compile_first_s": round(t_compile, 1),
            "fwd_ms": round(ms, 2),
        })
        print(f"bucket {shape}: {cnt} scenes ({cnt / n:.1%}), "
              f"compile+first {t_compile:.1f}s, fwd {ms:.2f} ms",
              file=sys.stderr)
    print(json.dumps({"dim_round": [int(v) for v in rr], "rows": rows}))


if __name__ == "__main__":
    main()

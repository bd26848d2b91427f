#!/usr/bin/env python
"""Compare sparse-conv execution backends on the current platform.

Runs the bench.py workload (whole-scene forward, chained-K timing) for
each requested backend and reports compile + steady-state numbers.

    python tools/bench_backends.py --backends gather dense --k2 10
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backends", nargs="+", default=["gather", "dense"])
    p.add_argument("--dims", type=int, nargs=3, default=[96, 192, 192])
    p.add_argument("--k1", type=int, default=2)
    p.add_argument("--k2", type=int, default=10)
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.models import sgnn as M
    from sgnn_tpu.ops.sparse import make_sparse
    from __graft_entry__ import _synthetic_sparse_input

    results = {}
    for backend in args.backends:
        cfg = SGNNConfig(
            input_dim=tuple(args.dims), batch_size=1,
            num_hierarchy_levels=4,
            occupancy_fractions=(1.0, 0.4, 0.2, 0.1),
            conv_backend=backend if backend != "dense_flow" else "gather",
            execution="dense_flow" if backend == "dense_flow" else "sparse",
            compute_dtype=args.compute_dtype,
        )
        params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
        locs, feats, num = _synthetic_sparse_input(cfg)
        jl, jf, jn = (jnp.asarray(locs), jnp.asarray(feats),
                      jnp.asarray(num))

        if cfg.execution == "dense_flow":
            from sgnn_tpu.models import dense_flow as DF

            def fwd(params, stats, st, cfg=cfg):
                out, _ = DF.genmodel_apply_dense(
                    params, stats, cfg, st,
                    num_refine_active=cfg.num_refine_levels, do_surf=True,
                    training=False,
                )
                return jnp.sum(
                    jnp.where(out.surf_mask, out.surf_sdf, 0.0)
                ) + jnp.mean(out.coarse_out)
        else:
            def fwd(params, stats, st, cfg=cfg):
                out, _ = M.genmodel_apply(
                    params, stats, cfg, st,
                    num_refine_active=cfg.num_refine_levels, do_surf=True,
                    training=False,
                )
                return jnp.sum(out.surf_sdf) + jnp.mean(out.coarse_out)

        @jax.jit
        def chain(params, stats, locs, feats, num_valid, k, cfg=cfg):
            def body(i, carry):
                f, acc = carry
                st = make_sparse(locs, f, num_valid, cfg.input_dim, 1)
                s = fwd(params, stats, st)
                return (f * (1.0 + 1e-6 * jnp.tanh(s)), acc + s)

            _, acc = jax.lax.fori_loop(0, k, body, (feats, jnp.float32(0)))
            return acc

        def run(k):
            t0 = time.time()
            v = float(chain(params, stats, jl, jf, jn, jnp.int32(k)))
            return time.time() - t0, v

        tc, _ = run(1)
        t1, _ = run(args.k1)
        t2, _ = run(args.k2)
        per = (t2 - t1) / (args.k2 - args.k1)
        if per <= 0:
            per = t2 / args.k2
        results[backend] = {
            "compile_s": round(tc, 1),
            "per_scene_ms": round(per * 1000, 2),
            "scenes_per_sec": round(1.0 / per, 3),
        }
        print(f"[{backend}] {results[backend]}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

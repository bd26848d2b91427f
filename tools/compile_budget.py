"""Compile-cost analysis for the folded scene executable.

Round-2 measured a 908.9 s cold compile for the folded scene graph
through the remote tunnel. This tool attributes that budget WITHOUT
needing the chip: it traces the production forward and counts Pallas
(Mosaic) kernel instantiations, grouping them by (kernel family, input
shapes, static params). Mosaic compiles once per DISTINCT specialization
and caches repeats, so `unique` below — not `total` — is the Mosaic
compile count; the rest of the budget is XLA passes over the large
unrolled scene graph.

Also estimates the dim_round bucket count for a scene-dims population:
every distinct padded shape is a fresh executable, so serving cost =
buckets x cold-compile (amortized by the persistent .jax_cache).

Usage:
  env JAX_PLATFORMS=cpu python tools/compile_budget.py [--dims 96 192 192]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def count_pallas(jaxpr, counter):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            name = eqn.params.get("name", "?")
            shapes = tuple(
                (tuple(v.aval.shape), str(v.aval.dtype))
                for v in eqn.invars
            )
            grid = ()
            gm = eqn.params.get("grid_mapping")
            if gm is not None:
                grid = tuple(getattr(gm, "grid", ()))
            counter[(name, grid, shapes)] += 1
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                count_pallas(sub.jaxpr, counter)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        count_pallas(s.jaxpr, counter)


def bucket_report(dims_list):
    """For a scene-dims population, report the executable count and pad
    overhead per dim_round choice. Compile budget = buckets x one
    compile (measured: ~119 s warm .jax_cache / ~909 s cold at headline
    dims through this box's tunnel)."""
    dims = np.asarray(dims_list, np.int64)
    print(f"\n# dim_round buckets over {len(dims)} scenes")
    print(f"{'round (z y x)':>14} {'buckets':>8} {'pad overhead':>13} "
          f"{'max padded':>16}")
    # scalar rounds + per-axis: the height axis is capped at
    # max_input_height (typically exactly 128 after the crop), so a tight
    # z round with coarse lateral rounds avoids blowing up the z volume
    # the way scalar 96 does (128 -> 192).
    for r in ((32,) * 3, (64,) * 3, (96,) * 3, (128,) * 3,
              (32, 96, 96), (32, 128, 128), (32, 160, 160),
              (32, 192, 192)):
        rr = np.asarray(r, np.int64)
        padded = ((dims + rr - 1) // rr) * rr
        buckets = {tuple(p) for p in padded}
        over = padded.prod(1).sum() / dims.prod(1).sum() - 1.0
        mx = tuple(int(v) for v in padded[padded.prod(1).argmax()])
        print(f"{' '.join(f'{v:>4}' for v in r):>14} {len(buckets):>8} "
              f"{over:>12.1%} {str(mx):>16}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs=3, default=[96, 192, 192])
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--full_outputs", action="store_true")
    ap.add_argument("--scene_dims_file", default="",
                    help="file of 'Z Y X' lines: print the dim_round "
                         "bucket/pad tradeoff for that population")
    args = ap.parse_args()

    if args.scene_dims_file:
        dims_list = [
            [int(t) for t in ln.split()[:3]]
            for ln in open(args.scene_dims_file)
            if ln.strip()
        ]
        bucket_report(dims_list)
        return

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_sparse_input
    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.models import folded_flow as FF
    from sgnn_tpu.models import sgnn as M
    from sgnn_tpu.ops.sparse import make_sparse

    cfg = SGNNConfig(
        input_dim=tuple(args.dims), batch_size=1, num_hierarchy_levels=4,
        occupancy_fractions=(1.0, 0.4, 0.2, 0.1), execution="dense_flow",
        compute_dtype="bfloat16", use_pallas_conv=True,
        quantize_int8=args.int8,
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    locs, feats, num = _synthetic_sparse_input(cfg)

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

    closed = jax.make_jaxpr(fwd)(
        params, stats, jnp.asarray(locs), jnp.asarray(feats),
        jnp.asarray(num),
    )
    counter = collections.Counter()
    count_pallas(closed.jaxpr, counter)
    total = sum(counter.values())
    by_family = collections.Counter()
    for (name, grid, shapes), n in counter.items():
        by_family[name] += n
    uniq_by_family = collections.Counter()
    for (name, grid, shapes) in counter:
        uniq_by_family[name] += 1

    n_eqns = sum(1 for _ in closed.jaxpr.eqns)
    print(json.dumps({
        "dims": args.dims,
        "pallas_calls_total": total,
        "pallas_specializations_unique": len(counter),
        "calls_by_family": dict(by_family),
        "unique_by_family": dict(uniq_by_family),
        "top_level_eqns": n_eqns,
    }, indent=2))
    print("\n# unique specializations (Mosaic compiles):")
    for (name, grid, shapes), n in sorted(counter.items()):
        in_desc = ",".join(f"{s}" for s, _ in shapes[:3])
        print(f"  x{n:<3d} {name} grid={grid} in0..2={in_desc}")


if __name__ == "__main__":
    main()

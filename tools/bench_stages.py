"""Stage-level timing of the folded inference forward on the benchmark
scene: times partial forwards (num_refine_active = 0..L-1, +surface) with
chained-k differencing, so each refinement level's and the surface block's
cost is the delta between consecutive rows. Finer-grained than bench.py,
coarser than a device trace — robust through the remote-execution tunnel.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.models import folded_flow as FF
    from sgnn_tpu.models import sgnn as M
    from sgnn_tpu.ops.sparse import make_sparse
    from __graft_entry__ import _synthetic_sparse_input

    cfg = SGNNConfig(
        input_dim=(96, 192, 192), batch_size=1, num_hierarchy_levels=4,
        occupancy_fractions=(1.0, 0.5, 0.25, 0.125),
        execution="dense_flow", compute_dtype="bfloat16",
        use_pallas_conv=True,
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    locs, feats, num = _synthetic_sparse_input(cfg)
    jl, jf, jn = jnp.asarray(locs), jnp.asarray(feats), jnp.asarray(num)

    def make_chain(nra, do_surf):
        def fwd(f):
            st = make_sparse(jl, f, jn, cfg.input_dim, 1)
            out = FF.genmodel_apply_folded(
                params, stats, cfg, st,
                num_refine_active=nra, do_surf=do_surf,
            )
            s = jnp.mean(out.coarse_out)
            for o in out.refine_outs:
                s = s + jnp.mean(o)
            s = s + jnp.sum(jnp.where(out.surf_mask, out.surf_sdf, 0.0))
            return s

        @jax.jit
        def chain(f, k):
            def body(i, carry):
                ff, acc = carry
                s = fwd(ff)
                return (ff * (1.0 + 1e-6 * jnp.tanh(s)), acc + s)
            return jax.lax.fori_loop(0, k, body, (f, jnp.float32(0)))[1]
        return chain

    stages = [("encoder+trunk", 0, False)]
    for h in range(cfg.num_refine_levels):
        stages.append((f"+refine{h}", h + 1, False))
    stages.append(("+surface", cfg.num_refine_levels, True))

    rows = []
    prev = 0.0
    for name, nra, do_surf in stages:
        chain = make_chain(nra, do_surf)
        float(chain(jf, jnp.int32(2)))  # compile + warm
        t0 = time.time()
        float(chain(jf, jnp.int32(2)))
        t2 = time.time() - t0
        t0 = time.time()
        float(chain(jf, jnp.int32(22)))
        t22 = time.time() - t0
        per = (t22 - t2) / 20 * 1e3
        rows.append({"stage": name, "cum_ms": round(per, 2),
                     "delta_ms": round(per - prev, 2)})
        prev = per
        print(rows[-1])
    print(json.dumps(rows))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Microbenchmark: the lane-folded Pallas conv3d vs XLA's 3D conv on the
attached TPU chip. Chained-K fori_loop timing (see bench.py for why naive
wall-clocking lies through the tunnel).

Usage: python tools/bench_kernel.py [Z Y X C [dtype]]
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    import sgnn_tpu.ops.pallas.conv3d_folded as PC

    args = sys.argv[1:]
    Z, Y, X, C = (
        (int(args[0]), int(args[1]), int(args[2]), int(args[3]))
        if len(args) >= 4 else (96, 192, 192, 16)
    )
    dtype = jnp.bfloat16 if (len(args) < 5 or args[4] == "bf16") else (
        jnp.float32
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, Z, Y, X, C), dtype)
    w = jnp.asarray(rng.randn(27, C, C) * 0.1, dtype)

    def chain(fn):
        def body(_, g):
            return fn(g, w) * 0.5 + g * 0.5

        def run(k, g):
            out = jax.lax.fori_loop(0, k, body, g)
            return jnp.sum(out[0, 0, 0, 0])

        return jax.jit(run, static_argnums=())

    def measure(fn, name):
        run = chain(fn)
        k1 = int(os.environ.get("K1", 2))
        k2 = int(os.environ.get("K2", 12))
        float(run(1, x))  # compile + warm
        t0 = time.time()
        float(run(k1, x))
        t1 = time.time()
        float(run(k2, x))
        t2 = time.time()
        per = ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1000
        print(f"{name}: {per:.3f} ms/conv  (t{k1}={t1-t0:.3f}s "
              f"t{k2}={t2-t1:.3f}s)")
        return per

    print(f"shape (1, {Z}, {Y}, {X}, {C}) {jnp.dtype(dtype).name}")
    y1 = PC._xla_conv(x, w)
    y2 = PC.conv3d_3x3x3_folded(x, w)
    err = float(
        jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))
    )
    scale = float(jnp.max(jnp.abs(y1.astype(jnp.float32))))
    print(f"on-device max abs err: {err:.3e} (scale {scale:.2f})")
    t_xla = measure(PC._xla_conv, "xla ")
    t_pal = measure(PC.conv3d_3x3x3_folded, "pallas")
    print(f"speedup: {t_xla / t_pal:.2f}x")


if __name__ == "__main__":
    main()

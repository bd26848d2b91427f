#!/usr/bin/env python
"""Probe the tunnel-client staging-buffer leak (BENCH_NOTES: quality-run
host OOM, ~20-24 MB/step RSS growth on the axon tunnel; flat on the CPU
backend).

Measures RSS slope over N iterations of a training-batch-sized transfer
under different strategies, to locate the leak and pick a fix:

  putleaf   jax.device_put per pytree leaf (the round-4 production path)
  putpack   ONE device_put of a single packed byte buffer of equal size
            (tests call-count vs byte-count scaling)
  jitarg    numpy leaves passed directly as jit arguments (the implicit
            transfer path; different staging machinery than device_put)
  jitpack   one packed byte buffer passed as a jit argument

Usage: python tools/probe_transfer_leak.py [strategy ...] [--steps N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def rss_mb():
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 2**20


def make_batch(rng):
    """Arrays matching the quality-run sparse-target transfer schema
    (shapes from device_batch with D=1, batch 8, 64x64x128 chunks)."""
    cap_in, cap_tgt = 98304, 196608
    b = {
        "input_locs": rng.randint(0, 64, (1, cap_in, 4)).astype(np.int16),
        "input_sdf": rng.randn(1, cap_in, 1).astype(np.float32),
        "input_num_valid": np.full((1,), cap_in, np.int32),
        "target_locs": rng.randint(0, 64, (1, cap_tgt, 4)).astype(np.int16),
        "target_vals": rng.randn(1, cap_tgt).astype(np.float32),
        "target_num_valid": np.full((1,), cap_tgt, np.int32),
        "known_unk": rng.randint(0, 255, (1, 8, 128 * 64 * 64 // 8)).astype(
            np.uint8
        ),
        "target_pos": rng.randint(0, 255, (1, 8, 128 * 64 * 64 // 8)).astype(
            np.uint8
        ),
    }
    return b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("strategies", nargs="*",
                    default=["putleaf", "putpack", "jitarg", "jitpack"])
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--report_every", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    leaves = list(batch.values())
    nbytes = sum(a.nbytes for a in leaves)
    print(f"batch: {len(leaves)} leaves, {nbytes / 2**20:.1f} MB")

    packed = np.concatenate([a.view(np.uint8).reshape(-1) for a in leaves])

    @jax.jit
    def consume(tree):
        return sum(jnp.sum(jnp.asarray(v, jnp.float32)) for v in
                   jax.tree.leaves(tree))

    @jax.jit
    def consume_packed(buf):
        return jnp.sum(buf.astype(jnp.float32))

    def step_putleaf(i):
        dev = jax.tree.map(jax.device_put, batch)
        return float(consume(dev))

    def step_putpack(i):
        dev = jax.device_put(packed)
        return float(consume_packed(dev))

    def step_jitarg(i):
        return float(consume(batch))

    def step_jitpack(i):
        return float(consume_packed(packed))

    steps = {"putleaf": step_putleaf, "putpack": step_putpack,
             "jitarg": step_jitarg, "jitpack": step_jitpack}

    results = {}
    for name in args.strategies:
        fn = steps[name]
        fn(0)  # warm the executable + first transfer
        r0 = rss_mb()
        t0 = time.time()
        samples = []
        for i in range(args.steps):
            fn(i)
            if (i + 1) % args.report_every == 0:
                samples.append(rss_mb())
                print(f"[{name}] step {i + 1}: rss {samples[-1]:.0f} MB "
                      f"(+{samples[-1] - r0:.0f})", flush=True)
        dt = time.time() - t0
        slope = (samples[-1] - r0) / args.steps if samples else 0.0
        results[name] = slope
        print(f"[{name}] slope {slope:.3f} MB/step, "
              f"{dt / args.steps * 1e3:.0f} ms/step "
              f"({nbytes / 2**20 / (dt / args.steps):.0f} MB/s)")
    print("RESULT:", {k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()

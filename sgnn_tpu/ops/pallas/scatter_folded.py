"""Binned input scatter for the folded layout (Mosaic/Pallas).

The folded execution's input boundary scatters ~N sparse rows into the
slot-resolution buffer (ops/folded.py:scatter_sparse). XLA's scatter
lowering costs ~35 ns per update row, which at scene scale (~68k rows)
is ~2.4 ms — update-count-bound, the top non-kernel item of the forward
trace. This kernel replaces it with an MXU formulation:

  * rows are sorted by target slot (the host emits np.nonzero C-order,
    which IS slot order — see `presorted`; otherwise one XLA sort).
  * the grid runs one program per (batch, z)-plane; per-plane start/end
    row offsets arrive via scalar prefetch (computed with one
    vectorized searchsorted outside the kernel).
  * each batch of 128 updates becomes ONE [R,128]x[128,128] MXU
    contraction: out[r, c] += sum_u val_u * [r == r_u][c == c_u]
    expressed as M1^T @ D with M1[u, r] the row one-hot and
    D[u, c] = val_u * (column one-hot). Out-of-plane updates get r = -1
    (an all-zero one-hot row), so batches straddling plane boundaries
    need no special casing.

Cost: ~3 cycles/update vs ~35 ns/update for the XLA lowering — measured
end-to-end in BENCH_NOTES round 3. Falls back to the XLA scatter when
the plane size is not lane-aligned (see `supported_scatter`).

Replaces the same role as the reference's scn.InputLayer voxel->feature
insertion (/root/reference/torch/model.py:31).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def supported_scatter(Zp: int, Yp: int, xq: int, F: int) -> bool:
    """One grid program covers one (b, z)-plane of S = (Y+2)*xq*F slots;
    the VMEM accumulator is [S/128, 128], so S must be lane-aligned."""
    S = Yp * xq * F
    return S % LANES == 0 and S // LANES >= 1


def _kernel(offs_ref, idx_ref, val_ref, out_ref, *, R, S, nrow):
    p = pl.program_id(0)
    start = offs_ref[p]
    end = offs_ref[p + 1]
    base = p * S

    # updates stay along the LANE axis throughout (a [1,128]->[128,1]
    # reshape would be a lane->sublane transpose Mosaic handles poorly):
    #   M1[r, u] = [r == r_u]           (row one-hot per update)
    #   Dt[c, u] = val_u * [c == c_u]   (scaled column one-hot)
    #   out[r, c] += sum_u M1[r, u] Dt[c, u]   — one MXU contraction
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    b0 = start // LANES
    b1 = (end + LANES - 1) // LANES

    def body(bi, acc):
        idx = idx_ref[pl.ds(bi, 1), :]  # [1, 128]
        val = val_ref[pl.ds(bi, 1), :]
        ug = bi * LANES + iota_u  # [1, 128] global update ids
        local = idx - base
        ok = ((ug >= start) & (ug < end)
              & (local >= 0) & (local < S))  # [1, 128]
        r = jnp.where(ok, local // LANES, -1)
        c = local % LANES
        m1 = (r == iota_r).astype(jnp.float32)              # [R, 128]
        dt = jnp.where(c == iota_c, val, 0.0)               # [128, 128]
        # HIGHEST: the MXU's default bf16 passes would round the f32
        # values (one-hots are exact either way); the 3-pass f32
        # decomposition keeps the scatter bit-exact vs the XLA path
        upd = jax.lax.dot_general(
            m1, dt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [R, 128(c)]
        return acc + upd

    acc = jnp.zeros((R, LANES), jnp.float32)
    acc = jax.lax.fori_loop(b0, b1, body, acc)
    out_ref[0] = acc


def scatter_slots_folded(
    base_s: jax.Array,   # [cap] int32 target slot per row (huge = dropped)
    vals: jax.Array,     # [cap] f32
    nplanes: int,        # B * (Z+2)
    S: int,              # slots per plane = (Y+2) * xq * F
    presorted: bool = False,
) -> jax.Array:
    """Sum-scatter vals into a zero [nplanes * S] f32 buffer at base_s.

    Rows with base_s outside [0, nplanes*S) are dropped. ``presorted``
    skips the device sort when rows are already in ascending slot order
    (np.nonzero C-order inputs — SceneDataset / BatchLoader rows).
    Input voxels are unique, so sum == set.
    """
    assert S % LANES == 0, S
    R = S // LANES
    cap = base_s.shape[0]
    total = nplanes * S
    big = jnp.int32(2 ** 30)
    keys = jnp.where(
        (base_s >= 0) & (base_s < total), base_s, big
    )
    if presorted:
        skeys, svals = keys, vals.astype(jnp.float32)
    else:
        skeys, svals = jax.lax.sort(
            (keys, vals.astype(jnp.float32)), num_keys=1
        )
    nrow = (cap + LANES - 1) // LANES
    pad = nrow * LANES - cap
    if pad:
        skeys = jnp.pad(skeys, (0, pad), constant_values=2 ** 30)
        svals = jnp.pad(svals, (0, pad))
    skeys2 = skeys.reshape(nrow, LANES)
    svals2 = svals.reshape(nrow, LANES)
    # per-plane row ranges: one vectorized binary search
    bounds = (jnp.arange(nplanes + 1, dtype=jnp.int32) * S)
    offs = jnp.searchsorted(skeys, bounds).astype(jnp.int32)

    kernel = functools.partial(_kernel, R=R, S=S, nrow=nrow)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nplanes,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # idx rows
                pl.BlockSpec(memory_space=pltpu.VMEM),  # val rows
            ],
            out_specs=pl.BlockSpec(
                (1, R, LANES), lambda p, offs: (p, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((nplanes, R, LANES), jnp.float32),
    )(offs, skeys2, svals2)
    return out.reshape(total)

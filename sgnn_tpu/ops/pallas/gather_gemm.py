"""Pallas TPU kernel: fused neighbor-gather + tap GEMM for sparse conv.

The XLA path (ops/conv.py:gather_gemm) materializes the gathered
[cap, g*Cin] operand in HBM between the gather and each tap-group matmul.
This kernel keeps the whole feature table resident in VMEM and fuses the
gather with the MXU contraction per row-tile, so gathered activations
never round-trip through HBM.

Applicability: the table must fit in VMEM (~16 MB/core). With C=16 bf16
that is ~500k rows — every SG-NN train-chunk level and all but the
largest scene levels qualify; ops/conv.py falls back to the XLA path
otherwise (and when SGNN_TPU_PALLAS_GATHER is unset: the flag gates an
experimental fast path, selected per-call by table size).

STATUS (measured on TPU v5e via Mosaic in jax 0.9): Mosaic's gather
lowering only accepts `tpu.dynamic_gather` with input, indices and output
sharing one 2D shape (a lane-wise shuffle — see
jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule), so an arbitrary
row-gather from a VMEM table cannot be expressed efficiently yet. The
kernel is therefore OFF by default (correct under interpret mode, exercised
in tests) and the XLA path remains the production one. The dense-flow
execution mode (models/dense_flow.py) sidesteps gathers entirely and is
the fast path on TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step; multiple of the fp32 sublane tile (8) and big enough
# to amortize control overhead
_TILE = 512
_VMEM_TABLE_LIMIT = 12 * 1024 * 1024  # leave headroom under ~16 MB/core


def pallas_applicable(table_rows: int, cin: int, dtype) -> bool:
    if not os.environ.get("SGNN_TPU_PALLAS_GATHER"):
        return False
    bytes_ = table_rows * cin * jnp.dtype(dtype).itemsize
    return bytes_ <= _VMEM_TABLE_LIMIT


def _kernel(nbr_ref, table_ref, w_ref, out_ref, *, K, cin, accum_dtype):
    rows = nbr_ref[:]  # [TILE, K] int32 (row+1; 0 = zero row of table)
    tile = rows.shape[0]
    # Mosaic lowers gathers in take_along_axis form: indices shaped like
    # the output, gathering along axis 0 of the VMEM-resident table.
    idx = jnp.broadcast_to(rows.reshape(tile * K, 1), (tile * K, cin))
    gathered = jnp.take_along_axis(table_ref[:], idx, axis=0)
    lhs = gathered.reshape(tile, K * cin)
    out_ref[:] = jnp.dot(
        lhs, w_ref[:], preferred_element_type=accum_dtype
    ).astype(out_ref.dtype)


def gather_gemm_pallas(
    feats: jax.Array,  # [cap, Cin]
    nbr_rows: jax.Array,  # [cap, K] int32, row+1 (0 = missing)
    weight: jax.Array,  # [K, Cin, Cout]
    *,
    accum_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    cap, cin = feats.shape
    K, _, cout = weight.shape
    table = jnp.concatenate(
        [jnp.zeros((1, cin), feats.dtype), feats], axis=0
    )
    w2 = weight.reshape(K * cin, cout).astype(feats.dtype)
    tile = min(_TILE, cap)
    pad = (-cap) % tile
    if pad:
        nbr_rows = jnp.concatenate(
            [nbr_rows, jnp.zeros((pad, K), nbr_rows.dtype)], axis=0
        )
    grid = (nbr_rows.shape[0] // tile,)
    out = pl.pallas_call(
        functools.partial(_kernel, K=K, cin=cin, accum_dtype=accum_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full weight
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbr_rows.shape[0], cout),
                                       feats.dtype),
        interpret=interpret,
    )(nbr_rows, table, w2)
    return out[:cap]

"""sgnn_tpu: a TPU-native (JAX/XLA/Pallas) framework for sparse generative
3D scene completion, with the full capabilities of SG-NN (CVPR 2020).

Built from scratch for TPU: sparse submanifold convolutions run as
index-grid gathers feeding MXU-shaped GEMMs, dynamic sparsity is handled
with static-capacity coordinate lists + masked compaction, the dense
bottleneck uses XLA 3D convolutions, and data parallelism is expressed with
`jax.sharding.Mesh` + `shard_map`.

Layout:
    ops/       sparse-tensor core: coordinates, index grids, sparse convs, BN
    nn/        neural blocks: residual blocks, encoder layers, sparse U-Net
    models/    SG-NN generative model (encoder + refinement + surface pred)
    losses.py  hierarchical occupancy/SDF losses and metrics
    data/      .sdf/.sdfs/.knw binary formats, dataset, host prefetch
    parallel/  device mesh + sharded train/eval steps
    train/     train state, optimizer, checkpointing, loops
    meshing/   marching cubes (vectorized + native C++ core) and PLY export
    datagen/   TSDF fusion pipeline (depth -> .sdf/.knw volumes)
    utils/     checkpoint conversion from the reference, logging
"""

__version__ = "0.1.0"

from sgnn_tpu.ops.sparse import SparseTensor  # noqa: F401

"""Model/runtime configuration.

Mirrors the reference's GenModel hyperparameters (/root/reference/torch/
model.py:277 and train.py:21-58) plus the TPU-specific static-shape
settings (capacities, compute dtype) the XLA compilation model requires.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np


@dataclasses.dataclass(frozen=True)
class SGNNConfig:
    # --- architecture (reference names) ---
    encoder_dim: int = 8            # train.py --encoder_dim
    input_dim: tuple[int, int, int] = (128, 64, 64)  # zyx, train.py:62-71
    input_nf: int = 1
    nf_coarse: int = 16             # train.py --coarse_feat_dim
    nf: int = 16                    # train.py --refine_feat_dim
    num_hierarchy_levels: int = 4   # train.py --num_hierarchy_levels
    pass_occ: bool = True
    pass_feats: bool = True
    use_skip_sparse: bool = True
    use_skip_dense: bool = True
    truncation: float = 3.0

    # --- TPU static-shape settings ---
    batch_size: int = 8
    # Max active input voxels (whole batch). Defaults sized for 64x64x128
    # chunks; scene inference recomputes via `for_scene`.
    input_capacity: int = 0  # 0 = auto
    # Occupancy fraction caps per hierarchy level (coarse -> fine) used to
    # derive refinement capacities from full voxel counts.
    occupancy_fractions: tuple[float, ...] = (1.0, 0.5, 0.25, 0.125)
    # Explicit per-level capacity override (same order/length as
    # level_capacities). Serving uses this to recalibrate a shape bucket
    # from OBSERVED trained-model occupancy (SceneInferencer refit) —
    # the reference sizes everything dynamically per scene
    # (/root/reference/torch/model.py:233-246); static XLA shapes absorb
    # that via measured capacities instead. () = derive from fractions.
    level_capacity_override: tuple[int, ...] = ()
    compute_dtype: str = "float32"
    # sparse-conv execution backend: "gather" (index-grid gathers + GEMMs)
    # or "dense" (densify -> MXU conv -> gather); see ops/conv.py
    conv_backend: str = "gather"
    # model execution mode: "sparse" (coordinate lists, models/sgnn.py) or
    # "dense_flow" (masked dense grids end-to-end, models/dense_flow.py —
    # the fast path on TPU: no gathers/scatters/sorts in the train graph)
    execution: str = "sparse"
    # dense_flow inference only: route eligible 3^3 convs through the
    # lane-folded Pallas kernel (ops/pallas/conv3d_folded.py)
    use_pallas_conv: bool = False
    # int8 GEMMs in the folded 3^3 conv-site kernels (inference only;
    # approximate — dynamic per-tile activation scales, static per-column
    # weight scales). ~2x MXU rate on the dominant kernels at ~0.4% RMS
    # activation rounding error per conv.
    quantize_int8: bool = False
    # route only convs on volumes with at least this many voxels: below it
    # the kernel's fixed costs (fold reshape/pad at the XLA boundary, DMA
    # setup) outweigh its GEMM win (measured: tools/bench_kernel.py)
    pallas_min_voxels: int = 1_000_000
    # input rows arrive in (b, z, y, x) C-order with padding at the tail
    # (true for np.nonzero-derived dataset rows): lets the binned Pallas
    # input scatter skip its device sort (ops/pallas/scatter_folded.py)
    input_presorted: bool = False
    # folded training: fuse train-mode BN+ReLU into the conv-site Pallas
    # kernels (ops/folded.py:bn_conv_folded_train). False = the composed
    # [bn_folded -> subm_conv_folded_train] path (ablation/debug only)
    fuse_train_bn: bool = True

    def __post_init__(self):
        assert self.num_hierarchy_levels > 1, "must be > 1 (train.py:61)"
        object.__setattr__(self, "input_dim", tuple(int(d) for d in self.input_dim))
        f = 2 ** (self.num_hierarchy_levels - 1) * 4
        for d in self.input_dim:
            assert d % f == 0, (
                f"input_dim {self.input_dim} must be divisible by {f} "
                f"(hierarchy_factor*4, scene_dataloader.py:88)"
            )

    @cached_property
    def nf_per_level(self) -> list[int]:
        """Encoder feature widths per level (/root/reference/torch/model.py:286)."""
        L = self.num_hierarchy_levels
        if L > 2:
            return [
                int(self.encoder_dim * (1 + float(k) / (L - 2)))
                for k in range(L - 1)
            ]
        return [self.encoder_dim] * (L - 1)

    @cached_property
    def num_refine_levels(self) -> int:
        return self.num_hierarchy_levels - 1

    def level_spatial(self, h: int) -> tuple[int, int, int]:
        """Spatial size at hierarchy level h (0 = coarsest)."""
        f = 2 ** (self.num_hierarchy_levels - 1 - h)
        return tuple(d // f for d in self.input_dim)

    def level_voxels(self, h: int) -> int:
        z, y, x = self.level_spatial(h)
        return self.batch_size * z * y * x

    @cached_property
    def level_capacities(self) -> list[int]:
        """Static sparse capacities per hierarchy level (coarse -> fine)."""
        if self.level_capacity_override:
            assert len(self.level_capacity_override) == \
                self.num_hierarchy_levels
            return [int(c) for c in self.level_capacity_override]
        fr = list(self.occupancy_fractions)
        while len(fr) < self.num_hierarchy_levels:
            fr.append(fr[-1])
        caps = []
        for h in range(self.num_hierarchy_levels):
            cap = int(np.ceil(self.level_voxels(h) * fr[h]))
            caps.append(max(256, _round_up(cap, 128)))
        return caps

    @cached_property
    def input_cap(self) -> int:
        if self.input_capacity:
            return self.input_capacity
        return self.level_capacities[-1]

    def for_scene(self, scene_dim: tuple[int, int, int]) -> "SGNNConfig":
        """Config specialized to a (padded) whole-scene volume, batch 1."""
        return dataclasses.replace(
            self, input_dim=tuple(int(d) for d in scene_dim), batch_size=1
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m

"""Capacity autotuning for the sparse (coordinate-list) execution.

The sparse execution bounds every level's active-voxel set with a static
capacity (cfg.level_capacities, derived from cfg.occupancy_fractions) so
XLA shapes stay fixed; overflowing voxels are dropped and counted
(models/sgnn.py GenModelOutput.overflows). The reference never needed
this — SparseConvNet reallocates per batch (/root/reference/torch/
model.py:7) — so the fractions must come from DATA, not guesses.

``estimate_occupancy_fractions`` scans a sample of train chunks and
measures, per hierarchy level, the fraction of voxels whose target is
occupied (|sdf| < truncation — what a converged model's predictions
track), takes a high quantile across chunks, and applies a safety
margin. Wired to ``tools/train.py --autotune_capacity N``.
"""

from __future__ import annotations

import numpy as np


def chunk_level_occupancy(chunk, num_hierarchy_levels: int,
                          truncation: float) -> tuple[list, float]:
    """Per-level occupied fraction for one TrainChunk (coarse -> fine),
    plus the input's active fraction at full resolution."""
    hier = chunk.hierarchy
    if num_hierarchy_levels < 4:
        hier = hier[4 - num_hierarchy_levels:]
    fr = []
    for h in range(num_hierarchy_levels - 1):
        g = hier[h]
        fr.append(float((np.abs(g) < truncation).mean()))
    tgt = chunk.target_sdf
    fr.append(float((np.abs(tgt) < truncation).mean()))
    n_in = int((np.abs(chunk.input_sdf) < truncation).sum())
    return fr, n_in / float(tgt.size)


def estimate_occupancy_fractions(
    files,
    num_hierarchy_levels: int,
    truncation: float,
    sample: int = 64,
    quantile: float = 0.99,
    margin: float = 1.5,
    seed: int = 0,
) -> tuple[tuple, float]:
    """Returns (occupancy_fractions, input_fraction) for SGNNConfig.

    Scans up to ``sample`` random chunks; per level takes the ``quantile``
    across chunks of the occupied fraction and multiplies by ``margin``
    (capped at 1.0). The margin covers train-time predictions overshooting
    their targets; overflow counts remain observable either way
    (train loop warns on GenModelOutput.overflows > 0).
    """
    from sgnn_tpu.data import formats as F

    rng = np.random.RandomState(seed)
    files = list(files)
    if len(files) > sample:
        files = [files[i] for i in rng.choice(len(files), sample, False)]
    per_level = []
    inputs = []
    for f in files:
        try:
            c = F.load_train_file(f)
        except Exception:
            continue
        fr, fin = chunk_level_occupancy(c, num_hierarchy_levels, truncation)
        per_level.append(fr)
        inputs.append(fin)
    if not per_level:
        raise ValueError("no readable chunks to autotune from")
    a = np.asarray(per_level)  # [n, L]
    q = np.quantile(a, quantile, axis=0)
    fractions = tuple(float(min(1.0, v * margin)) for v in q)
    input_fraction = float(
        min(1.0, np.quantile(np.asarray(inputs), quantile) * margin)
    )
    return fractions, input_fraction

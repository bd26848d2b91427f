"""Learning dynamics: overfitting one synthetic chunk must reduce the loss.

This is the reference's own validation strategy (_OVERFIT mode,
/root/reference/torch/train.py:93-98) shrunk to a CI-sized problem.
"""

import numpy as np
import pytest

import jax

from sgnn_tpu import schedules as S
from sgnn_tpu.data import formats as F
from sgnn_tpu.data.dataset import SceneDataset, BatchLoader
from sgnn_tpu.train.loop import TrainOptions, Trainer


def _sphere_chunk(dims=(16, 16, 16), vs=0.02):
    Z, Y, X = dims
    z, y, x = np.meshgrid(*(np.arange(d) for d in dims), indexing="ij")
    d = np.sqrt((z - 8.0) ** 2 + (y - 8.0) ** 2 + (x - 8.0) ** 2) - 5.0
    target = np.where(np.abs(d) < 6.0, d, -np.inf).astype(np.float32)
    # input: partial observation (half the sphere)
    inp_mask = (np.abs(d) < 3.0) & (x < 8)
    locs = np.stack(np.nonzero(inp_mask), -1).astype(np.int32)
    vals = d[inp_mask].astype(np.float32)
    known = np.zeros(dims, np.uint8)
    hier = []
    cur = target
    for _ in range(3):
        from sgnn_tpu.datagen.chunking import downsample_tsdf_min_abs

        cur = downsample_tsdf_min_abs(cur)
        hier.append(cur)
    hier.reverse()
    return F.TrainChunk(
        locs, vals, target, dims, vs, np.eye(4, dtype=np.float32), known,
        hier,
    )


@pytest.mark.slow
def test_overfit_loss_decreases(tmp_path):
    p = str(tmp_path / "c.sdfs")
    F.save_train_file(p, _sphere_chunk())
    opts = TrainOptions(
        input_dim=(16, 16, 16),
        encoder_dim=4,
        coarse_feat_dim=8,
        refine_feat_dim=8,
        num_hierarchy_levels=3,
        num_iters_per_level=10_000,  # level 0 only: fast, still end-to-end
        batch_size=2,
        num_devices=1,
        lr=2e-3,
        occupancy_fractions=(1.0, 1.0, 1.0),
        use_loss_masking=False,  # overfit mode disables masking (train.py:96)
        save=str(tmp_path / "logs"),
    )
    trainer = Trainer(opts)
    trainer.epoch = 0
    ds = SceneDataset([p], truncation=3.0, num_hierarchy_levels=3,
                      num_overfit=64)
    loader = BatchLoader(ds, 2, trainer.cfg.input_cap, shuffle=False)
    losses = []
    it = iter(loader)
    for i, batch in enumerate(it):
        metrics, _ = trainer.run_step(batch)
        losses.append(float(metrics["loss"]))
        if i >= 24:
            break
    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert np.isfinite(losses).all()
    assert last < 0.7 * first, (first, last, losses)

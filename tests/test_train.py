"""End-to-end training smoke tests on the virtual CPU mesh."""

import os

import numpy as np
import pytest

import jax

from sgnn_tpu.data import formats as F
from sgnn_tpu.data.dataset import BatchLoader, SceneDataset
from sgnn_tpu.train import checkpoint as CK
from sgnn_tpu.train.loop import TrainOptions, Trainer


def _make_chunk(rng, dims=(16, 16, 16), vs=0.02):
    Z, Y, X = dims
    n = 80
    flat = rng.choice(Z * Y * X, size=n, replace=False)
    z, rem = flat // (Y * X), flat % (Y * X)
    y, x = rem // X, rem % X
    in_locs = np.stack([z, y, x], -1).astype(np.int32)
    in_sdf = (rng.randn(n)).astype(np.float32)
    target = np.full(dims, -np.inf, np.float32)
    target[z, y, x] = in_sdf
    known = (rng.rand(*dims) * 3).astype(np.uint8)
    hier = []
    for f in (8, 4, 2):
        hd = (Z // f, Y // f, X // f)
        g = np.full(hd, -np.inf, np.float32)
        m = rng.rand(*hd) > 0.4
        g[m] = rng.randn(int(m.sum())).astype(np.float32)
        hier.append(g)
    return F.TrainChunk(
        in_locs, in_sdf, target, dims, vs,
        np.eye(4, dtype=np.float32), known, hier,
    )


@pytest.fixture(scope="module")
def chunk_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("chunks")
    rng = np.random.RandomState(7)
    files = []
    for i in range(4):
        p = str(d / f"c{i}.sdfs")
        F.save_train_file(p, _make_chunk(rng))
        files.append(p)
    return files


def test_train_steps_and_checkpoint(chunk_files, tmp_path):
    opts = TrainOptions(
        input_dim=(16, 16, 16),
        encoder_dim=4,
        coarse_feat_dim=8,
        refine_feat_dim=8,
        num_hierarchy_levels=3,
        num_iters_per_level=1000,  # only level 0 active in this smoke test
        batch_size=2,
        max_epoch=1,
        lr=1e-3,
        num_devices=2,
        occupancy_fractions=(1.0, 1.0, 1.0),
        max_steps=3,
        log_every=1,
        ckpt_every=2,
        save=str(tmp_path / "logs"),
    )
    trainer = Trainer(opts)
    assert trainer.num_devices == 2
    ds = SceneDataset(chunk_files, 3.0, 3)
    loader = BatchLoader(
        ds, 2, trainer.cfg.input_cap * trainer.num_devices, shuffle=True
    )
    trainer.epoch = 0
    losses = []
    for i, batch in enumerate(loader):
        metrics, lw = trainer.run_step(batch, with_metrics=True)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert "iou" in metrics
        if i >= 1:
            break
    assert trainer.iteration == 2

    # checkpoint roundtrip
    ckpt = str(tmp_path / "state.ckpt")
    CK.save_checkpoint(ckpt, trainer.state, epoch=0, iteration=2)
    restored, meta = CK.load_checkpoint(ckpt, trainer.state)
    assert meta["iteration"] == 2
    a = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fit_writes_logs(chunk_files, tmp_path):
    opts = TrainOptions(
        input_dim=(16, 16, 16),
        encoder_dim=4,
        coarse_feat_dim=8,
        refine_feat_dim=8,
        num_hierarchy_levels=3,
        num_iters_per_level=1000,
        batch_size=2,
        max_epoch=1,
        num_devices=2,
        occupancy_fractions=(1.0, 1.0, 1.0),
        max_steps=2,
        log_every=1,
        ckpt_every=0,
        save=str(tmp_path / "logs"),
    )
    trainer = Trainer(opts)
    ds = SceneDataset(chunk_files, 3.0, 3)
    loader = BatchLoader(
        ds, 2, trainer.cfg.input_cap * trainer.num_devices, shuffle=True
    )
    trainer.fit(loader, val_loader=None, log_dir=opts.save)
    log = open(os.path.join(opts.save, "log.csv")).read().splitlines()
    assert log[0].startswith("epoch,iter,train_loss(total)")
    assert len(log) >= 2
    cks = [f for f in os.listdir(opts.save) if f.endswith(".ckpt")]
    assert cks  # per-epoch checkpoint


def test_auto_resume(chunk_files, tmp_path):
    from sgnn_tpu.train.loop import latest_checkpoint

    save = str(tmp_path / "logs")
    opts = TrainOptions(
        input_dim=(16, 16, 16), encoder_dim=4, coarse_feat_dim=8,
        refine_feat_dim=8, num_hierarchy_levels=3,
        num_iters_per_level=1000, batch_size=2, max_epoch=1, num_devices=2,
        occupancy_fractions=(1.0, 1.0, 1.0), max_steps=1, log_every=0,
        ckpt_every=0, save=save,
    )
    trainer = Trainer(opts)
    ds = SceneDataset(chunk_files, 3.0, 3)
    loader = BatchLoader(ds, 2, trainer.cfg.input_cap * 2)
    trainer.fit(loader, log_dir=save)
    assert latest_checkpoint(save) is not None
    # resume with --retrain auto
    opts2 = TrainOptions(**{**opts.__dict__, "retrain": "auto"})
    trainer2 = Trainer(opts2)
    assert trainer2.start_epoch == 1


def test_shard_files():
    from sgnn_tpu.data.dataset import shard_files

    files = [f"f{i}" for i in range(10)]
    shards = [shard_files(files, h, 4) for h in range(4)]
    assert sum(len(s) for s in shards) == 10
    assert set().union(*[set(s) for s in shards]) == set(files)
    assert all(
        not (set(a) & set(b))
        for i, a in enumerate(shards) for b in shards[i + 1:]
    )


@pytest.mark.slow
def test_fade_in_gating_transitions(chunk_files, tmp_path):
    """Drive the trainer across ALL level-gating variants (the fade-in
    schedule's recompile points): level 0 only -> +refine1 -> +refine2 ->
    +surface, in one run."""
    import numpy as np

    from sgnn_tpu import schedules as S

    opts = TrainOptions(
        input_dim=(16, 16, 16), encoder_dim=4, coarse_feat_dim=8,
        refine_feat_dim=8, num_hierarchy_levels=3,
        num_iters_per_level=2,  # gating changes every 2 steps
        batch_size=2, max_epoch=1, num_devices=1,
        occupancy_fractions=(1.0, 1.0, 1.0),
        execution="dense_flow",
        save=str(tmp_path / "logs"),
    )
    trainer = Trainer(opts)
    trainer.epoch = 0
    ds = SceneDataset(chunk_files, 3.0, 3, num_overfit=32)
    loader = BatchLoader(ds, 2, trainer.cfg.input_cap)
    seen = set()
    losses = []
    for i, batch in enumerate(loader):
        lw = S.get_loss_weights(trainer.iteration, 3, 2, 1.0)
        seen.add(S.active_levels(lw))
        metrics, _ = trainer.run_step(batch)
        losses.append(float(metrics["loss"]))
        if trainer.iteration >= 9:
            break
    assert np.isfinite(losses).all()
    # all four gating variants exercised
    assert (0, False) in seen and (1, False) in seen
    assert (2, False) in seen and (2, True) in seen
    assert len(trainer._steps) >= 4  # one compiled step per variant


def test_visualize_batch_dense_flow(chunk_files, tmp_path):
    """Per-epoch prediction dump in dense_flow execution writes meshes."""
    opts = TrainOptions(
        input_dim=(16, 16, 16), encoder_dim=4, coarse_feat_dim=8,
        refine_feat_dim=8, num_hierarchy_levels=3,
        num_iters_per_level=1000, batch_size=2, max_epoch=1, num_devices=1,
        occupancy_fractions=(1.0, 1.0, 1.0), execution="dense_flow",
        save=str(tmp_path / "logs"),
    )
    trainer = Trainer(opts)
    trainer.epoch = 0
    ds = SceneDataset(chunk_files, 3.0, 3)
    loader = BatchLoader(ds, 2, trainer.cfg.input_cap)
    batch = next(iter(loader))
    out_dir = str(tmp_path / "vis")
    trainer.visualize_batch(batch, out_dir)
    files = os.listdir(out_dir)
    assert any("input-mesh" in f for f in files), files


def test_orbax_async_checkpoint_roundtrip(tmp_path):
    """Orbax async backend: save returns before the write completes, wait()
    barriers, restore round-trips the TrainState exactly."""
    import jax.numpy as jnp

    from sgnn_tpu.train.checkpoint import OrbaxCheckpointer
    from sgnn_tpu.train.state import create_train_state

    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.zeros(4)}
    stats = {"bn": {"mean": jnp.ones(4), "var": jnp.full(4, 2.0)}}
    state = create_train_state(params, stats)
    ck = OrbaxCheckpointer()
    p = str(tmp_path / "ck1")
    ck.save(p, state, epoch=3, iteration=77)
    ck.wait()
    restored, meta = ck.load(p, jax.tree.map(jnp.zeros_like, state))
    assert meta == {"epoch": 3, "iteration": 77}
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(state),
        jax.tree_util.tree_leaves_with_path(restored),
    ):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ck.close()

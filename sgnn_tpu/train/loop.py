"""Training orchestration: epochs, schedules, logging, checkpoints.

Mirrors the reference train loop (/root/reference/torch/train.py:233-453):
Adam + StepLR halving, progressive level fade-in, IoU/L1 metrics every 20
iters, checkpoints every 2000 iters and every epoch, CSV logs. Adapted for
the jit world: steps are compiled per (active-levels, metrics) variant and
cached; the data loader shards batches across the mesh.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

import jax

from sgnn_tpu import schedules as S
from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.data.dataset import BatchLoader, SceneDataset
from sgnn_tpu.models import sgnn as M
from sgnn_tpu.parallel import mesh as PM
from sgnn_tpu.train import checkpoint as CK
from sgnn_tpu.train import step as TS
from sgnn_tpu.train.state import create_train_state


@dataclasses.dataclass
class TrainOptions:
    """CLI-compatible options (names follow train.py:21-58)."""
    data_path: str = ""
    train_file_list: str = ""
    val_file_list: str = ""
    save: str = "./logs"
    retrain: str = ""
    input_dim: tuple = (128, 64, 64)
    encoder_dim: int = 8
    coarse_feat_dim: int = 16
    refine_feat_dim: int = 16
    no_pass_occ: bool = False
    no_pass_feats: bool = False
    use_skip_sparse: int = 1
    use_skip_dense: int = 1
    logweight_target_sdf: bool = True
    num_hierarchy_levels: int = 4
    num_iters_per_level: int = 2000
    truncation: float = 3.0
    batch_size: int = 8
    start_epoch: int = 0
    max_epoch: int = 5
    save_epoch: int = 1
    lr: float = 1e-3
    decay_lr: int = 10
    weight_decay: float = 0.0
    weight_sdf_loss: float = 1.0
    weight_missing_geo: float = 5.0
    use_loss_masking: bool = True
    seed: int = 0
    num_devices: int = 0  # 0 = all
    input_capacity: int = 0
    occupancy_fractions: tuple = (1.0, 0.5, 0.25, 0.125)
    execution: str = "sparse"  # "sparse" | "dense_flow" | "folded"
    compute_dtype: str = "float32"
    # dtype float batch arrays are SHIPPED to the device in; bfloat16
    # halves H2D bytes (parallel/mesh.py:device_batch)
    transfer_dtype: str = "float32"
    # 0 = LR steps per epoch (StepLR); >0 = halve every N iterations
    # (train.py --scheduler_step_size)
    scheduler_step_size: int = 0
    max_steps: int = 0  # 0 = unlimited (for smoke tests/benchmarks)
    log_every: int = 20
    ckpt_every: int = 2000
    # "npz" (single-host, dependency-free) or "orbax" (async, multi-host
    # sharded writes — pod-scale; see train/checkpoint.py)
    ckpt_backend: str = "npz"
    # >0: when host RSS exceeds this many GiB, checkpoint and exit with
    # code 75 so a supervisor (tools/run_quality_train.sh) restarts the
    # process. The axon tunnel client retains every transferred byte
    # (tools/probe_transfer_leak.py: ~1 MB RSS per MB shipped, on every
    # transfer path, not reclaimable by gc/malloc_trim) — planned
    # rotation at a threshold beats an OOM kill mid-step. 0 = off.
    # Irrelevant on PCIe-attached hosts (no tunnel client).
    rss_restart_gb: float = 0.0
    # ship .sdfs targets as native sparse rows + bit-packed known and
    # densify on device (data/dataset.py:collate_sparse,
    # train/step.py:_densify_rows) — ~10x fewer H2D bytes than the dense
    # grids the reference transfers (train.py:256-261)
    sparse_targets: bool = False
    # folded execution: fuse train-mode BN into the conv-site kernels
    # (False = composed BN->conv, ablation only)
    fuse_train_bn: bool = True


class Trainer:
    def __init__(self, opts: TrainOptions):
        self.opts = opts
        mesh = PM.make_mesh(opts.num_devices or None)
        self.mesh = mesh
        self.num_devices = mesh.devices.size
        assert opts.batch_size % self.num_devices == 0
        self.cfg = SGNNConfig(
            encoder_dim=opts.encoder_dim,
            input_dim=tuple(opts.input_dim),
            input_nf=1,
            nf_coarse=opts.coarse_feat_dim,
            nf=opts.refine_feat_dim,
            num_hierarchy_levels=opts.num_hierarchy_levels,
            pass_occ=not opts.no_pass_occ,
            pass_feats=not opts.no_pass_feats,
            use_skip_sparse=bool(opts.use_skip_sparse),
            use_skip_dense=bool(opts.use_skip_dense),
            truncation=opts.truncation,
            batch_size=opts.batch_size // self.num_devices,
            input_capacity=opts.input_capacity,
            occupancy_fractions=tuple(opts.occupancy_fractions),
            execution=opts.execution,
            compute_dtype=opts.compute_dtype,
            fuse_train_bn=opts.fuse_train_bn,
        )
        key = jax.random.PRNGKey(opts.seed)
        params, stats = M.genmodel_init(key, self.cfg)
        self.state = create_train_state(params, stats, opts.weight_decay)
        self.start_epoch = opts.start_epoch
        self.iteration = 0
        self._orbax = None
        if opts.ckpt_backend == "orbax":
            self._orbax = CK.OrbaxCheckpointer()
        retrain = opts.retrain
        if retrain == "auto":
            retrain = latest_checkpoint(opts.save) or ""
        if retrain:
            self.state, meta = self._load_ckpt(retrain)
            self.start_epoch = (
                opts.start_epoch if opts.start_epoch != 0 else meta["epoch"]
            )
            self.iteration = meta.get("iteration", 0)
            print(f"loaded checkpoint {retrain} (epoch {self.start_epoch})")
        self._steps = {}
        self._eval_steps = {}

    # ------------------------------------------------------- checkpoint IO
    def _load_ckpt(self, path):
        if os.path.isdir(path):  # orbax layout
            ck = self._orbax or CK.OrbaxCheckpointer()
            return ck.load(path, self.state)
        return CK.load_checkpoint(path, self.state)

    def _save_ckpt(self, path, epoch):
        if self._orbax is not None:
            # async: serialization overlaps the following train steps
            self._orbax.save(
                path, self.state, epoch=epoch, iteration=self.iteration
            )
        else:
            CK.save_checkpoint(
                path, self.state, epoch=epoch, iteration=self.iteration
            )

    # ---------------------------------------------------------- step cache
    def _train_step(self, n_active, do_surf, with_metrics):
        key = (n_active, do_surf, with_metrics)
        if key not in self._steps:
            self._steps[key] = TS.make_train_step(
                self.cfg, self.mesh,
                num_refine_active=n_active, do_surf=do_surf,
                use_log_transform=self.opts.logweight_target_sdf,
                weight_missing_geo=self.opts.weight_missing_geo,
                use_loss_masking=self.opts.use_loss_masking,
                weight_decay=self.opts.weight_decay,
                with_metrics=with_metrics,
                sparse_targets=self.opts.sparse_targets,
            )
        return self._steps[key]

    def _eval_step(self, n_active, do_surf):
        key = (n_active, do_surf)
        if key not in self._eval_steps:
            self._eval_steps[key] = TS.make_eval_step(
                self.cfg, self.mesh,
                num_refine_active=n_active, do_surf=do_surf,
                use_log_transform=self.opts.logweight_target_sdf,
                weight_missing_geo=self.opts.weight_missing_geo,
                use_loss_masking=self.opts.use_loss_masking,
                sparse_targets=self.opts.sparse_targets,
            )
        return self._eval_steps[key]

    # -------------------------------------------------------- visualization
    def visualize_batch(self, batch, out_dir):
        """Dump input/pred/target meshes + per-level occupancy point clouds
        for one batch (reference per-epoch vis, train.py:307-319)."""
        import jax
        import jax.numpy as jnp

        from sgnn_tpu.meshing.export import save_predictions
        from sgnn_tpu.models import sgnn as MM
        from sgnn_tpu.ops.sparse import make_sparse

        cfg = self.cfg
        if "sdf" not in batch and "target_locs" in batch:
            # sparse-target batch: reconstruct the dense target grid on
            # host for the vis dump only (tiny, once per epoch)
            batch = dict(batch)
            tn = int(batch["target_num_valid"])
            tl = batch["target_locs"][:tn]
            tv = batch["target_vals"][:tn]
            Bf = int(batch["known_unk"].shape[0])
            sdf = np.full((Bf,) + tuple(cfg.input_dim), -np.inf, np.float32)
            if "target_pos" in batch:
                # +saturated voxels ship as a bit plane (dataset.py:
                # _get_chunk_sparse); rebuild them as +truncation first
                nvox = int(np.prod(cfg.input_dim))
                pos = np.unpackbits(
                    batch["target_pos"].reshape(Bf, -1), axis=1,
                    bitorder="little",
                )[:, :nvox].reshape(sdf.shape)
                sdf[pos > 0] = self.opts.truncation
            sdf[tl[:, 3], tl[:, 0], tl[:, 1], tl[:, 2]] = tv
            batch["sdf"] = sdf
        n = int(batch["input_num_valid"])
        # single-device forward on the first cfg.batch_size samples
        B = cfg.batch_size
        mask = batch["input_locs"][:n, 3] < B
        locs = np.full((cfg.input_cap, 4), -1, np.int32)
        feats = np.zeros((cfg.input_cap, 1), np.float32)
        k = min(int(mask.sum()), cfg.input_cap)
        locs[:k] = batch["input_locs"][:n][mask][:k]
        feats[:k] = batch["input_sdf"][:n][mask][:k]
        st = make_sparse(locs, feats, k, cfg.input_dim, B)
        dims = cfg.input_dim
        names = batch.get("names", [str(i) for i in range(B)])
        if cfg.execution in ("dense_flow", "folded"):
            from sgnn_tpu.models import dense_flow as DFM

            out, _ = DFM.genmodel_apply_dense(
                self.state.params, self.state.stats, cfg, st,
                num_refine_active=cfg.num_refine_levels, do_surf=True,
                training=False,
            )
            out = jax.device_get(out)
            for b in range(B):
                name = names[b] if b < len(names) else str(b)
                sel = locs[:k, 3] == b
                pred_occs = []
                for grid, mask in zip(out.refine_outs,
                                      out.refine_masks_unfilt):
                    m = np.asarray(mask[b]) & (
                        1 / (1 + np.exp(
                            -np.asarray(grid[b][..., 0], np.float64)
                        )) > 0.5
                    )
                    pred_occs.append(
                        np.stack(np.nonzero(m), -1).astype(np.int32)
                    )
                sm = np.asarray(out.surf_mask[b])
                sl = np.stack(np.nonzero(sm), -1).astype(np.int32)
                sv = np.asarray(out.surf_sdf[b])[sm]
                save_predictions(
                    out_dir, name, locs[:k][sel][:, :3],
                    feats[:k][sel][:, 0], dims,
                    target_for_sdf=batch["sdf"][b] if "sdf" in batch else None,
                    target_for_occs=None,
                    pred_surf=(sl, sv) if len(sl) else None,
                    pred_occ_locs=pred_occs if pred_occs else None,
                    truncation=self.opts.truncation,
                )
            return
        out, _ = MM.genmodel_apply(
            self.state.params, self.state.stats, cfg, st,
            num_refine_active=cfg.num_refine_levels, do_surf=True,
            training=False,
        )
        out = jax.device_get(out)
        sn = int(out.surf_num_valid)
        slocs = np.asarray(out.surf_locs[:sn])
        ssdf = np.asarray(out.surf_sdf[:sn, 0])
        for b in range(B):
            name = names[b] if b < len(names) else str(b)
            im = locs[:k][locs[:k, 3] == b]
            iv = feats[:k][locs[:k, 3] == b][:, 0]
            pred_occs = []
            for locs_u, out_u, num_u in out.refine_outs:
                nu = int(num_u)
                lu = np.asarray(locs_u[:nu])
                ou = np.asarray(out_u[:nu])
                m = (lu[:, 3] == b) & (
                    1 / (1 + np.exp(-ou[:, 0].astype(np.float64))) > 0.5
                )
                pred_occs.append(lu[m][:, :3])
            sm = slocs[:, 3] == b if sn else np.zeros(0, bool)
            save_predictions(
                out_dir, name, im[:, :3], iv, dims,
                target_for_sdf=batch["sdf"][b] if "sdf" in batch else None,
                target_for_occs=None,
                pred_surf=(slocs[sm][:, :3], ssdf[sm]) if sn else None,
                pred_occ_locs=pred_occs if pred_occs else None,
                truncation=self.opts.truncation,
            )

    # ------------------------------------------------------------- training
    def device_transform(self, batch):
        """BatchLoader ``transform``: per-device re-collation in the worker
        thread, off the step critical path (parallel/mesh.py:device_batch)."""
        batch["_device"] = PM.device_batch(
            batch, self.num_devices,
            transfer_dtype=self.opts.transfer_dtype,
        )
        return batch

    def _prefetch(self, loader, size: int = 2):
        """Yield (raw_batch, device-resident batch), keeping ``size``
        async H2D transfers in flight ahead of the consuming step."""
        from collections import deque

        buf = deque()
        for b in loader:
            d = b.get("_device")
            if d is None:
                d = PM.device_batch(
                    b, self.num_devices,
                    transfer_dtype=self.opts.transfer_dtype,
                )
            buf.append((b, PM.put_device_batch(d, self.mesh)))
            if len(buf) >= size:
                yield buf.popleft()
        while buf:
            yield buf.popleft()

    def run_step(self, batch, with_metrics=False, dev_batch=None):
        """One optimization step on a collated global batch."""
        opts = self.opts
        lw = S.get_loss_weights(
            self.iteration, opts.num_hierarchy_levels,
            opts.num_iters_per_level, opts.weight_sdf_loss,
        )
        n_active, do_surf = S.active_levels(lw)
        if opts.scheduler_step_size > 0:
            lr = S.step_lr(opts.lr, self.iteration, opts.scheduler_step_size)
        else:
            lr = S.step_lr(opts.lr, self.epoch, opts.decay_lr)
        if dev_batch is None:
            dev_batch = batch.get("_device")
        if dev_batch is None:
            dev_batch = PM.device_batch(
                batch, self.num_devices,
                transfer_dtype=self.opts.transfer_dtype,
            )
        step = self._train_step(n_active, do_surf, with_metrics)
        self.state, metrics = step(
            self.state, dev_batch, lw.astype(np.float32), np.float32(lr)
        )
        self.iteration += 1
        return metrics, lw

    def fit(self, train_loader, val_loader=None, log_dir=None):
        opts = self.opts
        log_dir = log_dir or opts.save
        os.makedirs(log_dir, exist_ok=True)
        log_path = os.path.join(log_dir, "log.csv")
        log_val_path = os.path.join(log_dir, "log_val.csv")
        L = opts.num_hierarchy_levels
        headers = ["epoch", "iter", "train_loss(total)"]
        headers += [f"train_loss({h})" for h in range(L)]
        headers += ["train_loss(sdf)", "train_l1-pred", "train_l1-tgt"]
        headers += [f"train_iou({h})" for h in range(L)] + ["time"]
        # On checkpoint resume (--retrain), append to the existing CSVs
        # instead of truncating the earlier epochs' history. Resume keys
        # on checkpoint presence (a mid-epoch iter ckpt leaves start_epoch
        # at 0 but should still append), and only appends when the
        # existing header matches the current config's schema — a resume
        # with e.g. a different num_hierarchy_levels rotates the old file
        # aside instead of silently appending misaligned rows.
        resume = self.iteration > 0 or self.start_epoch > 0
        log_f = _open_log(log_path, headers, resume)
        val_f = None
        if val_loader is not None:
            # matches the row validate() writes (one row per epoch)
            vh = ["epoch", "iter", "val_loss(total)"]
            vh += [f"val_iou({h})" for h in range(L)]
            vh += ["val_l1-pred", "val_l1-tgt"]
            val_f = _open_log(log_val_path, vh, resume)

        done = False
        for epoch in range(self.start_epoch, opts.max_epoch):
            self.epoch = epoch
            start = time.time()
            accum = _MetricAccum(L)
            vis_batch = None
            num_batches = len(train_loader)
            t = -1
            for batch, dev in self._prefetch(train_loader):
                t += 1
                if (
                    opts.save_epoch
                    and epoch % opts.save_epoch == 0
                    and t + 2 == num_batches
                ):
                    vis_batch = batch  # 2nd-to-last batch (train.py:270)
                with_metrics = (
                    opts.log_every > 0
                    and (self.iteration % opts.log_every) == 0
                )
                metrics, lw = self.run_step(batch, with_metrics, dev_batch=dev)
                # only force the device->host sync on the log cadence
                ovf = (
                    int(metrics.get("overflow", 0)) if with_metrics else 0
                )
                tovf = batch.get("target_overflow", 0)
                if tovf > 0:
                    print(
                        f"[capacity] WARNING iter {self.iteration}: "
                        f"{tovf} target/hierarchy rows dropped at collate "
                        f"(raise target/hier capacities)"
                    )
                if ovf > 0:
                    # sparse-execution capacity overflow: voxels dropped at
                    # a compaction. Raise occupancy_fractions (or use
                    # tools/train.py --autotune_capacity).
                    print(
                        f"[capacity] WARNING iter {self.iteration}: "
                        f"{ovf} voxels overflowed a level capacity"
                    )
                accum.add(metrics, with_metrics)
                if opts.log_every > 0 and self.iteration % opts.log_every == 0:
                    took = time.time() - start
                    row = accum.row(epoch, self.iteration, took)
                    log_f.write(",".join(str(v) for v in row) + "\n")
                    log_f.flush()
                    print(
                        f"epoch {epoch} iter {self.iteration} "
                        f"loss {float(metrics['loss']):.6f} "
                        f"lw {np.array2string(lw, precision=2)} "
                        f"({took:.1f}s, rss {_rss_gb():.2f}G)",
                        file=sys.stdout,
                    )
                if opts.ckpt_every and self.iteration % opts.ckpt_every == 0:
                    self._save_ckpt(
                        os.path.join(
                            log_dir,
                            f"model-iter{self.iteration}-epoch{epoch}.ckpt",
                        ),
                        epoch,
                    )
                if (
                    opts.rss_restart_gb > 0
                    and self.iteration % 50 == 0
                    and _rss_gb() > opts.rss_restart_gb
                ):
                    path = os.path.join(
                        log_dir,
                        f"model-iter{self.iteration}-epoch{epoch}.ckpt",
                    )
                    self._save_ckpt(path, epoch)
                    if self._orbax is not None:
                        self._orbax.wait()
                    print(
                        f"[rss-rotate] host RSS {_rss_gb():.1f} GiB > "
                        f"{opts.rss_restart_gb} GiB (tunnel-client "
                        f"retention); checkpointed {path}, exiting 75 "
                        f"for supervised restart"
                    )
                    log_f.flush()
                    sys.exit(75)
                if opts.max_steps and self.iteration >= opts.max_steps:
                    done = True
                    break
            if vis_batch is not None:
                lw = S.get_loss_weights(
                    self.iteration, opts.num_hierarchy_levels,
                    opts.num_iters_per_level, opts.weight_sdf_loss,
                )
                if S.active_levels(lw) == (
                    opts.num_hierarchy_levels - 1, True
                ):
                    try:
                        self.visualize_batch(
                            vis_batch,
                            os.path.join(
                                log_dir,
                                f"iter{self.iteration}-epoch{epoch}", "train",
                            ),
                        )
                    except Exception as e:
                        print(f"[vis] skipped: {e}")
            if val_loader is not None and not done:
                self.validate(val_loader, val_f, epoch)
            self._save_ckpt(
                os.path.join(log_dir, f"model-epoch-{epoch}.ckpt"),
                epoch + 1,
            )
            if done:
                break
        if self._orbax is not None:
            self._orbax.wait()
        log_f.close()
        if val_f:
            val_f.close()

    def validate(self, val_loader, val_f=None, epoch=0):
        opts = self.opts
        lw = S.get_loss_weights(
            self.iteration, opts.num_hierarchy_levels,
            opts.num_iters_per_level, opts.weight_sdf_loss,
        )
        n_active, do_surf = S.active_levels(lw)
        step = self._eval_step(n_active, do_surf)
        losses, ious, l1p, l1t = [], [], [], []
        for batch, dev_batch in self._prefetch(val_loader):
            m = step(self.state, dev_batch, lw.astype(np.float32))
            losses.append(float(m["loss"]))
            ious.append(np.asarray(m["iou"]))
            l1p.append(float(m["l1pred"]))
            l1t.append(float(m["l1tgt"]))
        result = {
            "loss": float(np.mean(losses)) if losses else -1,
            "iou": np.mean(np.stack(ious), 0).tolist() if ious else [],
            "l1pred": _mean_valid(l1p),
            "l1tgt": _mean_valid(l1t),
        }
        if val_f:
            val_f.write(
                f"{epoch},{self.iteration},{result['loss']},"
                + ",".join(str(v) for v in result["iou"])
                + f",{result['l1pred']},{result['l1tgt']}\n"
            )
            val_f.flush()
        print(f"[val] epoch {epoch}: {result}")
        return result

    epoch: int = 0


def _open_log(path, headers, resume):
    """Open a CSV log: append on resume iff the existing header matches
    the current schema; otherwise rotate the stale file to ``.old`` and
    start fresh (never silently mix column layouts)."""
    header = ",".join(headers)
    if resume and os.path.exists(path):
        with open(path) as f:
            existing = f.readline().rstrip("\n")
        if existing == header:
            return open(path, "a")
        os.replace(path, path + ".old")
        print(
            f"[log] header mismatch in {path} (schema changed); "
            f"rotated old file to {path}.old"
        )
    f = open(path, "w")
    f.write(header + "\n")
    return f


def latest_checkpoint(save_dir):
    """Newest .ckpt in a run directory (--retrain auto: elastic resume)."""
    if not os.path.isdir(save_dir):
        return None
    cks = [
        os.path.join(save_dir, f)
        for f in os.listdir(save_dir)
        if f.endswith(".ckpt")
    ]
    return max(cks, key=os.path.getmtime) if cks else None


def _mean_valid(vals):
    a = np.asarray(vals)
    a = a[a >= 0]
    return float(a.mean()) if len(a) else -1.0


def _rss_gb() -> float:
    """Resident set size of this process in GiB (host-leak telemetry)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 2**30
    except Exception:
        return -1.0


class _MetricAccum:
    def __init__(self, num_levels):
        self.L = num_levels
        self.losses = [[] for _ in range(num_levels + 2)]
        self.ious = [[] for _ in range(num_levels)]
        self.l1pred = []
        self.l1tgt = []

    def add(self, metrics, with_metrics):
        self.losses[0].append(float(metrics["loss"]))
        per = np.asarray(metrics["per_level"])
        for h in range(self.L):
            self.losses[h + 1].append(float(per[h]))
        self.losses[-1].append(float(per[-1]))
        if with_metrics and "iou" in metrics:
            iou = np.asarray(metrics["iou"])
            for h in range(self.L):
                self.ious[h].append(float(iou[h]))
            self.l1pred.append(float(metrics["l1pred"]))
            self.l1tgt.append(float(metrics["l1tgt"]))

    def row(self, epoch, iteration, took):
        row = [epoch, iteration]
        row += [_mean_valid(x) for x in self.losses]
        row += [_mean_valid(self.l1pred), _mean_valid(self.l1tgt)]
        row += [_mean_valid(x) for x in self.ious]
        row += [took]
        return row

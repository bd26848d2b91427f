"""Whole-scene inference: fully-convolutional scene completion.

The reference mutates SparseConvNet spatial sizes per scene
(model.update_sizes, /root/reference/torch/model.py:357-369, test_scene.py:
77-78). Under XLA, shapes are compile-time: the inferencer specializes the
jitted forward per padded scene shape and caches executables — scenes are
already padded to a shape grid by the dataset (pad-to-multiple-of-32 by
default, scene_dataloader.py:88-93), and `dim_round` can coarsen the grid
to trade padding FLOPs for fewer compiles.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sgnn_tpu.config import SGNNConfig
from sgnn_tpu.models import sgnn as M
from sgnn_tpu.ops.sparse import make_sparse


class SceneInferencer:
    def __init__(self, cfg_base: SGNNConfig, params, stats):
        self.cfg_base = cfg_base
        self.params = params
        self.stats = stats
        self._cache = {}

    def _get_fn(self, dims: tuple[int, int, int]):
        if dims not in self._cache:
            cfg = self.cfg_base.for_scene(dims)
            if cfg.execution in ("dense_flow", "folded") and (
                jax.default_backend() == "tpu"
            ):
                # folded lane-dense execution (models/folded_flow.py):
                # the TPU fast path; needs the Mosaic compiler
                from sgnn_tpu.models import folded_flow as FF

                def fn(params, stats, locs, feats, num_valid):
                    st = make_sparse(
                        locs, feats, num_valid, cfg.input_dim, 1
                    )
                    return FF.genmodel_apply_folded(
                        params, stats, cfg, st,
                        num_refine_active=cfg.num_refine_levels,
                        do_surf=True,
                    )
            elif cfg.execution in ("dense_flow", "folded"):
                from sgnn_tpu.models import dense_flow as DF

                def fn(params, stats, locs, feats, num_valid):
                    st = make_sparse(
                        locs, feats, num_valid, cfg.input_dim, 1
                    )
                    out, _ = DF.genmodel_apply_dense(
                        params, stats, cfg, st,
                        num_refine_active=cfg.num_refine_levels,
                        do_surf=True, training=False,
                    )
                    return out
            else:
                def fn(params, stats, locs, feats, num_valid):
                    st = make_sparse(
                        locs, feats, num_valid, cfg.input_dim, 1
                    )
                    out, _ = M.genmodel_apply(
                        params, stats, cfg, st,
                        num_refine_active=cfg.num_refine_levels,
                        do_surf=True, training=False,
                    )
                    return out

            self._cache[dims] = (jax.jit(fn), cfg)
        return self._cache[dims]

    def __call__(self, sample: dict) -> dict:
        """Run one scene sample (from SceneDataset scene mode).

        Returns numpy dict: surf_locs [N,3] (zyx, padding removed by
        orig_dims like test_scene.py:88-95), surf_sdf [N], per-level
        outputs (locs, occ/sdf), input locs/vals (unpadded), names.
        """
        dims = tuple(int(d) for d in sample["sdf"].shape)
        fn, cfg = self._get_fn(dims)
        cap = cfg.input_cap
        locs3 = sample["input_locs"]
        n = min(len(locs3), cap)
        locs = np.full((cap, 4), -1, np.int32)
        locs[:n, :3] = locs3[:n]
        locs[:n, 3] = 0
        feats = np.zeros((cap, 1), np.float32)
        feats[:n, 0] = sample["input_sdf"][:n]
        out = fn(
            self.params, self.stats, jnp.asarray(locs), jnp.asarray(feats),
            jnp.int32(n),
        )
        out = jax.device_get(out)
        orig = np.asarray(sample["orig_dims"])
        if cfg.execution in ("dense_flow", "folded"):
            return self._postprocess_dense(sample, out, orig, locs3, n)

        def unpad(locs_arr, num_valid, *vals):
            k = int(num_valid)
            l = np.asarray(locs_arr[:k, :3])
            m = (l[:, 0] < orig[0]) & (l[:, 1] < orig[1]) & (l[:, 2] < orig[2])
            return (l[m],) + tuple(np.asarray(v[:k])[m] for v in vals)

        surf_locs, surf_sdf = unpad(
            out.surf_locs, out.surf_num_valid, np.asarray(out.surf_sdf)[:, 0]
        )
        levels = []
        # level 0 dense coarse -> sparse-style (all voxels), scaled dims
        co = np.asarray(out.coarse_out)[0]  # [z8,y8,x8,2]
        levels.append({"dense_out": co})
        for locs_u, out_u, num_u in out.refine_outs:
            l, o = unpad_level = unpad(locs_u, num_u, np.asarray(out_u))
            levels.append({"locs": l, "out": o})

        in_locs = locs3[:n]
        m = (
            (in_locs[:, 0] < orig[0])
            & (in_locs[:, 1] < orig[1])
            & (in_locs[:, 2] < orig[2])
        )
        return {
            "name": sample["name"],
            "surf_locs": surf_locs,
            "surf_sdf": surf_sdf,
            "levels": levels,
            "input_locs": in_locs[m],
            "input_sdf": sample["input_sdf"][:n][m],
            "orig_dims": orig,
            "world2grid": sample["world2grid"],
        }

    def _postprocess_dense(self, sample, out, orig, locs3, n):
        """Host-side sparse extraction from DenseFlowOutput (no capacity
        limits: np.nonzero on the final masks)."""
        def unpad_mask(mask):
            m = np.asarray(mask[0]).copy()
            m[orig[0]:, :, :] = False
            m[:, orig[1]:, :] = False
            m[:, :, orig[2]:] = False
            return m

        sm = unpad_mask(out.surf_mask)
        z, y, x = np.nonzero(sm)
        surf_locs = np.stack([z, y, x], -1).astype(np.int32)
        surf_sdf = np.asarray(out.surf_sdf[0])[z, y, x]
        levels = [{"dense_out": np.asarray(out.coarse_out)[0]}]
        for grid, mask in zip(out.refine_outs, out.refine_masks_unfilt):
            mm = np.asarray(mask[0])
            zz, yy, xx = np.nonzero(mm)
            levels.append({
                "locs": np.stack([zz, yy, xx], -1).astype(np.int32),
                "out": np.asarray(grid[0])[zz, yy, xx],
            })
        in_locs = locs3[:n]
        m = (
            (in_locs[:, 0] < orig[0])
            & (in_locs[:, 1] < orig[1])
            & (in_locs[:, 2] < orig[2])
        )
        return {
            "name": sample["name"],
            "surf_locs": surf_locs,
            "surf_sdf": surf_sdf,
            "levels": levels,
            "input_locs": in_locs[m],
            "input_sdf": sample["input_sdf"][:n][m],
            "orig_dims": orig,
            "world2grid": sample["world2grid"],
        }

"""Analytic roofline floors for the folded inference forward.

Wraps the ops.folded entry points that models/folded_flow.py calls,
records every fused-kernel call's operand shapes via jax.eval_shape
(CPU — no device, no compile), and prices each site against TPU v5e
peaks:

  HBM floor : every operand read once + every output written once,
              at 819 GB/s;
  MXU floor : the kernel's ACTUAL GEMM schedule (not dense-equivalent
              FLOPs — the folded kernels issue [rows,128]x[128,{128,256}]
              GEMMs whose count is fixed by the layout, see the per-
              family formulas below) at 197 TFLOP/s bf16 / 394 TOP/s int8;
  floor     : max(HBM, MXU) per call.

GEMM schedules (from ops/pallas/conv3d_folded.py kernel bodies):
  conv-site   18 GEMMs [rows,128]x[128,128] per group
              (9 (dz,dy) taps x {main, carry}), rows = B*Z*Y*xq
  downconv    4 parity x {conv, mask-down} GEMMs [rows_c, lw]x[lw,128],
              lw = 256 (same-cpad, block-pair lhs) or 128 (cross-cpad)
  upconv      2x2 parity x 2x2 (ez,ey) x {main, carry} = 32 GEMMs
              [rows_c,128]x[128,256] per group (+1 coarse-mask dup GEMM
              when the fine mask is expanded in-register)
  head-site   {mask-dup (fm_scale=2), head, occ-gate} GEMMs
              [rows,128]x[128,128]
  surf-ms     per group: 1 head GEMM at native rows + one x-dup GEMM
              [rows,128]x[128,128] per doubling step of the in-register
              NN expansion
  scatter     128 sorted rows per [R,128]x[128,128] one-hot GEMM
              (binned input scatter, ops/pallas/scatter_folded.py)

The measured counterpart is the device trace (tools/trace_forward.py +
trace_summary.py); BENCH_NOTES pairs the two into the per-site roofline
table VERDICT r3/r4 asked for. Run with JAX_PLATFORMS=cpu.

Usage: python tools/roofline.py [--int8] [--dims 96 192 192]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# TPU v5e (lite) peaks
HBM_BPS = 819e9
MXU_BF16 = 197e12
MXU_INT8 = 394e12

CALLS = []


def _nbytes(x):
    return math.prod(x.shape) * x.dtype.itemsize


def _grid_rows(data):
    B, Zp, Yp, xq, _ = data.shape
    return B * (Zp - 2) * (Yp - 2) * xq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--dims", type=int, nargs=3, default=(96, 192, 192))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_sparse_input
    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.models import folded_flow as FF
    from sgnn_tpu.models import sgnn as M
    from sgnn_tpu.ops import folded as FO
    from sgnn_tpu.ops.sparse import make_sparse

    mxu_bps = MXU_INT8 if args.int8 else MXU_BF16

    def rec(family, flops, rbytes, wbytes):
        CALLS.append(
            dict(family=family, flops=flops, rb=rbytes, wb=wbytes)
        )

    orig = {}

    def wrap(mod, name, fn):
        orig[name] = getattr(mod, name)
        setattr(mod, name, fn)

    def conv_site(groups, fm, w27, cout, **kw):
        rows = _grid_rows(groups[0].data)
        flops = len(groups) * 18 * 2 * rows * 128 * 128
        rb = sum(_nbytes(g.data) for g in groups) + _nbytes(fm.data)
        if kw.get("residual") is not None:
            rb += _nbytes(kw["residual"].data)
        out = orig["subm_conv_fused"](groups, fm, w27, cout, **kw)
        rec("conv-site", flops, rb, _nbytes(out.data))
        return out

    def downconv(fg, fm, w8, cout, **kw):
        B, Zfp, Yfp, xqf, _ = fg.data.shape
        cross = (
            kw.get("cpad_out") is not None
            and kw["cpad_out"] != fg.cpad
        )
        lw = 128 if cross else 256
        nb = xqf if cross else xqf // 2
        rows_c = B * (Zfp - 2) // 2 * (Yfp - 2) // 2 * nb
        flops = 4 * 2 * 2 * rows_c * lw * 128
        rb = _nbytes(fg.data) + _nbytes(fm.data)
        out, om = orig["downconv_fused"](fg, fm, w8, cout, **kw)
        rec("downconv", flops, rb, _nbytes(out.data) + _nbytes(om.data))
        return out, om

    def upconv(groups, cfm, ffm, w27, cout, **kw):
        rows_c = _grid_rows(groups[0].data)
        flops = len(groups) * 32 * 2 * rows_c * 128 * 256
        if ffm is None:
            flops += 2 * rows_c * 128 * 256
        rb = sum(_nbytes(g.data) for g in groups) + _nbytes(cfm.data)
        if ffm is not None:
            rb += _nbytes(ffm.data)
        out = orig["upconv_fused"](groups, cfm, ffm, w27, cout, **kw)
        rec("upconv", flops, rb, _nbytes(out.data))
        return out

    def head_site(up, fm, bn_params, bn_stats, W2, b2, **kw):
        rows = _grid_rows(up.data)
        ngemm = 2 + (1 if kw.get("fm_scale", 1) == 2 else 0)
        flops = ngemm * 2 * rows * 128 * 128
        rb = _nbytes(up.data) + _nbytes(fm.data)
        outs = orig["head_site_fused"](
            up, fm, bn_params, bn_stats, W2, b2, **kw
        )
        wb = sum(_nbytes(o.data) for o in outs if o is not None)
        rec("head-site", flops, rb, wb)
        return outs

    def surf_packed(groups, fm, bn_params, bn_stats, W, bias, **kw):
        B, Zp, Yp, xq, _ = fm.data.shape
        Z, Y = Zp - 2, Yp - 2
        flops, rb = 0, _nbytes(fm.data)
        for g, s in groups:
            rb += _nbytes(g.data)
            tzc, tyc = Z // s, Y // s
            xb = -(-xq // s)
            flops += 2 * (tzc * tyc * xb) * 128 * 128  # head GEMM
            for _ in range(s.bit_length() - 1):       # x-dup per step
                flops += 2 * (tzc * tyc * xb) * 128 * 128
                xb *= 2
                tzc *= 2
                tyc *= 2
        # kernel writes the full-res f32 grid interior; the two unfolds
        # downstream re-read it + the mask (counted as this site's cost)
        wb = B * Zp * Yp * xq * 128 * 4
        rec("surf-head-ms", flops, rb + wb, wb // 2)  # unfold reads
        return orig["surf_head_packed"](
            groups, fm, bn_params, bn_stats, W, bias, **kw
        )

    def scatter(locs, feats, num_valid, dims, batch_size, cpad=16,
                **kw):
        cap = locs.shape[0]
        flops = 2 * cap * 128 * 128  # one GEMM row-bin per 128 rows
        rb = _nbytes(locs) + _nbytes(feats)
        fg, fm = orig["scatter_sparse"](
            locs, feats, num_valid, dims, batch_size, cpad, **kw
        )
        rec("input-scatter", flops, rb,
            _nbytes(fg.data) + _nbytes(fm.data))
        return fg, fm

    def trunk(*a, **kw):
        outs = orig["dense_trunk"](*a, **kw)
        x = a[2] if len(a) > 2 else None
        rb = _nbytes(x) if hasattr(x, "shape") else 0
        # dense XLA convs at the coarsest level: price as HBM traffic of
        # in/out activations (MXU negligible at 12x24x24)
        wb = sum(
            _nbytes(o) for o in jax.tree_util.tree_leaves(outs)
            if hasattr(o, "shape")
        )
        rec("dense-trunk", 0, rb, wb)
        return outs

    def unfold_w(fg):
        out = orig["unfold"](fg)
        rec("unfold", 0, _nbytes(fg.data), _nbytes(out))
        return out

    def ups_w(fg):
        out = orig["upsample2_folded"](fg)
        rec("upsample2", 0, _nbytes(fg.data), _nbytes(out.data))
        return out

    wrap(FO, "subm_conv_fused", conv_site)
    wrap(FO, "downconv_fused", downconv)
    wrap(FO, "upconv_fused", upconv)
    wrap(FO, "head_site_fused", head_site)
    wrap(FO, "surf_head_packed", surf_packed)
    wrap(FO, "scatter_sparse", scatter)
    wrap(FO, "unfold", unfold_w)
    wrap(FO, "upsample2_folded", ups_w)
    orig["dense_trunk"] = FF.dense_trunk
    FF.dense_trunk = trunk

    cfg = SGNNConfig(
        input_dim=tuple(args.dims), batch_size=1,
        num_hierarchy_levels=4,
        occupancy_fractions=(1.0, 0.4, 0.2, 0.1),
        execution="dense_flow",
        compute_dtype="bfloat16", use_pallas_conv=True,
        quantize_int8=args.int8, input_presorted=True,
    )
    params, stats = M.genmodel_init(jax.random.PRNGKey(0), cfg)
    locs, feats, num = _synthetic_sparse_input(cfg)
    st = make_sparse(
        jnp.asarray(locs), jnp.asarray(feats), jnp.asarray(num),
        cfg.input_dim, cfg.batch_size,
    )

    def fwd(params, stats, st):
        return FF.genmodel_apply_folded(
            params, stats, cfg, st,
            num_refine_active=cfg.num_refine_levels, do_surf=True,
            want_level_outputs=False,
        )

    jax.eval_shape(fwd, params, stats, st)

    # aggregate per family
    fams = {}
    for c in CALLS:
        f = fams.setdefault(
            c["family"], dict(n=0, flops=0, bytes=0)
        )
        f["n"] += 1
        f["flops"] += c["flops"]
        f["bytes"] += c["rb"] + c["wb"]

    dt = "int8" if args.int8 else "bf16"
    print(f"# roofline floors @ {args.dims} {dt} "
          f"(HBM {HBM_BPS/1e9:.0f} GB/s, MXU {mxu_bps/1e12:.0f} T/s)")
    print(f"{'family':>14} {'calls':>5} {'GB':>7} {'GFLOP':>8} "
          f"{'hbm_ms':>7} {'mxu_ms':>7} {'floor_ms':>8}")
    tot = 0.0
    for name, f in sorted(
        fams.items(), key=lambda kv: -kv[1]["bytes"]
    ):
        hbm = f["bytes"] / HBM_BPS * 1e3
        mxu = f["flops"] / mxu_bps * 1e3
        fl = max(hbm, mxu)
        tot += fl
        print(f"{name:>14} {f['n']:>5} {f['bytes']/1e9:>7.3f} "
              f"{f['flops']/1e9:>8.1f} {hbm:>7.3f} {mxu:>7.3f} "
              f"{fl:>8.3f}")
    print(f"{'TOTAL':>14} {sum(f['n'] for f in fams.values()):>5} "
          f"{sum(f['bytes'] for f in fams.values())/1e9:>7.3f} "
          f"{sum(f['flops'] for f in fams.values())/1e9:>8.1f} "
          f"{'':>7} {'':>7} {tot:>8.3f}")


if __name__ == "__main__":
    main()

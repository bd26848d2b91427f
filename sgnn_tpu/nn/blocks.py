"""Neural building blocks over SparseTensors.

Functional modules: ``*_init(key, ...) -> (params, stats)`` and
``*_apply(params, stats, x, ...) -> (y, new_stats)``. ``stats`` holds BN
running statistics (threaded through train steps, frozen at eval).

Blocks mirror the reference wiring exactly for checkpoint parity:
  * residual block  — scn ConcatTable(Identity, BN-ReLU-Conv x2) + AddTable
    (/root/reference/torch/model.py:33-41)
  * encoder layer   — SparseEncoderLayer (/root/reference/torch/model.py:21-67)
  * sparse U-Net    — scn.FullyConvolutionalNet(reps=1, nPlanes=[nf]*3,
    residual_blocks=True) used by Refinement/SurfacePrediction
    (/root/reference/torch/model.py:180,255): per level a residual block,
    then [identity ‖ BNReLU→stride-2 conv→recurse→unpool] concatenated, so
    the output carries sum(nPlanes) channels.

All submanifold convs at one active-site set share a single index grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sgnn_tpu.nn import init as I
from sgnn_tpu.ops import bn as BN
from sgnn_tpu.ops import conv as CV
from sgnn_tpu.ops.sparse import SparseTensor, sparse_to_dense


# ---------------------------------------------------------------- residual


def resblock_init(key, nf_in: int, nf: int):
    """Residual block; nf_in == nf in all reference uses (Identity branch)."""
    assert nf_in == nf, "reference always uses identity residual branches"
    k0, k1 = jax.random.split(key)
    p_bn0, s_bn0 = BN.init_bn(nf_in)
    p_bn1, s_bn1 = BN.init_bn(nf)
    params = {
        "bn0": p_bn0,
        "conv0": I.subm_conv_init(k0, 27, nf_in, nf),
        "bn1": p_bn1,
        "conv1": I.subm_conv_init(k1, 27, nf, nf),
    }
    stats = {"bn0": s_bn0, "bn1": s_bn1}
    return params, stats


def resblock_apply(params, stats, st: SparseTensor, *, training, axis_name=None,
                   index_grid=None):
    if index_grid is None:
        index_grid = st.index_grid()
    mask = st.valid()
    s = {}
    y, s["bn0"] = BN.batch_norm(
        params["bn0"], stats["bn0"], st.feats, mask,
        training=training, relu=True, axis_name=axis_name,
    )
    y = CV.submanifold_conv3d(st.with_feats(y), params["conv0"],
                              index_grid=index_grid).feats
    y, s["bn1"] = BN.batch_norm(
        params["bn1"], stats["bn1"], y, mask,
        training=training, relu=True, axis_name=axis_name,
    )
    y = CV.submanifold_conv3d(st.with_feats(y), params["conv1"],
                              index_grid=index_grid).feats
    return st.with_feats(st.feats + y), s


# ---------------------------------------------------------------- encoder


def encoder_layer_init(key, nf_in: int, nf: int):
    """SparseEncoderLayer: subm conv -> residual block (+BNReLU) -> stride-2
    conv (+BNReLU). /root/reference/torch/model.py:21-48."""
    k1, k2, k3 = jax.random.split(key, 3)
    p_res, s_res = resblock_init(k2, nf, nf)
    p_bno, s_bno = BN.init_bn(nf)
    p_bn3, s_bn3 = BN.init_bn(nf)
    params = {
        "p1": I.subm_conv_init(k1, 27, nf_in, nf),
        "p2": p_res,
        "p2_bn": p_bno,   # scn: p2.add(BatchNormReLU(nf)) after AddTable
        "p3": I.subm_conv_init(k3, 8, nf, nf),
        "p3_bn": p_bn3,
    }
    stats = {"p2": s_res, "p2_bn": s_bno, "p3_bn": s_bn3}
    return params, stats


def encoder_layer_apply(params, stats, st: SparseTensor, *, out_capacity,
                        training, axis_name=None):
    """Returns (downsampled SparseTensor, skip SparseTensor ft2, new_stats)."""
    index_grid = st.index_grid()
    s = {}
    x = CV.submanifold_conv3d(st, params["p1"], index_grid=index_grid)
    x, s["p2"] = resblock_apply(
        params["p2"], stats["p2"], x,
        training=training, axis_name=axis_name, index_grid=index_grid,
    )
    y, s["p2_bn"] = BN.batch_norm(
        params["p2_bn"], stats["p2_bn"], x.feats, x.valid(),
        training=training, relu=True, axis_name=axis_name,
    )
    ft2 = x.with_feats(y)
    x = CV.strided_conv3d_down(
        ft2, params["p3"], out_capacity=out_capacity, index_grid=index_grid
    )
    y, s["p3_bn"] = BN.batch_norm(
        params["p3_bn"], stats["p3_bn"], x.feats, x.valid(),
        training=training, relu=True, axis_name=axis_name,
    )
    return x.with_feats(y), ft2, s


# ---------------------------------------------------------------- sparse U-Net


def sparse_unet_init(key, n_planes: list[int]):
    """FullyConvolutionalNet(reps=1, residual) over n_planes levels."""
    nf = n_planes[0]
    if len(n_planes) == 1:
        p_res, s_res = resblock_init(key, nf, nf)
        return {"block": p_res}, {"block": s_res}
    kb, kbn, kc, kd = jax.random.split(key, 4)
    p_res, s_res = resblock_init(kb, nf, nf)
    p_bn, s_bn = BN.init_bn(nf)
    p_deep, s_deep = sparse_unet_init(kd, n_planes[1:])
    params = {
        "block": p_res,
        "down_bn": p_bn,
        "down_conv": I.subm_conv_init(kc, 8, nf, n_planes[1]),
        "deeper": p_deep,
    }
    stats = {"block": s_res, "down_bn": s_bn, "deeper": s_deep}
    return params, stats


def sparse_unet_apply(params, stats, st: SparseTensor, *, training,
                      axis_name=None):
    """Returns (SparseTensor with sum(n_planes) channels, new_stats)."""
    index_grid = st.index_grid()
    s = {}
    x, s["block"] = resblock_apply(
        params["block"], stats["block"], st,
        training=training, axis_name=axis_name, index_grid=index_grid,
    )
    if "deeper" not in params:
        return x, s
    y, s["down_bn"] = BN.batch_norm(
        params["down_bn"], stats["down_bn"], x.feats, x.valid(),
        training=training, relu=True, axis_name=axis_name,
    )
    down = CV.strided_conv3d_down(
        x.with_feats(y), params["down_conv"],
        out_capacity=x.capacity, index_grid=index_grid,
    )
    deep, s["deeper"] = sparse_unet_apply(
        params["deeper"], stats["deeper"], down,
        training=training, axis_name=axis_name,
    )
    up = CV.unpool_x2(x.locs, x.num_valid, deep)
    # JoinTable: identity branch first, then the unpooled deeper branch.
    out = jnp.concatenate([x.feats, up.feats], axis=-1)
    return x.with_feats(out), s


# ---------------------------------------------------------------- dense head


def conv_bn_relu_init(key, cin: int, cout: int, k: int, *, transpose=False):
    p_bn, s_bn = BN.init_bn(cout)
    if transpose:
        w = I.conv_transpose3d_init(key, cin, cout, k)
    else:
        w = I.conv3d_init(key, cout, cin, k)
    return {"conv": w, "bn": p_bn}, {"bn": s_bn}

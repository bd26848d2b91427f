"""Convert reference sgnn.pth checkpoints to sgnn_tpu parameter pytrees.

The reference saves {'epoch','state_dict','optimizer'} (/root/reference/
torch/train.py:444); state_dict keys follow GenModel's module tree
(/root/reference/torch/model.py:276-314). This module maps every key to the
corresponding leaf of our params/stats trees:

  torch module                         our path
  ------------                         --------
  encoder.process_sparse.K.p1          encoder/process_sparse[K]/p1
  encoder.process_sparse.K.p2.0.1.{0..3}   .../p2/{bn0,conv0,bn1,conv1}
  encoder.process_sparse.K.p2.2        .../p2_bn
  encoder.process_sparse.K.p3.{0,1}    .../{p3,p3_bn}
  encoder.{encode_dense*,bottleneck_dense2,decode_dense*,final}.{0,1}
                                       .../{conv,bn}
  encoder.{occpred,sdfpred}.0          .../{occpred,sdfpred}
  refinement.H.{p1,p3,n1,n2,linear,linearsdf}  direct
  refinement.H.p2 (scn.FullyConvolutionalNet, reps=1, nPlanes=[nf]*3,
    residual): recursive Sequential [block-ConcatTable, AddTable,
    down-ConcatTable, JoinTable]; block branch 1 = Sequential(BNReLU, Conv,
    BNReLU, Conv); down branch 1 = Sequential(BNReLU, Convolution, U(rest),
    UnPooling)  ->  ours {block:{bn0,conv0,bn1,conv1}, down_bn, down_conv,
    deeper}
  surfacepred.{p1,p2,p3,linear}        direct

Layout conversions:
  scn convolutions store weight [filter_volume, Cin, Cout] with taps
  enumerated in C order over (z, y, x) — identical to ops/conv.py.
  nn.Linear [out, in] -> ours [in, out] (transposed).
  Dense conv weights keep torch layout (ops/dense.py consumes it natively).
"""

from __future__ import annotations

import numpy as np


class ConversionError(Exception):
    pass


def _np(v):
    # torch tensor or array -> numpy (torch import stays optional)
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


class _SD:
    """state_dict view that tracks consumed keys."""

    def __init__(self, sd):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.used = set()

    def take(self, key, shape=None):
        if key not in self.sd:
            raise ConversionError(f"missing key {key}")
        self.used.add(key)
        v = self.sd[key].astype(np.float32)
        if shape is not None and tuple(v.shape) != tuple(shape):
            raise ConversionError(
                f"{key}: shape {v.shape} != expected {tuple(shape)}"
            )
        return v

    def leftovers(self):
        ignorable = ("num_batches_tracked",)
        return [
            k for k in self.sd
            if k not in self.used and not k.endswith(ignorable)
        ]


def _bn(sd: _SD, prefix, params_leaf, stats_leaf):
    c = params_leaf["scale"].shape[0]
    params_leaf["scale"] = sd.take(f"{prefix}.weight", (c,))
    params_leaf["bias"] = sd.take(f"{prefix}.bias", (c,))
    stats_leaf["mean"] = sd.take(f"{prefix}.running_mean", (c,))
    stats_leaf["var"] = sd.take(f"{prefix}.running_var", (c,))


def _subm(sd: _SD, key, leaf):
    return sd.take(key, leaf.shape)


def _linear(sd: _SD, prefix, leaf):
    cin, cout = leaf["weight"].shape
    leaf["weight"] = sd.take(f"{prefix}.weight", (cout, cin)).T.copy()
    leaf["bias"] = sd.take(f"{prefix}.bias", (cout,))


def _resblock(sd: _SD, prefix, p, s):
    """ConcatTable residual block at Sequential indices {i}.0/{i+1} —
    prefix points at the ConcatTable ('{seq}.{i}')."""
    _bn(sd, f"{prefix}.1.0", p["bn0"], s["bn0"])
    p["conv0"] = _subm(sd, f"{prefix}.1.1.weight", p["conv0"])
    _bn(sd, f"{prefix}.1.2", p["bn1"], s["bn1"])
    p["conv1"] = _subm(sd, f"{prefix}.1.3.weight", p["conv1"])


def _unet(sd: _SD, prefix, p, s):
    """scn.FullyConvolutionalNet(reps=1, residual): Sequential
    [0]=block ConcatTable, [1]=AddTable, then if deeper
    [2]=ConcatTable(Identity, Seq(BNReLU, Conv, U, UnPool)), [3]=JoinTable."""
    _resblock(sd, f"{prefix}.0", p["block"], s["block"])
    if "deeper" in p:
        _bn(sd, f"{prefix}.2.1.0", p["down_bn"], s["down_bn"])
        p["down_conv"] = _subm(sd, f"{prefix}.2.1.1.weight", p["down_conv"])
        _unet(sd, f"{prefix}.2.1.2", p["deeper"], s["deeper"])


def _dense_cbr(sd: _SD, prefix, p, s):
    p["conv"] = sd.take(f"{prefix}.0.weight", p["conv"].shape)
    _bn(sd, f"{prefix}.1", p["bn"], s["bn"])


def convert_state_dict(state_dict, cfg, params, stats):
    """Fill (params, stats) templates (from genmodel_init) from a reference
    state_dict. Returns (params, stats); raises on missing/mis-shaped keys
    and reports unconsumed ones."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    stats = jax.tree_util.tree_map(np.asarray, jax.device_get(stats))
    sd = _SD(state_dict)

    # ---- encoder sparse levels
    for k in range(len(cfg.nf_per_level)):
        p = params["encoder"]["process_sparse"][k]
        s = stats["encoder"]["process_sparse"][k]
        pre = f"encoder.process_sparse.{k}"
        p["p1"] = _subm(sd, f"{pre}.p1.weight", p["p1"])
        _resblock(sd, f"{pre}.p2.0", p["p2"], s["p2"])
        _bn(sd, f"{pre}.p2.2", p["p2_bn"], s["p2_bn"])
        p["p3"] = _subm(sd, f"{pre}.p3.0.weight", p["p3"])
        _bn(sd, f"{pre}.p3.1", p["p3_bn"], s["p3_bn"])

    # ---- encoder dense trunk
    for name in (
        "encode_dense0", "encode_dense1", "bottleneck_dense2",
        "decode_dense3", "decode_dense4", "final",
    ):
        _dense_cbr(
            sd, f"encoder.{name}",
            params["encoder"][name], stats["encoder"][name],
        )
    params["encoder"]["occpred"] = sd.take(
        "encoder.occpred.0.weight", params["encoder"]["occpred"].shape
    )
    params["encoder"]["sdfpred"] = sd.take(
        "encoder.sdfpred.0.weight", params["encoder"]["sdfpred"].shape
    )

    # ---- refinement levels
    for h in range(cfg.num_refine_levels):
        p = params["refinement"][h]
        s = stats["refinement"][h]
        pre = f"refinement.{h}"
        p["p1"] = _subm(sd, f"{pre}.p1.weight", p["p1"])
        _unet(sd, f"{pre}.p2", p["p2"], s["p2"])
        _bn(sd, f"{pre}.p3", p["p3"], s["p3"])
        p["n1"] = _subm(sd, f"{pre}.n1.weight", p["n1"])
        _bn(sd, f"{pre}.n2", p["n2"], s["n2"])
        _linear(sd, f"{pre}.linear", p["linear"])
        _linear(sd, f"{pre}.linearsdf", p["linearsdf"])

    # ---- surface prediction
    p, s = params["surfacepred"], stats["surfacepred"]
    p["p1"] = _subm(sd, "surfacepred.p1.weight", p["p1"])
    _unet(sd, "surfacepred.p2", p["p2"], s["p2"])
    _bn(sd, "surfacepred.p3", p["p3"], s["p3"])
    _linear(sd, "surfacepred.linear", p["linear"])

    left = sd.leftovers()
    if left:
        raise ConversionError(f"unconsumed reference keys: {left[:10]}"
                              f"{' ...' if len(left) > 10 else ''}")
    return params, stats


def export_state_dict(params, stats, cfg):
    """Inverse of convert_state_dict: our (params, stats) pytrees -> the
    exact scn state_dict layout (the reference module tree,
    /root/reference/torch/model.py). Involution with convert_state_dict
    is bit-exact (tests/test_ckpt_convert.py), which certifies the
    converter's mapping on TRAINED weights — and lets a model trained
    here be loaded by the reference code (torch.save({'epoch':...,
    'state_dict': sd, 'optimizer': {}}, path))."""
    import jax

    def f32(t):
        return jax.tree_util.tree_map(
            lambda v: np.asarray(jax.device_get(v), np.float32), t
        )

    params = f32(params)
    stats = f32(stats)
    sd = {}

    def bn(prefix, p, s):
        sd[f"{prefix}.weight"] = p["scale"]
        sd[f"{prefix}.bias"] = p["bias"]
        sd[f"{prefix}.running_mean"] = s["mean"]
        sd[f"{prefix}.running_var"] = s["var"]

    def linear(prefix, leaf):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(leaf["weight"].T)
        sd[f"{prefix}.bias"] = leaf["bias"]

    def resblock(prefix, p, s):
        bn(f"{prefix}.1.0", p["bn0"], s["bn0"])
        sd[f"{prefix}.1.1.weight"] = p["conv0"]
        bn(f"{prefix}.1.2", p["bn1"], s["bn1"])
        sd[f"{prefix}.1.3.weight"] = p["conv1"]

    def unet(prefix, p, s):
        resblock(f"{prefix}.0", p["block"], s["block"])
        if "deeper" in p:
            bn(f"{prefix}.2.1.0", p["down_bn"], s["down_bn"])
            sd[f"{prefix}.2.1.1.weight"] = p["down_conv"]
            unet(f"{prefix}.2.1.2", p["deeper"], s["deeper"])

    for k in range(len(cfg.nf_per_level)):
        p = params["encoder"]["process_sparse"][k]
        s = stats["encoder"]["process_sparse"][k]
        pre = f"encoder.process_sparse.{k}"
        sd[f"{pre}.p1.weight"] = p["p1"]
        resblock(f"{pre}.p2.0", p["p2"], s["p2"])
        bn(f"{pre}.p2.2", p["p2_bn"], s["p2_bn"])
        sd[f"{pre}.p3.0.weight"] = p["p3"]
        bn(f"{pre}.p3.1", p["p3_bn"], s["p3_bn"])
    for name in (
        "encode_dense0", "encode_dense1", "bottleneck_dense2",
        "decode_dense3", "decode_dense4", "final",
    ):
        sd[f"encoder.{name}.0.weight"] = params["encoder"][name]["conv"]
        bn(f"encoder.{name}.1", params["encoder"][name]["bn"],
           stats["encoder"][name]["bn"])
    sd["encoder.occpred.0.weight"] = params["encoder"]["occpred"]
    sd["encoder.sdfpred.0.weight"] = params["encoder"]["sdfpred"]
    for h in range(cfg.num_refine_levels):
        p = params["refinement"][h]
        s = stats["refinement"][h]
        pre = f"refinement.{h}"
        sd[f"{pre}.p1.weight"] = p["p1"]
        unet(f"{pre}.p2", p["p2"], s["p2"])
        bn(f"{pre}.p3", p["p3"], s["p3"])
        sd[f"{pre}.n1.weight"] = p["n1"]
        bn(f"{pre}.n2", p["n2"], s["n2"])
        linear(f"{pre}.linear", p["linear"])
        linear(f"{pre}.linearsdf", p["linearsdf"])
    p, s = params["surfacepred"], stats["surfacepred"]
    sd["surfacepred.p1.weight"] = p["p1"]
    unet("surfacepred.p2", p["p2"], s["p2"])
    bn("surfacepred.p3", p["p3"], s["p3"])
    linear("surfacepred.linear", p["linear"])
    return sd


def expected_state_dict_spec(cfg):
    """{key: shape} of the reference state_dict for this config — used by
    tests and to pre-validate a checkpoint before conversion."""
    import jax

    from sgnn_tpu.models.sgnn import genmodel_init

    params, stats = genmodel_init(jax.random.PRNGKey(0), cfg)
    spec = {}

    def bn(prefix, c):
        spec[f"{prefix}.weight"] = (c,)
        spec[f"{prefix}.bias"] = (c,)
        spec[f"{prefix}.running_mean"] = (c,)
        spec[f"{prefix}.running_var"] = (c,)

    def resblock(prefix, p):
        bn(f"{prefix}.1.0", p["bn0"]["scale"].shape[0])
        spec[f"{prefix}.1.1.weight"] = tuple(p["conv0"].shape)
        bn(f"{prefix}.1.2", p["bn1"]["scale"].shape[0])
        spec[f"{prefix}.1.3.weight"] = tuple(p["conv1"].shape)

    def unet(prefix, p):
        resblock(f"{prefix}.0", p["block"])
        if "deeper" in p:
            bn(f"{prefix}.2.1.0", p["down_bn"]["scale"].shape[0])
            spec[f"{prefix}.2.1.1.weight"] = tuple(p["down_conv"].shape)
            unet(f"{prefix}.2.1.2", p["deeper"])

    for k in range(len(cfg.nf_per_level)):
        p = params["encoder"]["process_sparse"][k]
        pre = f"encoder.process_sparse.{k}"
        spec[f"{pre}.p1.weight"] = tuple(p["p1"].shape)
        resblock(f"{pre}.p2.0", p["p2"])
        bn(f"{pre}.p2.2", p["p2_bn"]["scale"].shape[0])
        spec[f"{pre}.p3.0.weight"] = tuple(p["p3"].shape)
        bn(f"{pre}.p3.1", p["p3_bn"]["scale"].shape[0])
    for name in (
        "encode_dense0", "encode_dense1", "bottleneck_dense2",
        "decode_dense3", "decode_dense4", "final",
    ):
        p = params["encoder"][name]
        spec[f"encoder.{name}.0.weight"] = tuple(p["conv"].shape)
        bn(f"encoder.{name}.1", p["bn"]["scale"].shape[0])
    spec["encoder.occpred.0.weight"] = tuple(params["encoder"]["occpred"].shape)
    spec["encoder.sdfpred.0.weight"] = tuple(params["encoder"]["sdfpred"].shape)
    for h in range(cfg.num_refine_levels):
        p = params["refinement"][h]
        pre = f"refinement.{h}"
        spec[f"{pre}.p1.weight"] = tuple(p["p1"].shape)
        unet(f"{pre}.p2", p["p2"])
        bn(f"{pre}.p3", p["p3"]["scale"].shape[0])
        spec[f"{pre}.n1.weight"] = tuple(p["n1"].shape)
        bn(f"{pre}.n2", p["n2"]["scale"].shape[0])
        cin, cout = p["linear"]["weight"].shape
        spec[f"{pre}.linear.weight"] = (cout, cin)
        spec[f"{pre}.linear.bias"] = (cout,)
        cin, cout = p["linearsdf"]["weight"].shape
        spec[f"{pre}.linearsdf.weight"] = (cout, cin)
        spec[f"{pre}.linearsdf.bias"] = (cout,)
    p = params["surfacepred"]
    spec["surfacepred.p1.weight"] = tuple(p["p1"].shape)
    unet("surfacepred.p2", p["p2"])
    bn("surfacepred.p3", p["p3"]["scale"].shape[0])
    cin, cout = p["linear"]["weight"].shape
    spec["surfacepred.linear.weight"] = (cout, cin)
    spec["surfacepred.linear.bias"] = (cout,)
    return spec


def flip_tap_order(params):
    """Reverse the filter-tap enumeration of every sparse-conv weight.

    SparseConvNet stores weights [filter_volume, Cin, Cout]; our taps are
    C-ordered over (z, y, x) (ops/coords.py:neighbor_offsets). If scn
    enumerates offsets in the reverse convention, the converted weights
    need a per-axis flip — which for a full C-order enumeration is exactly
    tap' = K-1-tap, i.e. weight[::-1]. Applied to every [K, Cin, Cout]
    leaf (K in {8, 27}); dense nn.Conv3d weights (5D torch layout) have a
    fixed, unambiguous convention and are untouched.

    Certification: tools/evaluate.py --tap_order auto runs one scene under
    both conventions and reports which is self-consistent (lower SDF L1).
    """
    import jax

    def _flip(leaf):
        a = np.asarray(leaf)
        if a.ndim == 3 and a.shape[0] in (8, 27):
            return a[::-1].copy()
        return leaf

    return jax.tree_util.tree_map(_flip, params)


def load_reference_checkpoint(path, cfg, tap_order="c"):
    """torch.load a reference .pth and convert. Returns (params, stats, meta).

    tap_order: "c" (our native assumption: scn taps C-ordered over
    (z, y, x)) or "flipped" (reverse enumeration; see flip_tap_order).
    """
    import jax
    import torch

    from sgnn_tpu.models.sgnn import genmodel_init

    assert tap_order in ("c", "flipped"), tap_order
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    params, stats = genmodel_init(jax.random.PRNGKey(0), cfg)
    params, stats = convert_state_dict(sd, cfg, params, stats)
    if tap_order == "flipped":
        params = flip_tap_order(params)
    meta = {"epoch": int(ckpt.get("epoch", 0))} if isinstance(ckpt, dict) else {}
    return params, stats, meta

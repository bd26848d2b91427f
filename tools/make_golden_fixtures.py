#!/usr/bin/env python
"""Generate golden activation fixtures from plain-torch re-executions of
the reference layer graph's dense pieces.

The reference pipeline's numerics the environment CAN pin without the
unfetchable sgnn.pth are the torch op semantics themselves: Conv3d /
ConvTranspose3d k4s2p1 (model.py:89-126), BatchNorm3d train+eval
(model.py:91), row BatchNorm at scn's eps=1e-4 (model.py:37 — scn's BN
normalizes active rows exactly like BatchNorm1d), Linear heads
(model.py:189-190), the MaxPool3d target pyramid (loss.py:29),
preprocess_sdf clamping (data_util.py:145-152), apply_log_transform
(loss.py:51-55), and weighted BCE-with-logits (loss.py:58-82).

This script re-executes those on tiny seeded inputs and writes
tests/golden/golden_torch.npz; tests/test_golden_torch.py asserts our ops
reproduce the activations. Run once and check in the npz — the test then
certifies against torch semantics without importing torch.
"""

import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "golden_torch.npz",
)


def main():
    torch.manual_seed(0)
    g = {}

    # ---- Conv3d k4 s2 p1, no bias (model.py:90)
    x = torch.randn(2, 6, 8, 8, 8)
    w = torch.randn(9, 6, 4, 4, 4) * 0.2
    g["conv_k4s2p1_x"] = x.numpy()
    g["conv_k4s2p1_w"] = w.numpy()
    g["conv_k4s2p1_y"] = F.conv3d(x, w, stride=2, padding=1).numpy()

    # ---- ConvTranspose3d k4 s2 p1, no bias (model.py:112)
    xt = torch.randn(2, 9, 4, 4, 4)
    wt = torch.randn(9, 6, 4, 4, 4) * 0.2  # [Cin, Cout, k, k, k]
    g["convt_k4s2p1_x"] = xt.numpy()
    g["convt_k4s2p1_w"] = wt.numpy()
    g["convt_k4s2p1_y"] = F.conv_transpose3d(
        xt, wt, stride=2, padding=1
    ).numpy()

    # ---- Conv3d k1 head, no bias (model.py:132)
    xh = torch.randn(2, 8, 4, 4, 4)
    wh = torch.randn(1, 8, 1, 1, 1) * 0.3
    g["conv_k1_x"] = xh.numpy()
    g["conv_k1_w"] = wh.numpy()
    g["conv_k1_y"] = F.conv3d(xh, wh).numpy()

    # ---- BatchNorm3d train + eval (model.py:91; torch defaults
    #      eps=1e-5, momentum=0.1, unbiased running var)
    bn = torch.nn.BatchNorm3d(6)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(6) + 0.5)
        bn.bias.copy_(torch.randn(6) * 0.1)
        bn.running_mean.copy_(torch.randn(6) * 0.2)
        bn.running_var.copy_(torch.rand(6) + 0.5)
    xb = torch.randn(2, 6, 5, 6, 7) * 1.7 + 0.3
    g["bn3d_x"] = xb.numpy()
    g["bn3d_scale"] = bn.weight.detach().numpy()
    g["bn3d_bias"] = bn.bias.detach().numpy()
    g["bn3d_rm0"] = bn.running_mean.clone().numpy()
    g["bn3d_rv0"] = bn.running_var.clone().numpy()
    bn.train()
    with torch.no_grad():
        g["bn3d_y_train"] = bn(xb).numpy()
    g["bn3d_rm1"] = bn.running_mean.clone().numpy()
    g["bn3d_rv1"] = bn.running_var.clone().numpy()
    bn.eval()
    with torch.no_grad():
        g["bn3d_y_eval"] = bn(xb).numpy()

    # ---- Row BN at scn eps=1e-4 over active rows (model.py:37;
    #      scn.BatchNormReLU == BatchNorm1d(eps=1e-4) + ReLU on rows)
    bn1 = torch.nn.BatchNorm1d(5, eps=1e-4)
    with torch.no_grad():
        bn1.weight.copy_(torch.rand(5) + 0.5)
        bn1.bias.copy_(torch.randn(5) * 0.1)
        bn1.running_mean.copy_(torch.randn(5) * 0.2)
        bn1.running_var.copy_(torch.rand(5) + 0.5)
    xr = torch.randn(37, 5) * 1.3 - 0.2
    g["bnrow_x"] = xr.numpy()
    g["bnrow_scale"] = bn1.weight.detach().numpy()
    g["bnrow_bias"] = bn1.bias.detach().numpy()
    g["bnrow_rm0"] = bn1.running_mean.clone().numpy()
    g["bnrow_rv0"] = bn1.running_var.clone().numpy()
    bn1.train()
    with torch.no_grad():
        g["bnrow_y_train"] = torch.relu(bn1(xr)).numpy()
    g["bnrow_rm1"] = bn1.running_mean.clone().numpy()
    g["bnrow_rv1"] = bn1.running_var.clone().numpy()
    bn1.eval()
    with torch.no_grad():
        g["bnrow_y_eval"] = torch.relu(bn1(xr)).numpy()

    # ---- Linear heads (model.py:189-190)
    lin = torch.nn.Linear(16, 1)
    xl = torch.randn(23, 16)
    g["linear_x"] = xl.numpy()
    g["linear_w"] = lin.weight.detach().numpy()
    g["linear_b"] = lin.bias.detach().numpy()
    with torch.no_grad():
        g["linear_y"] = lin(xl).numpy()

    # ---- MaxPool3d(2) target pyramid incl. the -1 UNK sentinel
    #      (loss.py:22-29: occ grid of {-1, 0, 1})
    occ = torch.randint(0, 3, (2, 1, 8, 8, 8)).float() - 1.0
    g["maxpool_x"] = occ.numpy()
    g["maxpool_y"] = torch.nn.MaxPool3d(kernel_size=2)(occ).numpy()

    # ---- preprocess_sdf clamp (data_util.py:149-152)
    sdf = torch.randn(64) * 5.0
    sdf[3] = float("-inf")
    g["clamp_x"] = sdf.numpy()
    t = sdf.clone()
    t[t < -3.0] = -3.0
    t[t > 3.0] = 3.0
    g["clamp_y"] = t.numpy()

    # ---- apply_log_transform (loss.py:51-55)
    v = torch.randn(64) * 3.0
    g["logt_x"] = v.numpy()
    g["logt_y"] = (torch.sign(v) * torch.log(torch.abs(v) + 1)).numpy()

    # ---- weighted BCE-with-logits, mean reduction (loss.py:77-80)
    logits = torch.randn(50)
    tgts = torch.randint(0, 2, (50,)).float()
    wts = torch.rand(50) * 4 + 0.5
    g["bce_logits"] = logits.numpy()
    g["bce_tgts"] = tgts.numpy()
    g["bce_w"] = wts.numpy()
    g["bce_y"] = F.binary_cross_entropy_with_logits(
        logits, tgts, weight=wts
    ).numpy()

    # ---- l1 on log-transformed sdf (loss.py:122-157 core)
    p = torch.randn(40) * 2
    t2 = torch.randn(40) * 2
    g["l1log_p"] = p.numpy()
    g["l1log_t"] = t2.numpy()
    sgn = lambda u: torch.sign(u) * torch.log(torch.abs(u) + 1)
    g["l1log_y"] = torch.mean(torch.abs(sgn(p) - sgn(t2))).numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    total = sum(a.nbytes for a in g.values())
    print(f"wrote {OUT}: {len(g)} arrays, {total/1e3:.0f} KB raw,"
          f" {os.path.getsize(OUT)/1e3:.0f} KB compressed")


if __name__ == "__main__":
    main()

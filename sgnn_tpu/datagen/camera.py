"""Depth-image processing: bilateral filter, projection helpers.

Vectorized equivalents of /root/reference/datagen/GenerateScans/src/
CameraUtil.h (the reference's OpenMP per-pixel loops).
"""

from __future__ import annotations

import numpy as np


def bilateral_filter(depth: np.ndarray, sigma_d: float = 2.0,
                     sigma_r: float = 0.1) -> np.ndarray:
    """Edge-preserving depth smoothing (CameraUtil.h:25-64).

    Invalid pixels are -inf and stay -inf; valid pixels average valid
    neighbors within radius ceil(2*sigma_d) weighted by spatial gaussian x
    range gaussian. The fuse path calls this with (2.0, 0.1)
    (Fuser.cpp:83,138).
    """
    r = int(np.ceil(2.0 * sigma_d))
    valid = np.isfinite(depth)
    d = np.where(valid, depth, 0.0).astype(np.float64)
    H, W = depth.shape
    acc = np.zeros((H, W), np.float64)
    wacc = np.zeros((H, W), np.float64)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            g = np.exp(-(dx * dx + dy * dy) / (2.0 * sigma_d * sigma_d))
            ys = slice(max(0, dy), min(H, H + dy))
            yd = slice(max(0, -dy), min(H, H - dy))
            xs = slice(max(0, dx), min(W, W + dx))
            xd = slice(max(0, -dx), min(W, W - dx))
            nd = d[ys, xs]
            nv = valid[ys, xs]
            diff = nd - d[yd, xd]
            w = g * np.exp(-(diff * diff) / (2.0 * sigma_r * sigma_r)) * nv
            acc[yd, xd] += w * nd
            wacc[yd, xd] += w
    out = np.where(valid & (wacc > 0), acc / np.maximum(wacc, 1e-30), -np.inf)
    return out.astype(np.float32)


def depth_to_camera(intrinsic, ux, uy, depth):
    """Unproject pixel -> camera space (VoxelGrid.h depthToSkeleton)."""
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    x = (ux - cx) / fx * depth
    y = (uy - cy) / fy * depth
    return np.stack([x, y, np.broadcast_to(depth, np.shape(x))], -1)


def camera_to_depth(intrinsic, p):
    """Project camera-space points -> (u, v, z) (VoxelGrid.h
    skeletonToDepth). p: [..., 3]."""
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    z = p[..., 2]
    u = p[..., 0] * fx / z + cx
    v = p[..., 1] * fy / z + cy
    return np.stack([u, v, z], -1)

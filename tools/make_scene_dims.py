"""Emit a scene-dims population ('Z Y X' lines, zyx, z=up) for the
serving compile-budget analysis (tools/compile_budget.py
--scene_dims_file).

Two sources:

  --from_sdf_dir DIR   read the uint64 dimx,dimy,dimz headers of every
                       .sdf in DIR (a real datagen population) and flip
                       to zyx — matches what data/formats.py:load_scene
                       hands the serving path.

  --mp_model N         sample N rooms from a Matterport-room-like size
                       model. The reference serves 394 mp-rooms test
                       scenes (/root/reference/torch/test_scene.py +
                       filelists/mp-rooms_test-scenes.txt); their mesh
                       bboxes are not shipped, so this models the
                       population: room footprints are lognormal around
                       ~3.6 m (closets ~1.5 m to halls ~11 m), heights
                       2.3-3.0 m with a double-height tail. Voxelization
                       follows the datagen grid math: dims = extent /
                       voxelSize (2 cm) + 2*scenePad(6) laterally and
                       heightPad(3) vertically (/root/reference/datagen/
                       GenerateScans/src/Fuser.cpp:47-61,
                       zParametersScanMP.txt:36-37).

Both apply the serving height crop (z <= --max_input_height, reference
test_scene.py:41 default 128 / scene_dataloader.py:83-87) and emit RAW
cropped dims — compile_budget.bucket_report applies each dim_round
candidate itself.
"""

from __future__ import annotations

import argparse
import glob
import os
import struct

import numpy as np


def dims_from_sdf_dir(d):
    out = []
    for p in sorted(glob.glob(os.path.join(d, "*.sdf"))):
        with open(p, "rb") as f:
            dx, dy, dz = struct.unpack("<3Q", f.read(24))
        out.append((dz, dy, dx))
    return out


def dims_from_mp_model(n, seed, voxel=0.02, scene_pad=6, height_pad=3):
    rng = np.random.RandomState(seed)
    # footprint edges: lognormal, median ~3.6 m, long right tail
    w = np.exp(rng.normal(np.log(3.6), 0.42, n)).clip(1.4, 11.5)
    d = np.exp(rng.normal(np.log(3.6), 0.42, n)).clip(1.4, 11.5)
    h = rng.normal(2.6, 0.22, n).clip(2.2, 3.2)
    tall = rng.rand(n) < 0.08  # stairwells / atria
    h[tall] = rng.uniform(3.6, 5.6, tall.sum())
    dz = np.ceil(h / voxel).astype(int) + height_pad
    dy = np.ceil(d / voxel).astype(int) + 2 * scene_pad
    dx = np.ceil(w / voxel).astype(int) + 2 * scene_pad
    return list(zip(dz, dy, dx))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from_sdf_dir", default="")
    ap.add_argument("--mp_model", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max_input_height", type=int, default=128)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    if bool(args.from_sdf_dir) == bool(args.mp_model):
        ap.error("exactly one of --from_sdf_dir / --mp_model")
    dims = (
        dims_from_sdf_dir(args.from_sdf_dir)
        if args.from_sdf_dir
        else dims_from_mp_model(args.mp_model, args.seed)
    )
    mh = args.max_input_height
    if mh > 0:
        dims = [(min(z, mh), y, x) for z, y, x in dims]
    with open(args.out, "w") as f:
        for z, y, x in dims:
            f.write(f"{z} {y} {x}\n")
    a = np.asarray(dims)
    print(
        f"{len(dims)} scenes -> {args.out}; "
        f"z {a[:,0].min()}-{a[:,0].max()} "
        f"y {a[:,1].min()}-{a[:,1].max()} "
        f"x {a[:,2].min()}-{a[:,2].max()} "
        f"median {np.median(a,0).astype(int).tolist()}"
    )


if __name__ == "__main__":
    main()

"""Scene/room handling for datagen: meshes, alignment, directory layout.

Replaces the reference's mLib-based Scene/ScansDirectory (/root/reference/
datagen/GenerateScans/src/Scene.cpp, ScansDirectory.h): loads the room
mesh (for bbox/OBB), optional .aln alignment, and resolves the Matterport
on-disk layout.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from sgnn_tpu.datagen.fusion import OBB
from sgnn_tpu.datagen.sens import SensFile


def load_ply_vertices(path: str) -> np.ndarray:
    """Minimal generic PLY vertex reader: returns [N, 3] float32 xyz.

    Handles ascii and binary_little_endian with arbitrary extra vertex
    properties (Matterport .reduced.ply has normals/colors); only x/y/z are
    extracted.
    """
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode(errors="replace").splitlines()
    fmt = None
    n_verts = 0
    props = []  # of (name, dtype) for the vertex element
    in_vertex = False
    type_map = {
        "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
        "int": "<i4", "int32": "<i4", "uint": "<u4", "uint32": "<u4",
        "short": "<i2", "ushort": "<u2", "char": "i1", "uchar": "u1",
        "int8": "i1", "uint8": "u1", "int16": "<i2", "uint16": "<u2",
    }
    for line in header:
        t = line.strip().split()
        if not t:
            continue
        if t[0] == "format":
            fmt = t[1]
        elif t[0] == "element":
            in_vertex = t[1] == "vertex"
            if in_vertex:
                n_verts = int(t[2])
        elif t[0] == "property" and in_vertex:
            if t[1] == "list":
                raise ValueError("list property in vertex element")
            props.append((t[2], type_map[t[1]]))
    if fmt == "ascii":
        rows = []
        text = data[end:].decode()
        names = [p[0] for p in props]
        ix, iy, iz = names.index("x"), names.index("y"), names.index("z")
        for line in text.splitlines()[:n_verts]:
            v = line.split()
            rows.append([float(v[ix]), float(v[iy]), float(v[iz])])
        return np.asarray(rows, np.float32)
    dt = np.dtype([(n, t) for n, t in props])
    rec = np.frombuffer(data, dt, n_verts, end)
    return np.stack(
        [rec["x"], rec["y"], rec["z"]], -1
    ).astype(np.float32)


def load_aln(path: str) -> np.ndarray:
    """.aln alignment: 3 header lines then a 4x4 row-major matrix
    (Scene.cpp:11-21)."""
    lines = open(path).read().split()
    # skip the 3 header lines: tokenize everything and take the last 16
    vals = [float(v) for v in lines[-16:]]
    return np.asarray(vals, np.float32).reshape(4, 4)


@dataclasses.dataclass
class ScanInfo:
    scene_name: str  # "SCENE_roomN"
    mesh_file: str
    sens_files: list


def load_matterport_list(scan_path, scan_mesh_path, scene_list_file,
                         max_num_sens=3):
    """ScansDirectory::loadMatterport (ScansDirectory.h:30-64)."""
    scans = []
    for room in open(scene_list_file).read().splitlines():
        if not room.strip():
            continue
        scene, room_id = room.split("_room")
        mesh = os.path.join(
            scan_mesh_path, scene, "region_segmentations",
            f"region{room_id}.reduced.ply",
        )
        sens_dir = os.path.join(scan_path, scene, "sens")
        sens = [
            os.path.join(sens_dir, f"{scene}_{i}.sens")
            for i in range(max_num_sens)
        ]
        sens = [s for s in sens if os.path.isfile(s)]
        scans.append(ScanInfo(room, mesh, sens))
    return scans


class Scene:
    """A room: mesh bounds/OBB + the scene's .sens streams.

    Mirrors Scene::load/updateRoom (Scene.cpp:5-60): mesh transformed by
    the optional .aln (then translated to positive octant), bbox/OBB from
    vertices with the z-up OBB.
    """

    def __init__(self, scan_info: ScanInfo, aln_file: str | None = None):
        self.info = scan_info
        verts = load_ply_vertices(scan_info.mesh_file)
        transform = np.eye(4, dtype=np.float32)
        if aln_file and os.path.isfile(aln_file):
            align = load_aln(aln_file)
            v = (align[:3, :3] @ verts.T).T + align[:3, 3]
            shift = -v.min(0)
            verts = v + shift
            t = np.eye(4, dtype=np.float32)
            t[:3, 3] = shift
            transform = t @ align
        self.transform = transform
        self.bbox_min = verts.min(0)
        self.bbox_max = verts.max(0)
        self.obb = OBB.from_points_zup(verts)
        self.sens = [SensFile(p) for p in scan_info.sens_files]
        self.frame_index = []  # (sens_idx, frame_idx)
        poses = []
        for si, sf in enumerate(self.sens):
            for fi in range(sf.num_frames):
                self.frame_index.append((si, fi))
                poses.append(self.transform @ sf.poses[fi])
        self.poses = np.asarray(poses) if poses else np.zeros((0, 4, 4))

    def depth_frame(self, linear_id, width, height):
        si, fi = self.frame_index[linear_id]
        out = self.sens[si].depth_frame(fi, width, height)
        if out is None:
            return None
        depth, intr, pose = out
        return depth, intr, (self.transform @ pose)

    def close(self):
        for s in self.sens:
            s.close()

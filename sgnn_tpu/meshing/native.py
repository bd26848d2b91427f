"""ctypes bindings for the native marching-cubes core (cpp/mc.cpp).

Builds libmc.so on first use if g++ is available; falls back to the numpy
implementation otherwise (marching_cubes.run_marching_cubes handles that).
Set SGNN_TPU_NO_NATIVE=1 to force the numpy path (used by the parity test).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "cpp", "libmc.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


class _Native:
    def __init__(self, lib):
        self.lib = lib
        self.lib.mc_extract.restype = ctypes.c_int64
        self.lib.mc_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # tsdf
            ctypes.POINTER(ctypes.c_uint8),   # colors (nullable)
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # Z, Y, X
            ctypes.c_float, ctypes.c_float, ctypes.c_float,  # iso, trunc, thr
            ctypes.POINTER(ctypes.c_int32),   # edge table
            ctypes.POINTER(ctypes.c_int32),   # tri table
            ctypes.POINTER(ctypes.c_float),   # out verts
            ctypes.POINTER(ctypes.c_uint8),   # out colors
            ctypes.c_int64,                   # max tris
        ]

    def run(self, tsdf, colors, isovalue, truncation, thresh):
        from sgnn_tpu.meshing.tables import EDGE_TABLE, TRI_TABLE

        tsdf = np.ascontiguousarray(tsdf, np.float32)
        Z, Y, X = tsdf.shape
        col_ptr = None
        col_arr = None
        if colors is not None:
            col_arr = np.ascontiguousarray(colors, np.uint8)
            assert col_arr.shape == (Z, Y, X, 3)
            col_ptr = col_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        et = np.ascontiguousarray(EDGE_TABLE, np.int32)
        tt = np.ascontiguousarray(TRI_TABLE, np.int32)
        max_tris = max(4096, Z * Y * X // 8)
        while True:
            out_v = np.empty((max_tris, 3, 3), np.float32)
            out_c = np.empty((max_tris, 3, 3), np.uint8)
            n = self.lib.mc_extract(
                tsdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                col_ptr, Z, Y, X,
                ctypes.c_float(isovalue), ctypes.c_float(truncation),
                ctypes.c_float(thresh),
                et.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                tt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                max_tris,
            )
            if n >= 0:
                return out_v[:n].copy(), out_c[:n].copy()
            max_tris = -n  # retry with exact size


def get_native():
    """Returns the native impl, building it if needed, or None."""
    global _LIB, _TRIED
    if os.environ.get("SGNN_TPU_NO_NATIVE"):
        return None
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _TRIED:
            return None
        _TRIED = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", os.path.join(_DIR, "cpp"), "-s"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            _LIB = _Native(ctypes.CDLL(_SO))
        except OSError:
            return None
        return _LIB

"""ctypes bindings for the native geometry library (C++).

Native replacement for the role open3d's C++ core plays in the reference
evaluation stack (TSDF fusion, nearest-neighbor point metrics). Builds
lazily with g++ on first use; every entry point has a pure-Python fallback
(evaluation/tsdf.py, scipy cKDTree), so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libnvtgeom.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _float_p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(os.path.dirname(__file__), "src", "geometry.cc")
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
                 src, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tsdf_integrate_frame.argtypes = [
        ctypes.POINTER(ctypes.c_float)] * 3 + [
        ctypes.c_int64] * 3 + [
        ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float,
    ]
    lib.nn_distances.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def tsdf_fuse(frames_depth, frames_color, intrinsics, cam2world, origin,
              dims, voxel: float, trunc: float, depth_max: float = 5.0):
    """Multithreaded C++ TSDF fusion. Returns (tsdf, weight, color)."""
    lib = load()
    assert lib is not None
    X, Y, Z = (int(d) for d in dims)
    tsdf = np.ones(X * Y * Z, np.float32)
    weight = np.zeros(X * Y * Z, np.float32)
    has_color = frames_color is not None
    color = np.zeros(X * Y * Z * 3, np.float32) if has_color else None
    origin = np.ascontiguousarray(origin, np.float32)
    F = len(frames_depth)
    intr = np.broadcast_to(np.asarray(intrinsics, np.float32), (F, 4))
    for f in range(F):
        d = np.ascontiguousarray(frames_depth[f], np.float32)
        H, W = d.shape
        c = (np.ascontiguousarray(frames_color[f], np.float32)
             if has_color else None)
        m = np.ascontiguousarray(cam2world[f], np.float32)
        ci = np.ascontiguousarray(intr[f], np.float32)
        lib.tsdf_integrate_frame(
            _float_p(tsdf), _float_p(weight),
            _float_p(color) if has_color else None,
            X, Y, Z, _float_p(origin),
            ctypes.c_float(voxel), ctypes.c_float(trunc),
            _float_p(d), _float_p(c) if has_color else None,
            H, W, _float_p(ci), _float_p(m), ctypes.c_float(depth_max),
        )
    return (
        tsdf.reshape(X, Y, Z),
        weight.reshape(X, Y, Z),
        color.reshape(X, Y, Z, 3) if has_color else None,
    )


def nn_distances(ref: np.ndarray, query: np.ndarray,
                 cell: float = 0.05) -> np.ndarray:
    """Nearest-neighbor distances query->ref via the native hash grid."""
    lib = load()
    assert lib is not None
    ref = np.ascontiguousarray(ref, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    out = np.zeros(len(query), np.float32)
    lib.nn_distances(
        _float_p(ref), len(ref), _float_p(query), len(query),
        ctypes.c_float(cell), _float_p(out),
    )
    return out


def available() -> bool:
    return load() is not None

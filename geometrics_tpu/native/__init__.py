"""ctypes bindings for the native data-prep library (native/voxelizer.cpp).

Replaces the reference's ``binvox`` subprocess (SURVEY.md §2.2, the only
native piece of the reference pipeline) with in-process C++: solid
voxelization + area-weighted surface sampling.  Builds the .so on first use
if missing (make, g++); callers fall back to the numpy twins in
data/synthetic.py when unavailable — functionality is identical, this path
is a data-prep throughput optimization.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgx_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gx_voxelize_solid.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8)]
        lib.gx_sample_surface.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def voxelize_mesh(verts: np.ndarray, faces: np.ndarray, res: int = 32,
                  lo: float = -1.0, hi: float = 1.0) -> np.ndarray:
    """Solid res³ occupancy grid from triangles (binvox-equivalent contract)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; use voxelize_solid_np")
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    out = np.zeros((res, res, res), np.uint8)
    lib.gx_voxelize_solid(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        res, lo, hi, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(np.float32)


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                   seed: int = 0,
                   return_normals: bool = True
                   ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """n area-weighted surface points (+ unit normals) from triangles."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; use sample_surface_np")
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    pts = np.zeros((n, 3), np.float32)
    nrm = np.zeros((n, 3), np.float32) if return_normals else None
    lib.gx_sample_surface(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f), n,
        seed, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if nrm is not None else None)
    return pts, nrm

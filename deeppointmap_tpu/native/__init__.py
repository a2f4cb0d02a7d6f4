"""Native host-side kernels (C++, ctypes-bound) with NumPy fallbacks.

The compute path is JAX/Pallas on the TPU; the host-side data plumbing
(voxel hashing, scan decoding) is the one place plain C++ beats NumPy.
The shared library is built on first use (g++ -O3 -shared); all callers
fall back to the NumPy implementations if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libvoxel_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _HERE], check=True,
                               capture_output=True, timeout=120)
            except Exception as e:
                logger.warning("native build failed (%s); using NumPy "
                               "fallbacks", e)
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.voxel_downsample.restype = ctypes.c_int
            lib.voxel_downsample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32)]
            lib.read_kitti_xyz.restype = ctypes.c_int
            lib.read_kitti_xyz.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except OSError as e:
            logger.warning("native library load failed (%s)", e)
    return _lib


def available() -> bool:
    return _load() is not None


def voxel_downsample_indices_native(xyz: np.ndarray, voxel_size: float,
                                    retention: str = "center"
                                    ) -> Optional[np.ndarray]:
    """Same contract as data.voxel.voxel_downsample_indices; None if the
    native library is unavailable. Note: survivor SET matches the NumPy
    path; for 'first' retention order is first-seen (identical), for
    'center' the per-voxel winner is identical."""
    lib = _load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    n = xyz.shape[0]
    out = np.empty(n, dtype=np.int32)
    ret = {"first": 0, "center": 1}[retention]
    k = lib.voxel_downsample(
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(voxel_size), ret,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out[:k].astype(np.int64)


def read_kitti_xyz_native(raw: np.ndarray) -> Optional[np.ndarray]:
    """(N, 4) float32 KITTI rows -> (M, 3) xyz with NaN rows dropped."""
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.float32)
    n = raw.shape[0]
    out = np.empty((n, 3), dtype=np.float32)
    k = lib.read_kitti_xyz(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:k]

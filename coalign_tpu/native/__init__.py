"""ctypes loader for the native data plane (builds on first import).

The C++ library (data_plane.cpp) implements the host-side hot loop: PCD
parsing, range-mask + deterministic subsample + pad, and point projection.
Falls back to the pure-numpy implementations (data/pcd_io.py, utils/) when
a compiler is unavailable, so the framework never hard-depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "data_plane.cpp")
_SO = os.path.join(_HERE, "libcoalign_data_plane.so")

_lib = None
_build_error = None


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.parse_pcd.restype = ctypes.c_int64
        lib.parse_pcd.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                  ctypes.c_int64]
        lib.mask_pad_points.restype = ctypes.c_int64
        lib.mask_pad_points.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_float, ctypes.c_float, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64]
        lib.transform_points.restype = None
        lib.transform_points.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                         ctypes.c_void_p]
        _lib = lib
        return _lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _build_error = e
        return None


def available() -> bool:
    return load() is not None


def parse_pcd(path: str, max_points: int = 200000) -> np.ndarray:
    """Native PCD parse -> (N, 4) float32; raises if the lib is missing."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"native data plane unavailable: {_build_error}")
    out = np.empty((max_points, 4), dtype=np.float32)
    n = lib.parse_pcd(path.encode(), out.ctypes.data, max_points)
    if n < 0:
        raise IOError(f"parse_pcd failed for {path}")
    return out[:n].copy()


def mask_pad_points(points: np.ndarray, lidar_range, max_out: int,
                    ego_x_radius: float = 0.0, ego_y_radius: float = 0.0):
    """Range-mask + deterministic subsample + pad into (max_out, 4).

    Returns (padded (max_out, 4) float32, mask (max_out,) bool)."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"native data plane unavailable: {_build_error}")
    pts = np.ascontiguousarray(points, dtype=np.float32)
    rng6 = np.asarray(lidar_range, dtype=np.float32)
    out = np.zeros((max_out, 4), dtype=np.float32)
    mask = np.zeros(max_out, dtype=np.uint8)
    lib.mask_pad_points(pts.ctypes.data, len(pts), rng6.ctypes.data,
                        ctypes.c_float(ego_x_radius),
                        ctypes.c_float(ego_y_radius),
                        out.ctypes.data, mask.ctypes.data, max_out)
    return out, mask.astype(bool)


def transform_points(points: np.ndarray, tfm: np.ndarray) -> np.ndarray:
    """In-place-capable 4x4 projection of (N, 4) points (xyz columns)."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"native data plane unavailable: {_build_error}")
    pts = np.ascontiguousarray(points, dtype=np.float32).copy()
    t = np.ascontiguousarray(tfm, dtype=np.float32)
    lib.transform_points(pts.ctypes.data, len(pts), t.ctypes.data)
    return pts

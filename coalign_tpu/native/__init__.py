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
        lib.parse_pcd_batch.restype = ctypes.c_int64
        lib.parse_pcd_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64]
        lib.voxelize_pillars.restype = ctypes.c_int64
        lib.voxelize_pillars.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_float, ctypes.c_float, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32]
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


def parse_pcd_batch(paths, max_points: int = 200000,
                    n_threads: int = 0) -> list:
    """Parse many PCD files in parallel C++ threads (the reference's
    DataLoader-worker role, ref tools/train.py:42 num_workers=4).

    Returns a list of (N_i, 4) float32 views into one shared buffer (copy
    before mutating). Raises on the first unreadable file."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"native data plane unavailable: {_build_error}")
    n = len(paths)
    if n == 0:
        return []
    out = np.empty((n, max_points, 4), dtype=np.float32)
    counts = np.empty(n, dtype=np.int64)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.parse_pcd_batch(arr, n, out.ctypes.data, counts.ctypes.data,
                        max_points, n_threads)
    bad = np.nonzero(counts < 0)[0]
    if len(bad):
        raise IOError(f"parse_pcd failed for {paths[int(bad[0])]}")
    return [out[i, :counts[i]] for i in range(n)]


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


class PillarVoxelizer:
    """Reusable host voxelizer: points -> fixed-capacity pillar tables.

    The scratch grid is epoch-reset (no per-call memset). One instance per
    worker; not thread-safe."""

    def __init__(self, lidar_range, voxel_size, max_pillars=32000,
                 max_pts=32):
        lib = load()
        if lib is None:
            raise RuntimeError(
                f"native data plane unavailable: {_build_error}")
        self.lib = lib
        self.range6 = np.asarray(lidar_range, dtype=np.float32)
        self.vx, self.vy = float(voxel_size[0]), float(voxel_size[1])
        self.nx = int(round((lidar_range[3] - lidar_range[0]) / self.vx))
        self.ny = int(round((lidar_range[4] - lidar_range[1]) / self.vy))
        self.max_pillars = max_pillars
        self.max_pts = max_pts
        self.grid_slot = np.zeros(self.nx * self.ny, dtype=np.int32)
        self.grid_epoch = np.full(self.nx * self.ny, -1, dtype=np.int32)
        self.epoch = 0

    def __call__(self, points: np.ndarray):
        """Returns (pillar_pts (M, P, 4), coords (M, 2 iy/ix), npts (M,),
        count) with M = max_pillars, zero padded."""
        pts = np.ascontiguousarray(points, dtype=np.float32)
        out = np.zeros((self.max_pillars, self.max_pts, 4), dtype=np.float32)
        coords = np.zeros((self.max_pillars, 2), dtype=np.int32)
        npts = np.zeros(self.max_pillars, dtype=np.int32)
        self.epoch += 1
        count = self.lib.voxelize_pillars(
            pts.ctypes.data, len(pts), self.range6.ctypes.data,
            ctypes.c_float(self.vx), ctypes.c_float(self.vy),
            self.nx, self.ny, self.max_pillars, self.max_pts,
            out.ctypes.data, coords.ctypes.data, npts.ctypes.data,
            self.grid_slot.ctypes.data, self.grid_epoch.ctypes.data,
            ctypes.c_int32(self.epoch))
        return out, coords, npts, int(count)


def transform_points(points: np.ndarray, tfm: np.ndarray) -> np.ndarray:
    """In-place-capable 4x4 projection of (N, 4) points (xyz columns)."""
    lib = load()
    if lib is None:
        raise RuntimeError(f"native data plane unavailable: {_build_error}")
    pts = np.ascontiguousarray(points, dtype=np.float32).copy()
    t = np.ascontiguousarray(tfm, dtype=np.float32)
    lib.transform_points(pts.ctypes.data, len(pts), t.ctypes.data)
    return pts

"""Bandwidth accounting + optional Draco point compression measurement.

TPU-first rework of ref opencood/utils/draco_compression.py (Google Draco
CLI wrapper measuring compressed keypoint bytes) and the bandwidth notes of
docs/md_files/lidar_benchmark.md: transmitted-feature sizes are computed
analytically (the "communication" is simulated in-tensor, SURVEY §2.11);
Draco measurement shells out only when the binary exists.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np


def feature_map_bytes(shape, dtype_bits: int = 32,
                      compression_ratio: float = 1.0) -> float:
    """Bytes to transmit one BEV feature map (optionally through the
    NaiveCompressor bottleneck ratio)."""
    numel = float(np.prod(shape))
    return numel * dtype_bits / 8.0 / max(compression_ratio, 1e-9)


def comm_volume_mbits(shape, dtype_bits: int = 32,
                      compression_ratio: float = 1.0) -> float:
    """Mbit per agent per frame (the lidar_benchmark.md accounting)."""
    return feature_map_bytes(shape, dtype_bits, compression_ratio) * 8 / 1e6


def masked_comm_volume_mbits(mask_rate: float, shape,
                             dtype_bits: int = 32) -> float:
    """Where2comm-style sparse transmission: only masked pixels move."""
    return comm_volume_mbits(shape, dtype_bits) * float(mask_rate)


def draco_available() -> bool:
    return shutil.which("draco_encoder") is not None


def draco_compressed_bytes(points: np.ndarray, qp: int = 14) -> int:
    """Compress (N, 3) points with the Draco CLI, return encoded size.
    Raises RuntimeError when draco_encoder is not installed (it is not part
    of this image; the analytic accounting above is the default path)."""
    if not draco_available():
        raise RuntimeError("draco_encoder binary not found")
    with tempfile.TemporaryDirectory() as d:
        ply = os.path.join(d, "pts.ply")
        drc = os.path.join(d, "pts.drc")
        with open(ply, "w") as f:
            f.write("ply\nformat ascii 1.0\n"
                    f"element vertex {len(points)}\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n")
            for p in points:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
        subprocess.run(["draco_encoder", "-point_cloud", "-i", ply,
                        "-o", drc, "-qp", str(qp)],
                       check=True, capture_output=True)
        return os.path.getsize(drc)

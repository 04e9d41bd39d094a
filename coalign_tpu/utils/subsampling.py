"""Point-cloud subsampling utilities.

TPU-first rework of ref opencood/utils/subsampling_utils.py (voxel-grid
subsampling) and pcd_utils downsample helpers: vectorized numpy — these run
host-side in the data plane, before padding to fixed shapes.
"""

from __future__ import annotations

import numpy as np


def voxel_grid_subsample(points: np.ndarray, voxel_size: float):
    """Keep one point per occupied voxel (the first, like the reference's
    hash-based picker). points (N, >=3) -> (M, ...)."""
    keys = np.floor(points[:, :3] / voxel_size).astype(np.int64)
    # lexicographic unique over 3 columns
    _, idx = np.unique(keys, axis=0, return_index=True)
    return points[np.sort(idx)]


def random_subsample(points: np.ndarray, num: int, rng=None):
    """Uniformly subsample (or keep all when fewer) — ref pcd_utils
    downsample_lidar."""
    if len(points) <= num:
        return points
    rng = rng or np.random.default_rng(0)
    sel = rng.choice(len(points), num, replace=False)
    return points[sel]


def mask_ego_points(points: np.ndarray, x_radius=1.95, y_radius=1.1):
    """Drop returns from the ego vehicle body (ref pcd_utils
    mask_ego_points)."""
    keep = ~((np.abs(points[:, 0]) < x_radius)
             & (np.abs(points[:, 1]) < y_radius))
    return points[keep]

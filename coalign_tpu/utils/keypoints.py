"""BEV keypoint sampling (FPV-RCNN stage-2 support).

TPU-first rework of ref opencood/utils/keypoint_utils.py:157 (bev_sample —
line-detection-guided keypoint picking on the BEV occupancy image): saliency
is the local occupancy-gradient magnitude (edges of structures, where the
reference's line detector fires), the top-S salient cells are taken with a
fixed budget, and farthest-point sampling spreads the final K keypoints —
all fixed-shape device ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coalign_tpu.ops.roi import farthest_point_sample


def bev_saliency(occupancy):
    """(H, W) occupancy/intensity -> (H, W) edge-magnitude saliency."""
    gx = jnp.zeros_like(occupancy)
    gy = jnp.zeros_like(occupancy)
    gx = gx.at[:, 1:-1].set(occupancy[:, 2:] - occupancy[:, :-2])
    gy = gy.at[1:-1, :].set(occupancy[2:, :] - occupancy[:-2, :])
    return jnp.abs(gx) + jnp.abs(gy)


def sample_bev_keypoints(points, mask, lidar_range, voxel=0.4,
                         num_keypoints: int = 512, pool: int = 4096):
    """Pick K spread-out keypoints from the salient parts of a cloud.

    points (N, 3+), mask (N,) -> (K,) indices into points.
    """
    h = int(round((lidar_range[4] - lidar_range[1]) / voxel))
    w = int(round((lidar_range[3] - lidar_range[0]) / voxel))
    ix = jnp.floor((points[:, 0] - lidar_range[0]) / voxel).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - lidar_range[1]) / voxel).astype(jnp.int32)
    inb = mask & (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ids = jnp.where(inb, iy * w + ix, h * w)
    occ = jax.ops.segment_max(inb.astype(points.dtype), ids,
                              num_segments=h * w + 1)[:-1]
    sal = bev_saliency(jnp.maximum(occ, 0.0).reshape(h, w)).reshape(-1)
    point_sal = jnp.where(inb, sal[jnp.clip(ids, 0, h * w - 1)], -1.0)

    pool = min(pool, points.shape[0])
    top_sal, top_idx = jax.lax.top_k(point_sal, pool)
    pool_mask = top_sal > 0
    k = min(num_keypoints, pool)
    sel = farthest_point_sample(points[top_idx, :3], pool_mask, k)
    return top_idx[sel]

"""RoI feature extraction on BEV grids: rotated grid pooling + point sampling.

TPU-first replacement for the reference's CUDA RoI stack
(ref opencood/pcdet_utils/roiaware_pool3d/ — points-in-rotated-box pooling —
and sub_modules/roi_head.py:13 RoIHead grid pooling, vsa.py:45
VoxelSetAbstraction): instead of pooling raw points with ball-query CUDA
kernels, RoI features are read from the dense BEV feature map by bilinear
sampling a fixed rotated grid inside each (padded) box — a batched gather,
the natural TPU analogue. Point-in-rotated-box tests are plain affine
transforms + bounds checks (pure XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coalign_tpu.ops.warp import _bilinear_gather


def bev_grid_coords(xy, lidar_range, voxel_size, feature_stride):
    """Metric (x, y) -> fractional (col, row) pixel coords on a BEV feature
    map whose rows are y and cols are x (pillar-scatter convention)."""
    fx = (xy[..., 0] - lidar_range[0]) / (voxel_size[0] * feature_stride)
    fy = (xy[..., 1] - lidar_range[1]) / (voxel_size[1] * feature_stride)
    return fx - 0.5, fy - 0.5


def sample_bev_features(feat, xy, lidar_range, voxel_size, feature_stride):
    """Bilinear-sample (H, W, C) BEV features at metric (..., 2) points."""
    fx, fy = bev_grid_coords(xy, lidar_range, voxel_size, feature_stride)
    return _bilinear_gather(feat, fx, fy)


def roi_grid_points(boxes, grid_size: int = 6):
    """Fixed rotated grid of points inside each box footprint.

    boxes: (R, 7) hwl center-form. Returns (R, grid_size^2, 2) metric xy.
    Mirrors the RoI grid pool sampling of ref roi_head.py (3D grid collapsed
    to BEV since our stage-2 features are BEV maps)."""
    g = grid_size
    u = (jnp.arange(g) + 0.5) / g - 0.5          # (-0.5, 0.5)
    gx, gy = jnp.meshgrid(u, u, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (g*g, 2)
    l, w_, yaw = boxes[:, 5], boxes[:, 4], boxes[:, 6]
    local = grid[None] * jnp.stack([l, w_], -1)[:, None, :]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rx = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    ry = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    return jnp.stack([rx + boxes[:, None, 0], ry + boxes[:, None, 1]], -1)


def roi_grid_pool(feat, boxes, lidar_range, voxel_size, feature_stride,
                  grid_size: int = 6):
    """(H, W, C) BEV + (R, 7) boxes -> (R, grid_size^2, C) pooled features."""
    pts = roi_grid_points(boxes, grid_size)              # (R, G, 2)
    return sample_bev_features(feat, pts, lidar_range, voxel_size,
                               feature_stride)


def points_in_rotated_boxes(points, boxes):
    """(N, 3) points x (R, 7) hwl boxes -> (R, N) bool membership.

    The pure-XLA replacement for roiaware_pool3d's CUDA kernel."""
    dx = points[None, :, 0] - boxes[:, None, 0]
    dy = points[None, :, 1] - boxes[:, None, 1]
    dz = points[None, :, 2] - boxes[:, None, 2]
    c, s = jnp.cos(boxes[:, 6])[:, None], jnp.sin(boxes[:, 6])[:, None]
    u = dx * c + dy * s
    v = -dx * s + dy * c
    return ((jnp.abs(u) <= boxes[:, None, 5] / 2)
            & (jnp.abs(v) <= boxes[:, None, 4] / 2)
            & (jnp.abs(dz) <= boxes[:, None, 3] / 2))


def farthest_point_sample(points, mask, k: int):
    """Iterative farthest-point sampling of (N, 3) masked points -> (k,)
    indices. The FPS half of pointnet2's CUDA sampling as a lax scan."""
    n = points.shape[0]
    big = jnp.asarray(1e9, points.dtype)
    d2 = jnp.where(mask, big, -big)  # invalid points never selected

    def body(carry, _):
        dist, last = carry
        diff = points - points[last]
        nd = jnp.sum(diff * diff, axis=-1)
        dist = jnp.minimum(dist, jnp.where(mask, nd, -big))
        nxt = jnp.argmax(dist)
        return (dist, nxt), nxt

    first = jnp.argmax(mask)  # first valid point
    (_, _), idx = jax.lax.scan(body, (d2, first), None, length=k - 1)
    return jnp.concatenate([first[None], idx])

"""Point -> pillar decoration and dense-BEV scatter, fused and fixed-shape.

TPU-first replacement for the reference's three-stage CPU/GPU pipeline
(spconv VoxelGeneratorV2 in dataloader workers -> PillarVFE ->
PointPillarScatter; ref opencood/data_utils/pre_processor/
sp_voxel_preprocessor.py:22, opencood/models/sub_modules/pillar_vfe.py:56,
point_pillar_scatter.py:5).

Instead of building a (M, 32, 4) padded pillar table with dynamic M, we keep
the raw padded point list (N, 4) per frame and do everything as segment
reductions keyed by the flat pillar id:

  1. pillar id per point:  iy * nx + ix  (static grid, invalid -> sentinel)
  2. per-pillar stats:     segment_sum -> cluster mean, gathered back
  3. decoration:           [x, y, z, i, dxyz_cluster, dxyz_center] (10 ch)
  4. point MLP:            Linear+BN+ReLU on (N, 10) — one big MXU matmul
  5. scatter:              segment_max of point features over pillar ids
                           directly into the dense (ny*nx, C) BEV canvas

This is mathematically the reference PillarVFE (max over points per pillar
commutes with the per-point MLP) but with no voxel-count caps, no
max-points-per-pillar truncation and no host voxelizer. The scatter grid is
y-major: BEV row = y index, col = x index (ref point_pillar_scatter.py:64).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PillarSpec(NamedTuple):
    """Static voxel-grid geometry derived from the yaml config.

    lidar_range: (x_min, y_min, z_min, x_max, y_max, z_max)
    voxel_size:  (vx, vy, vz)
    nx, ny:      BEV grid size (cols = x, rows = y)
    """

    lidar_range: tuple
    voxel_size: tuple
    nx: int
    ny: int

    @classmethod
    def from_config(cls, lidar_range, voxel_size):
        nx = int(round((lidar_range[3] - lidar_range[0]) / voxel_size[0]))
        ny = int(round((lidar_range[4] - lidar_range[1]) / voxel_size[1]))
        return cls(tuple(lidar_range), tuple(voxel_size), nx, ny)


def pillar_ids(points, mask, spec: PillarSpec):
    """Flat pillar id per point; invalid points get id == ny*nx (sentinel).

    points: (..., N, 4), mask: (..., N) bool.
    Returns (ids (..., N) int32, valid (..., N) bool).
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    r = spec.lidar_range
    ix = jnp.floor((x - r[0]) / spec.voxel_size[0]).astype(jnp.int32)
    iy = jnp.floor((y - r[1]) / spec.voxel_size[1]).astype(jnp.int32)
    valid = (
        mask
        & (x >= r[0]) & (x < r[3]) & (y >= r[1]) & (y < r[4])
        & (z >= r[2]) & (z <= r[5])
        & (ix >= 0) & (ix < spec.nx) & (iy >= 0) & (iy < spec.ny)
    )
    ids = jnp.where(valid, iy * spec.nx + ix, spec.ny * spec.nx)
    return ids, valid


def decorate_points(points, ids, valid, spec: PillarSpec):
    """Per-point 10-channel pillar decoration (ref pillar_vfe.py:118-143).

    points: (N, 4), ids: (N,), valid: (N,) for ONE frame.
    Returns (N, 10) float features, zeroed for invalid points.
    """
    num_seg = spec.ny * spec.nx + 1
    ones = valid.astype(points.dtype)
    xyz = points[:, :3] * ones[:, None]
    seg_sum = jax.ops.segment_sum(xyz, ids, num_segments=num_seg)
    seg_cnt = jax.ops.segment_sum(ones, ids, num_segments=num_seg)
    mean = seg_sum / jnp.maximum(seg_cnt, 1.0)[:, None]
    f_cluster = points[:, :3] - mean[ids]

    ix = (ids % spec.nx).astype(points.dtype)
    iy = jnp.minimum(ids // spec.nx, spec.ny - 1).astype(points.dtype)
    r, v = spec.lidar_range, spec.voxel_size
    cx = ix * v[0] + (v[0] / 2 + r[0])
    cy = iy * v[1] + (v[1] / 2 + r[1])
    cz = jnp.full_like(cx, v[2] / 2 + r[2])
    f_center = points[:, :3] - jnp.stack([cx, cy, cz], axis=-1)

    feats = jnp.concatenate([points, f_cluster, f_center], axis=-1)
    return feats * ones[:, None]


def scatter_max_bev(point_feats, ids, valid, spec: PillarSpec):
    """Max-reduce per-point features into the dense BEV canvas.

    point_feats: (N, C), ids: (N,), valid: (N,) for ONE frame.
    Returns (ny, nx, C) with empty pillars = 0 (matching the reference's
    zero-initialized scatter canvas, point_pillar_scatter.py:44).
    """
    num_seg = spec.ny * spec.nx + 1
    neg = jnp.finfo(point_feats.dtype).min
    feats = jnp.where(valid[:, None], point_feats, neg)
    bev = jax.ops.segment_max(feats, ids, num_segments=num_seg)
    occupied = jax.ops.segment_sum(valid.astype(jnp.int32), ids,
                                   num_segments=num_seg) > 0
    bev = jnp.where(occupied[:-1, None], bev[:-1], 0.0)
    return bev.reshape(spec.ny, spec.nx, -1)


def pillar_count_bev(ids, valid, spec: PillarSpec):
    """(ny, nx) int32 point counts per pillar (useful for masks/debug)."""
    num_seg = spec.ny * spec.nx + 1
    cnt = jax.ops.segment_sum(valid.astype(jnp.int32), ids,
                              num_segments=num_seg)
    return cnt[:-1].reshape(spec.ny, spec.nx)

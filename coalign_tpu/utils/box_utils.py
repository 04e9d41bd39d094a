"""3D box utilities: center <-> corner, projection, range masks, encode/decode.

TPU-first rework of opencood/utils/box_utils.py — pure, fixed shapes,
mask-friendly (invalid boxes are carried through and masked by the caller).
DUAL-DISPATCH (utils/common.array_namespace): numpy in -> numpy compute
(host data plane, no device round-trips), jax arrays/tracers -> jnp.

Box order conventions follow the reference:
  * 'hwl' (PointPillars family): box = [x, y, z, h, w, l, yaw]
  * 'lwh': box = [x, y, z, l, w, h, yaw]
yaw is radians around +z. (x, y, z) is the box center.
"""

from __future__ import annotations

import numpy as np

from coalign_tpu.utils.common import array_namespace, rotate_points_along_z
from coalign_tpu.utils.transforms import project_points

# Corner template (ref box_utils.py:193-196): bottom face 0-3, top face 4-7.
# Kept as a NUMPY constant: np * np stays np, jnp * np promotes to jnp.
_CORNER_TEMPLATE = np.array(
    [
        [1, -1, -1], [1, 1, -1], [-1, 1, -1], [-1, -1, -1],
        [1, -1, 1], [1, 1, 1], [-1, 1, 1], [-1, -1, 1],
    ],
    dtype=np.float32,
) / 2.0


def boxes_to_corners_3d(boxes3d, order: str = "hwl"):
    """(N, 7) boxes -> (N, 8, 3) corners. Ref box_utils.py:152."""
    xp = array_namespace(boxes3d)
    boxes3d = xp.asarray(boxes3d)
    if order == "hwl":
        boxes3d = boxes3d[..., [0, 1, 2, 5, 4, 3, 6]]  # -> lwh
    else:
        assert order == "lwh", f"unknown order {order}"
    dims = boxes3d[..., 3:6]
    corners = dims[..., None, :] * _CORNER_TEMPLATE  # (..., 8, 3)
    flat = corners.reshape(-1, 8, 3)
    yaw = boxes3d[..., 6].reshape(-1)
    rotated = rotate_points_along_z(flat, yaw)
    rotated = rotated.reshape(corners.shape)
    return rotated + boxes3d[..., None, :3]


def boxes_to_corners2d(boxes3d, order: str = "hwl"):
    """(N, 7) -> (N, 4, 2) BEV bottom-face corners (ref box_utils.py:121)."""
    corners = boxes_to_corners_3d(boxes3d, order)
    return corners[..., :4, :2]


def corners_to_standup_2d(corners):
    """(..., K>=4, 2or3) corners -> (..., 4) [x1, y1, x2, y2] standup boxes.

    Ref box_utils.py corner2d_to_standup_box / corner_to_standup_box_torch.
    """
    xp = array_namespace(corners)
    corners = xp.asarray(corners)
    x = corners[..., 0]
    y = corners[..., 1]
    return xp.stack(
        [x.min(axis=-1), y.min(axis=-1), x.max(axis=-1), y.max(axis=-1)],
        axis=-1)


def corner_to_center(corner3d, order: str = "hwl"):
    """(N, 8, 3) corners -> (N, 7) boxes. Ref box_utils.py:25 corner_to_center."""
    xp = array_namespace(corner3d)
    corner3d = xp.asarray(corner3d)
    xyz = xp.mean(corner3d[..., [0, 3, 5, 6], :], axis=-2)
    h = xp.abs(xp.mean(corner3d[..., 4:, 2] - corner3d[..., :4, 2], axis=-1))

    def _edge(a, b):
        d = corner3d[..., a, :2] - corner3d[..., b, :2]
        return xp.sqrt(xp.sum(d * d, axis=-1))

    l = (_edge(0, 3) + _edge(2, 1) + _edge(4, 7) + _edge(5, 6)) / 4.0
    w = (_edge(0, 1) + _edge(2, 3) + _edge(4, 5) + _edge(6, 7)) / 4.0

    def _theta(a, b):
        d = corner3d[..., a, :] - corner3d[..., b, :]
        return xp.arctan2(d[..., 1], d[..., 0])

    theta = (_theta(1, 2) + _theta(0, 3) + _theta(5, 6) + _theta(4, 7)) / 4.0

    if order == "hwl":
        return xp.stack(
            [xyz[..., 0], xyz[..., 1], xyz[..., 2], h, w, l, theta], axis=-1)
    assert order == "lwh"
    return xp.stack(
        [xyz[..., 0], xyz[..., 1], xyz[..., 2], l, w, h, theta], axis=-1)


def project_box3d(corners3d, transformation_matrix):
    """Project (N, 8, 3) corners with a 4x4 transform (ref box_utils.py:278)."""
    return project_points(corners3d, transformation_matrix)


def project_boxes7_by_tfm(boxes7, tfm, order: str = "hwl"):
    """Project center-form boxes through an SE(3) transform, staying (N, 7)."""
    corners = boxes_to_corners_3d(boxes7, order)
    return corner_to_center(project_box3d(corners, tfm), order)


def mask_boxes_outside_range(boxes7, limit_range, order: str = "hwl"):
    """Validity mask for center-form boxes vs a [x1,y1,z1,x2,y2,z2] range.

    Keeps a box if any BEV corner is inside the xy range (matching
    ref box_utils.py:348 get_mask_for_boxes_within_range which tests corner
    points). Returns bool (N,).
    """
    corners = boxes_to_corners_3d(boxes7, order)
    return mask_corners_outside_range(corners, limit_range)


def mask_corners_outside_range(corners, limit_range):
    """(N, 8, 3) corner boxes -> bool (N,) any-corner-in-xy-range mask."""
    xp = array_namespace(corners)
    corners = xp.asarray(corners)
    inside = (
        (corners[..., 0] >= limit_range[0]) & (corners[..., 0] <= limit_range[3])
        & (corners[..., 1] >= limit_range[1]) & (corners[..., 1] <= limit_range[4])
    )
    return xp.any(inside, axis=-1)


def mask_corners_all_inside_range(corners, limit_range, min_num_corners=8):
    """(N, 8, 3) corners -> bool (N,): at least ``min_num_corners`` corners
    inside the full xyz [x1,y1,z1,x2,y2,z2] box.

    Exact counterpart of ref box_utils.py:384 mask_boxes_outside_range_numpy
    (default min_num_corners=8, all three dims checked) — the convention the
    reference applies to BOTH final predictions (voxel_postprocessor.py:393,
    AFTER NMS) and fused gt boxes (base_postprocessor.py:101).
    """
    xp = array_namespace(corners)
    corners = xp.asarray(corners)
    lo = xp.asarray(limit_range[0:3], dtype=corners.dtype)
    hi = xp.asarray(limit_range[3:6], dtype=corners.dtype)
    inside = xp.all((corners >= lo) & (corners <= hi), axis=-1)  # (N, 8)
    return xp.sum(inside, axis=-1) >= min_num_corners


def remove_large_pred_bbx(corners3d, max_extent=6.0):
    """Sanity mask against degenerate decoded boxes (ref box_utils.py:840).

    Bit-exact reference semantics: the AXIS-ALIGNED extents of the projected
    corners must satisfy x_len <= 6 and y_len <= 6. (The reference also
    computes "z_len" from corner column 1 — i.e. y again, box_utils.py:862 —
    and ands the raw float in, so the effective third condition is
    y_len != 0; replicated here for parity.)

    corners3d: (N, 8, 3) -> bool (N,).
    """
    xp = array_namespace(corners3d)
    corners3d = xp.asarray(corners3d)
    x_len = (xp.max(corners3d[..., 0], axis=-1)
             - xp.min(corners3d[..., 0], axis=-1))
    y_len = (xp.max(corners3d[..., 1], axis=-1)
             - xp.min(corners3d[..., 1], axis=-1))
    return (x_len <= max_extent) & (y_len <= max_extent) & (y_len != 0.0)


def remove_bbx_abnormal_z(corners3d, min_z=-3.0, max_z=1.0):
    """Mask boxes with ALL corner z inside [min_z, max_z] (ref
    box_utils.py:872: bbx_z_min >= -3 and bbx_z_max <= 1)."""
    xp = array_namespace(corners3d)
    z = xp.asarray(corners3d)[..., 2]
    return (xp.min(z, axis=-1) >= min_z) & (xp.max(z, axis=-1) <= max_z)


def mask_points_by_range(points, limit_range):
    """bool (N,) mask of points inside [x1,y1,z1,x2,y2,z2]."""
    xp = array_namespace(points)
    points = xp.asarray(points)
    return (
        (points[..., 0] >= limit_range[0]) & (points[..., 0] <= limit_range[3])
        & (points[..., 1] >= limit_range[1]) & (points[..., 1] <= limit_range[4])
        & (points[..., 2] >= limit_range[2]) & (points[..., 2] <= limit_range[5])
    )

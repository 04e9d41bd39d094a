"""Axis-aligned and rotated-BEV IoU — fixed-shape, fully vectorized.

Replaces three native components of the reference with pure XLA:
  * Cython ``bbox_overlaps`` (opencood/utils/box_overlaps.pyx) used for
    anchor-target assignment  -> :func:`standup_iou` (note the reference
    inherits Faster-RCNN's ``+1`` box-size convention; pass ``offset=1.0``
    to reproduce it).
  * shapely polygon IoU (opencood/utils/common_utils.py:196 compute_iou)
    used by NMS + evaluation  -> :func:`rotated_iou_corners`.
  * CUDA ``iou3d_nms`` (opencood/pcdet_utils/iou3d_nms) used by the IoU head
    loss -> :func:`aligned_boxes_iou3d`.

The rotated intersection uses the convex-polygon candidate-vertex method
(corner containment + edge crossings -> angle sort -> shoelace), which is
branch-free and maps to dense vector ops instead of the reference's
sequential polygon clipping.
"""

from __future__ import annotations

import jax.numpy as jnp


def standup_iou(boxes, query_boxes, offset: float = 0.0):
    """IoU matrix of axis-aligned [x1, y1, x2, y2] boxes.

    boxes: (N, 4), query_boxes: (K, 4) -> (N, K).
    offset=1.0 reproduces the reference Cython bbox_overlaps (+1 sizes).
    """
    boxes = jnp.asarray(boxes)
    query = jnp.asarray(query_boxes)
    area1 = (boxes[:, 2] - boxes[:, 0] + offset) * (boxes[:, 3] - boxes[:, 1] + offset)
    area2 = (query[:, 2] - query[:, 0] + offset) * (query[:, 3] - query[:, 1] + offset)
    iw = (jnp.minimum(boxes[:, None, 2], query[None, :, 2])
          - jnp.maximum(boxes[:, None, 0], query[None, :, 0]) + offset)
    ih = (jnp.minimum(boxes[:, None, 3], query[None, :, 3])
          - jnp.maximum(boxes[:, None, 1], query[None, :, 1]) + offset)
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def polygon_area(corners, xp=jnp):
    """Shoelace area of (..., K, 2) polygons with vertices in order."""
    corners = xp.asarray(corners)
    x = corners[..., 0]
    y = corners[..., 1]
    x_next = xp.roll(x, -1, axis=-1)
    y_next = xp.roll(y, -1, axis=-1)
    return 0.5 * xp.abs(xp.sum(x * y_next - x_next * y, axis=-1))


def _points_in_quad(points, quad, eps=1e-6, xp=jnp):
    """points: (..., P, 2), quad: (..., 4, 2) convex, any winding -> bool (..., P)."""
    a = quad
    b = xp.roll(quad, -1, axis=-2)
    edge = b - a  # (..., 4, 2)
    # cross(edge_k, p - a_k) for all points x edges
    rel = points[..., :, None, :] - a[..., None, :, :]  # (..., P, 4, 2)
    cross = (edge[..., None, :, 0] * rel[..., 1]
             - edge[..., None, :, 1] * rel[..., 0])  # (..., P, 4)
    return (xp.all(cross >= -eps, axis=-1) | xp.all(cross <= eps, axis=-1))


def _segment_intersections(quad1, quad2, eps=1e-9, xp=jnp):
    """All 16 edge-edge crossing candidates of two quads.

    quad1/quad2: (..., 4, 2). Returns points (..., 16, 2), valid (..., 16).
    """
    p = quad1
    r = xp.roll(quad1, -1, axis=-2) - quad1  # (..., 4, 2) edge vectors
    q = quad2
    s = xp.roll(quad2, -1, axis=-2) - quad2
    # broadcast to (..., 4, 4)
    p_ = p[..., :, None, :]
    r_ = r[..., :, None, :]
    q_ = q[..., None, :, :]
    s_ = s[..., None, :, :]
    denom = r_[..., 0] * s_[..., 1] - r_[..., 1] * s_[..., 0]
    qp = q_ - p_
    t_num = qp[..., 0] * s_[..., 1] - qp[..., 1] * s_[..., 0]
    u_num = qp[..., 0] * r_[..., 1] - qp[..., 1] * r_[..., 0]
    denom_safe = xp.where(xp.abs(denom) < eps, 1.0, denom)
    t = t_num / denom_safe
    u = u_num / denom_safe
    valid = ((xp.abs(denom) >= eps)
             & (t >= -eps) & (t <= 1 + eps)
             & (u >= -eps) & (u <= 1 + eps))
    pts = p_ + t[..., None] * r_
    batch = pts.shape[:-3]
    return pts.reshape(batch + (16, 2)), valid.reshape(batch + (16,))


def _fill_invalid_ring(pts, valid, xp=jnp):
    """Replace invalid ring slots with the previous valid vertex (cyclic).

    Consecutive duplicates keep the polygon ring order and contribute zero
    to the shoelace sum, so downstream stages need no compaction — the key
    to a gather-free clipper. pts (..., S, 2), valid (..., S)."""
    if xp is jnp:
        import jax

        def op(a, b):
            av, af = a
            bv, bf = b
            return (xp.where(bf, bv, av), af | bf)

        vals, flags = jax.lax.associative_scan(
            op, (pts, xp.broadcast_to(valid[..., None], pts.shape)),
            axis=-2)
        flags = flags[..., 0]
    else:  # host numpy path: sequential fill (eval loop, small inputs)
        vals = pts.copy()
        flags = valid.copy()
        for i in range(1, pts.shape[-2]):
            take = ~flags[..., i]
            vals[..., i, :] = xp.where(take[..., None], vals[..., i - 1, :],
                                       vals[..., i, :])
            flags[..., i] |= flags[..., i - 1]
    # slots before the first valid wrap around to the overall last valid
    last = vals[..., -1:, :]
    return xp.where(flags[..., None], vals, last)


def _clip_halfplane(poly, a, b, sign2, xp=jnp, eps=1e-8):
    """One Sutherland-Hodgman stage: clip ring ``poly`` by the half-plane
    left of edge a->b (orientation fixed by sign2). Capacity doubles:
    (..., S, 2) -> (..., 2S, 2). The ring may contain consecutive duplicate
    vertices (from _fill_invalid_ring) — duplicates emit duplicate outputs
    and zero-length edges never produce crossings, both harmless.

    Returns (filled ring, any_valid (...,)) — a False any_valid means the
    intersection is empty from this stage on."""
    e = b - a
    d = (e[..., 0:1] * (poly[..., 1] - a[..., 1:2])
         - e[..., 1:2] * (poly[..., 0] - a[..., 0:1])) * sign2  # (..., S)
    inside = d >= -eps
    nxt = xp.roll(poly, -1, axis=-2)
    d_n = xp.roll(d, -1, axis=-1)
    inside_n = xp.roll(inside, -1, axis=-1)

    denom = d - d_n
    denom_safe = xp.where(xp.abs(denom) < eps, 1.0, denom)
    t = d / denom_safe
    crossing = poly + t[..., None] * (nxt - poly)
    cross_ok = (inside != inside_n) & (xp.abs(denom) >= eps)

    # interleave [vertex_i, crossing_i] -> (..., 2S, 2)
    s = poly.shape[-2]
    out = xp.stack([poly, crossing], axis=-2).reshape(
        poly.shape[:-2] + (2 * s, 2))
    ov = xp.stack([inside, cross_ok], axis=-1).reshape(
        poly.shape[:-2] + (2 * s,))
    return _fill_invalid_ring(out, ov, xp=xp), xp.any(ov, axis=-1)


def quad_intersection_area(quad1, quad2, xp=jnp):
    """Intersection area of two convex quads, batched over leading dims.

    quad1/quad2: (..., 4, 2). Returns (...,) areas. Branch-free
    Sutherland-Hodgman with fixed slot capacity: each clip stage emits
    [vertex, crossing] pairs and invalid slots duplicate their predecessor
    (``_fill_invalid_ring``), so there are NO sorts and NO gathers — the
    angle-sort candidate method this replaces spent >100 ms on a 512x512
    NMS matrix in take_along_axis gathers on TPU. ``xp`` selects jnp
    (device) or np (host eval path)."""
    quad1 = xp.asarray(quad1)
    quad2 = xp.asarray(quad2)
    # orientation of the clip quad (corners may wind either way)
    x2, y2 = quad2[..., 0], quad2[..., 1]
    signed2 = 0.5 * xp.sum(
        x2 * xp.roll(y2, -1, axis=-1) - xp.roll(x2, -1, axis=-1) * y2,
        axis=-1)
    sign2 = xp.where(signed2 >= 0, 1.0, -1.0)[..., None]

    poly = quad1
    alive = xp.ones(quad1.shape[:-2], dtype=bool)
    for k in range(4):
        a = quad2[..., k, :]            # (..., 2)
        b = quad2[..., (k + 1) % 4, :]
        poly, any_valid = _clip_halfplane(poly, a, b, sign2, xp=xp)
        alive = alive & any_valid

    x, y = poly[..., 0], poly[..., 1]
    area = 0.5 * xp.abs(xp.sum(
        x * xp.roll(y, -1, axis=-1) - xp.roll(x, -1, axis=-1) * y, axis=-1))
    return xp.where(alive, area, 0.0)


def quad_intersection_area_sorted(quad1, quad2, xp=jnp):
    """Candidate-vertex intersection with a GATHER-FREE angle sort.

    Same math as :func:`quad_intersection_area_candidates` but the sort is
    ``lax.sort`` with co-sorted operands (a vectorized sorting network —
    the take_along_axis gathers of the candidates method are what cost
    >100 ms on TPU) and the ring closure uses first-vertex fill instead of
    modular-index gathers.
    """
    quad1 = xp.asarray(quad1)
    quad2 = xp.asarray(quad2)
    in12 = _points_in_quad(quad1, quad2, xp=xp)
    in21 = _points_in_quad(quad2, quad1, xp=xp)
    xpts, xvalid = _segment_intersections(quad1, quad2, xp=xp)
    cand = xp.concatenate([quad1, quad2, xpts], axis=-2)   # (..., 24, 2)
    valid = xp.concatenate([in12, in21, xvalid], axis=-1)  # (..., 24)

    count = xp.sum(valid, axis=-1)
    vf = valid[..., None].astype(cand.dtype)
    centroid = (xp.sum(cand * vf, axis=-2)
                / xp.maximum(count, 1)[..., None])
    rel = cand - centroid[..., None, :]
    big = xp.asarray(1e30, cand.dtype)
    ang = xp.where(valid, xp.arctan2(rel[..., 1], rel[..., 0]), big)

    if xp is jnp:
        import jax

        ang_s, xs, ys = jax.lax.sort(
            (ang, cand[..., 0], cand[..., 1]), dimension=-1, num_keys=1)
    else:
        order = xp.argsort(ang, axis=-1)
        xs = xp.take_along_axis(cand[..., 0], order, axis=-1)
        ys = xp.take_along_axis(cand[..., 1], order, axis=-1)

    # invalid slots sorted last; fill them with the first (valid) vertex so
    # the ring closes itself and duplicates contribute zero
    idx = xp.arange(cand.shape[-2])
    inprefix = idx < count[..., None]
    xs = xp.where(inprefix, xs, xs[..., 0:1])
    ys = xp.where(inprefix, ys, ys[..., 0:1])
    x_n = xp.roll(xs, -1, axis=-1)
    y_n = xp.roll(ys, -1, axis=-1)
    area = 0.5 * xp.abs(xp.sum(xs * y_n - x_n * ys, axis=-1))
    return xp.where(count >= 3, area, 0.0)


def quad_intersection_area_candidates(quad1, quad2, xp=jnp):
    """Reference implementation (candidate-vertex + angle sort) kept for
    cross-checking the clipper in tests; gather-heavy, slow on TPU."""
    quad1 = xp.asarray(quad1)
    quad2 = xp.asarray(quad2)
    in12 = _points_in_quad(quad1, quad2, xp=xp)  # (..., 4)
    in21 = _points_in_quad(quad2, quad1, xp=xp)
    xpts, xvalid = _segment_intersections(quad1, quad2, xp=xp)
    cand = xp.concatenate([quad1, quad2, xpts], axis=-2)  # (..., 24, 2)
    valid = xp.concatenate([in12, in21, xvalid], axis=-1)  # (..., 24)

    count = xp.sum(valid, axis=-1)  # (...,)
    vf = valid[..., None].astype(cand.dtype)
    centroid = (xp.sum(cand * vf, axis=-2)
                / xp.maximum(count, 1)[..., None])  # (..., 2)
    rel = cand - centroid[..., None, :]
    ang = xp.arctan2(rel[..., 1], rel[..., 0])
    ang = xp.where(valid, ang, xp.inf)  # invalid sorted last
    order = xp.argsort(ang, axis=-1)
    sorted_pts = xp.take_along_axis(cand, order[..., None], axis=-2)

    idx = xp.arange(cand.shape[-2])
    m = xp.maximum(count, 1)[..., None]
    nxt = (idx + 1) % m  # circular over the valid prefix
    nxt_pts = xp.take_along_axis(sorted_pts, nxt[..., None], axis=-2)
    contrib = (sorted_pts[..., 0] * nxt_pts[..., 1]
               - nxt_pts[..., 0] * sorted_pts[..., 1])
    contrib = xp.where(idx < count[..., None], contrib, 0.0)
    area = 0.5 * xp.abs(xp.sum(contrib, axis=-1))
    return xp.where(count >= 3, area, 0.0)


def rotated_iou_corners(corners1, corners2, xp=jnp):
    """Rotated-BEV IoU matrix from corner boxes.

    corners1: (N, 4, 2), corners2: (M, 4, 2) -> (N, M).
    Matches shapely polygon IoU (ref common_utils.py:196 compute_iou).
    """
    c1 = xp.asarray(corners1)[:, None]  # (N, 1, 4, 2)
    c2 = xp.asarray(corners2)[None, :]  # (1, M, 4, 2)
    n, m = c1.shape[0], c2.shape[1]
    c1b = xp.broadcast_to(c1, (n, m, 4, 2))
    c2b = xp.broadcast_to(c2, (n, m, 4, 2))
    inter = quad_intersection_area_sorted(c1b, c2b, xp=xp)
    a1 = polygon_area(xp.asarray(corners1), xp=xp)[:, None]
    a2 = polygon_area(xp.asarray(corners2), xp=xp)[None, :]
    union = a1 + a2 - inter
    return xp.where(union > 1e-9, inter / union, 0.0)


def rotated_iou_aligned(corners1, corners2):
    """Element-wise rotated-BEV IoU of aligned (N, 4, 2) corner boxes."""
    inter = quad_intersection_area_sorted(corners1, corners2)
    a1 = polygon_area(corners1)
    a2 = polygon_area(corners2)
    union = a1 + a2 - inter
    return jnp.where(union > 1e-9, inter / union, 0.0)


def aligned_boxes_iou3d(boxes1, boxes2, order: str = "hwl"):
    """Element-wise 3D IoU of aligned center-form boxes (N, 7).

    Replaces pcdet_utils/iou3d_nms aligned_boxes_iou3d_gpu (used by the
    IoU-head loss, ref point_pillar_loss.py:97-114).
    """
    from coalign_tpu.utils.box_utils import boxes_to_corners2d

    boxes1 = jnp.asarray(boxes1)
    boxes2 = jnp.asarray(boxes2)
    if order == "hwl":
        h1, h2 = boxes1[:, 3], boxes2[:, 3]
    else:
        h1, h2 = boxes1[:, 5], boxes2[:, 5]
    c1 = boxes_to_corners2d(boxes1, order)
    c2 = boxes_to_corners2d(boxes2, order)
    bev_inter = quad_intersection_area_sorted(c1, c2)
    z1_lo, z1_hi = boxes1[:, 2] - h1 / 2, boxes1[:, 2] + h1 / 2
    z2_lo, z2_hi = boxes2[:, 2] - h2 / 2, boxes2[:, 2] + h2 / 2
    z_overlap = jnp.maximum(
        jnp.minimum(z1_hi, z2_hi) - jnp.maximum(z1_lo, z2_lo), 0.0)
    inter3d = bev_inter * z_overlap
    vol1 = polygon_area(c1) * h1
    vol2 = polygon_area(c2) * h2
    union = vol1 + vol2 - inter3d
    return jnp.where(union > 1e-9, inter3d / union, 0.0)

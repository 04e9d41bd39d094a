"""Cross-agent box matching + weighted fusion (late stage of FPV-RCNN).

TPU-first rework of ref opencood/models/sub_modules/matcher.py:16 and
matcher_v2.py:20. Both reference versions share the SAME box-level
semantics (their difference is stage-2 feature collection — keypoints vs
sparse voxels — which lives in models/fpvrcnn.py's VSA redesign):

  * clustering (matcher.py:74-81 / matcher_v2.py:86-93): greedy over the
    3D-IoU matrix by FIRST-unassigned INDEX (order-dependent, NOT score
    ranked) with overwrite — a later representative re-captures earlier
    members whose IoU exceeds the threshold;
  * cluster_fusion (matcher.py:91-148 / matcher_v2.py:105-160): flip the
    yaw of the score-minority direction set by pi, score-weighted mean of
    center/dims + sin/cos yaw, fused score = min(sum_i s_(i)^(i+1), 1)
    over descending member scores, then an all-BEV-corner xy range mask
    (box_utils.py:348 get_mask_for_boxes_within_range_torch).

Here everything runs on ONE padded (L*K, 7) ego-frame tensor with fixed
shapes: the sequential greedy pass is a lax.scan, fusion is a masked
matrix product per representative. ``version='nms'`` keeps the round-2
formulation (NMS representatives + max member score) for ablation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils.common import limit_period
from coalign_tpu.utils.iou import (polygon_area,
                                   quad_intersection_area_sorted,
                                   rotated_iou_corners)
from coalign_tpu.utils.nms import nms_rotated


def boxes_iou3d_matrix(boxes, order: str = "pcdet"):
    """Pairwise 3D IoU of center-form boxes (K, 7) -> (K, K).

    Default 'pcdet' replicates ref boxes_iou3d_gpu (iou3d_nms_utils.py:147)
    AS THE MATCHER CALLS IT: the kernel reads cols 3,4 as the rotated BEV
    extents and col 5 as the z extent regardless of the caller's box
    order — and matcher.py:74 feeds hwl boxes straight in, so the
    reference clusters on (h, w) footprints with l as height (a latent
    reference quirk, kept for golden parity; 'hwl' gives the
    geometrically-correct variant)."""
    boxes = jnp.asarray(boxes)
    if order == "pcdet":
        h = boxes[:, 5]
        c = B.boxes_to_corners_3d(boxes, "lwh")[:, :4, :2]
        z_lo, z_hi = boxes[:, 2] - h / 2, boxes[:, 2] + h / 2
        k = boxes.shape[0]
        c1 = jnp.broadcast_to(c[:, None], (k, k, 4, 2))
        c2 = jnp.broadcast_to(c[None, :], (k, k, 4, 2))
        bev_inter = quad_intersection_area_sorted(c1, c2)
        z_overlap = jnp.maximum(
            jnp.minimum(z_hi[:, None], z_hi[None, :])
            - jnp.maximum(z_lo[:, None], z_lo[None, :]), 0.0)
        inter = bev_inter * z_overlap
        vol = boxes[:, 3] * boxes[:, 4] * boxes[:, 5]
        union = jnp.maximum(vol[:, None] + vol[None, :] - inter, 1e-6)
        return inter / union
    h = boxes[:, 3] if order == "hwl" else boxes[:, 5]
    c = B.boxes_to_corners_3d(boxes, order)[:, :4, :2]
    k = boxes.shape[0]
    c1 = jnp.broadcast_to(c[:, None], (k, k, 4, 2))
    c2 = jnp.broadcast_to(c[None, :], (k, k, 4, 2))
    bev_inter = quad_intersection_area_sorted(c1, c2)
    z_lo, z_hi = boxes[:, 2] - h / 2, boxes[:, 2] + h / 2
    z_overlap = jnp.maximum(
        jnp.minimum(z_hi[:, None], z_hi[None, :])
        - jnp.maximum(z_lo[:, None], z_lo[None, :]), 0.0)
    inter = bev_inter * z_overlap
    vol = polygon_area(c) * h
    union = vol[:, None] + vol[None, :] - inter
    return jnp.where(union > 1e-9, inter / union, 0.0)


def _greedy_clusters(iou, valid, thr):
    """Reference clustering: scan indices in order; an unassigned index
    becomes a representative and (re-)captures every box with IoU > thr.
    Returns (cluster_of (K,) int32 rep index, is_rep (K,) bool)."""
    k = iou.shape[0]

    def body(carry, i):
        assigned, cluster_of = carry
        is_rep = valid[i] & ~assigned[i]
        take = is_rep & (iou[i] > thr) & valid
        cluster_of = jnp.where(take, i, cluster_of)
        assigned = assigned | take
        return (assigned, cluster_of), is_rep

    (_, cluster_of), is_rep = jax.lax.scan(
        body, (~valid, jnp.zeros(k, jnp.int32)), jnp.arange(k))
    return cluster_of, is_rep


def _fuse_clusters(boxes, scores, cluster_of, is_rep, gt_range):
    """Reference cluster_fusion, vectorized over all K candidate reps."""
    k = boxes.shape[0]
    member = ((cluster_of[None, :] == jnp.arange(k)[:, None])
              & is_rep[:, None])                       # (R, K)
    s = jnp.where(member, scores[None, :], 0.0)

    # dominant-direction flip: reference measures angular distance to the
    # highest-scored member's yaw, wraps to [0, pi], then flips whichever
    # side (>pi/2 vs <=pi/2) carries LESS total score
    dirs = limit_period(boxes[:, 6])[None, :]        # (1, K) -> broad
    ref_idx = jnp.argmax(s, axis=1)                    # (R,)
    ref_dir = dirs[0][ref_idx][:, None]
    diff = jnp.abs(dirs - ref_dir)
    diff = jnp.where(diff > np.pi, 2 * np.pi - diff, diff)
    far = diff > np.pi / 2
    score_far = jnp.sum(jnp.where(far, s, 0.0), axis=1, keepdims=True)
    score_near = jnp.sum(jnp.where(~far, s, 0.0), axis=1, keepdims=True)
    flip_far = score_far <= score_near
    flipped = jnp.where(far == flip_far, dirs + np.pi, dirs)

    ssum = jnp.maximum(s.sum(1, keepdims=True), 1e-9)
    w = s / ssum
    center_dim = w @ boxes[:, :6]
    theta = jnp.arctan2(jnp.sum(w * jnp.sin(flipped), axis=1),
                        jnp.sum(w * jnp.cos(flipped), axis=1))
    fused = jnp.concatenate([center_dim, theta[:, None]], axis=-1)

    # fused score: sort member scores descending, sum s_i^(i+1), cap 1
    # (padded zeros contribute 0)
    s_sorted = jnp.sort(s, axis=1)[:, ::-1]
    powers = jnp.arange(1, k + 1, dtype=s.dtype)[None, :]
    s_fused = jnp.minimum(jnp.sum(s_sorted ** powers, axis=1), 1.0)

    mask = is_rep
    if gt_range is not None:
        corners = B.boxes_to_corners_3d(fused, "hwl")
        lo = jnp.asarray(gt_range[0:2], fused.dtype)
        hi = jnp.asarray(gt_range[3:5], fused.dtype)
        inside = jnp.all((corners[:, :, :2] >= lo)
                         & (corners[:, :, :2] <= hi), axis=(1, 2))
        mask = mask & inside
    return fused, s_fused, mask


def match_and_fuse(boxes, scores, valid, iou_threshold: float = 0.1,
                   max_keep: int = 64, version: str = "ref",
                   gt_range=None):
    """Cluster + fuse ego-frame boxes from all agents.

    boxes: (K, 7) hwl, scores: (K,), valid: (K,) bool (padded).
    version 'ref' (default): the reference matcher semantics above.
    version 'nms': round-2 formulation — NMS-ranked representatives,
    IoU-weighted soft assignment, max member score.
    Returns dict(boxes (max_keep, 7), scores (max_keep,), mask (max_keep,)).
    """
    if version == "nms":
        return _match_and_fuse_nms(boxes, scores, valid, iou_threshold,
                                   max_keep)
    iou = boxes_iou3d_matrix(boxes)
    cluster_of, is_rep = _greedy_clusters(iou, valid, iou_threshold)
    fused, s_fused, mask = _fuse_clusters(boxes, scores, cluster_of,
                                          is_rep, gt_range)
    # compact representatives (reference keeps python lists; we keep
    # index order, truncated to max_keep fixed slots)
    rank = jnp.cumsum(mask) - 1
    slot = jnp.where(mask & (rank < max_keep), rank, max_keep)
    out_boxes = jnp.zeros((max_keep + 1, 7), fused.dtype).at[slot].set(
        jnp.where(mask[:, None], fused, 0.0))[:max_keep]
    out_scores = jnp.zeros((max_keep + 1,), s_fused.dtype).at[slot].set(
        jnp.where(mask, s_fused, 0.0))[:max_keep]
    out_mask = jnp.zeros((max_keep + 1,), bool).at[slot].set(
        mask)[:max_keep]
    return {"boxes": out_boxes, "scores": out_scores, "mask": out_mask}


def _match_and_fuse_nms(boxes, scores, valid, iou_threshold, max_keep):
    corners = B.boxes_to_corners_3d(boxes, "hwl")
    order, keep_mask = nms_rotated(corners[:, :4, :2], scores, valid,
                                   iou_threshold, max_keep=max_keep)
    reps = boxes[order][:max_keep]              # cluster representatives
    rep_mask = keep_mask[:max_keep]

    rep_corners = B.boxes_to_corners_3d(reps, "hwl")
    iou = rotated_iou_corners(rep_corners[:, :4, :2], corners[:, :4, :2])
    member = (iou > iou_threshold) & valid[None, :] & rep_mask[:, None]
    w = jnp.where(member, scores[None, :], 0.0)        # (R, K)
    wsum = jnp.maximum(w.sum(-1, keepdims=True), 1e-6)

    # weighted average of positions/sizes; yaw averaged in (sin, cos) space
    fused = (w @ boxes[:, :6]) / wsum
    sin = (w @ jnp.sin(boxes[:, 6])) / wsum[:, 0]
    cos = (w @ jnp.cos(boxes[:, 6])) / wsum[:, 0]
    yaw = jnp.arctan2(sin, cos)[:, None]
    fused = jnp.concatenate([fused, yaw], axis=-1)
    fused = jnp.where(rep_mask[:, None], fused, 0.0)

    fscores = jnp.where(rep_mask, (w.max(-1)), 0.0)
    return {"boxes": fused, "scores": fscores, "mask": rep_mask}

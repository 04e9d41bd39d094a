"""Cross-agent box matching + weighted fusion (late stage of FPV-RCNN).

TPU-first rework of ref opencood/models/sub_modules/matcher.py:16 /
matcher_v2.py: the reference clusters variable-length per-agent box lists
with python loops (IoU > 0.1 clusters, :76-90) and fuses each cluster by
score-weighted averaging (cluster_fusion :91-148). Here all agents' boxes
live in ONE padded (L*K, 7) ego-frame tensor; cluster representatives are
chosen by rotated NMS and every box soft-assigns to its representative via
the same IoU matrix — fixed shapes end to end.
"""

from __future__ import annotations

import jax.numpy as jnp

from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils.iou import rotated_iou_corners
from coalign_tpu.utils.nms import nms_rotated


def match_and_fuse(boxes, scores, valid, iou_threshold: float = 0.1,
                   max_keep: int = 64):
    """Cluster + fuse ego-frame boxes from all agents.

    boxes: (K, 7) hwl, scores: (K,), valid: (K,) bool (padded).
    Returns dict(boxes (max_keep, 7), scores (max_keep,), mask (max_keep,)).
    """
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

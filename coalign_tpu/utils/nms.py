"""On-device rotated NMS with fixed-size outputs.

Replaces the reference's host-side shapely greedy NMS
(opencood/utils/box_utils.py:693 nms_rotated) with an exact greedy NMS that
runs inside jit: precompute the (K, K) rotated IoU matrix once (dense, MXU/
VPU friendly), then resolve the sequential keep dependency with a scan over
score-sorted rows. Outputs are fixed-size masked tensors — no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coalign_tpu.utils.iou import rotated_iou_corners


def nms_rotated(corners, scores, valid_mask, iou_threshold: float,
                max_keep: int | None = None):
    """Exact greedy rotated NMS over masked corner boxes.

    corners:    (K, 4, 2) BEV corner boxes (score-unordered, padded).
    scores:     (K,) confidence scores.
    valid_mask: (K,) bool — padded/pre-filtered entries.
    iou_threshold: suppression threshold (matches ref nms_rotated semantics:
        suppress j if iou(i, j) > threshold for an earlier-kept i).
    max_keep:   optional cap on number of survivors (defaults to K).

    Returns (keep_indices (K,) int32 score-sorted, keep_mask (K,) bool) where
    ``keep_mask[r]`` says whether the r-th score-ranked box survived; use
    ``keep_indices`` to gather boxes/scores in ranked order.
    """
    k = corners.shape[0]
    scores = jnp.where(valid_mask, scores, -jnp.inf)
    order = jnp.argsort(-scores)  # high to low
    sorted_corners = corners[order]
    sorted_valid = valid_mask[order]

    iou = rotated_iou_corners(sorted_corners, sorted_corners)  # (K, K)
    suppress = iou > iou_threshold

    def body(keep_so_far, row):
        row_suppress, is_valid, idx = row
        # suppressed if any higher-ranked kept box overlaps it
        killed = jnp.any(keep_so_far & row_suppress & (jnp.arange(k) < idx))
        keep = is_valid & ~killed
        keep_so_far = keep_so_far.at[idx].set(keep)
        return keep_so_far, keep

    init = jnp.zeros((k,), dtype=bool)
    _, keep_mask = jax.lax.scan(
        body, init, (suppress, sorted_valid, jnp.arange(k)))

    if max_keep is not None and max_keep < k:
        rank = jnp.cumsum(keep_mask) - 1
        keep_mask = keep_mask & (rank < max_keep)
    return order, keep_mask


def select_topk_boxes(scores, valid_mask, k: int):
    """Pre-filter to the top-k scoring valid entries (indices + mask)."""
    masked = jnp.where(valid_mask, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    return top_idx, top_scores > -jnp.inf

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
    order = jnp.argsort(-scores)          # high to low
    rank = jnp.argsort(order)             # rank[i] = position of i

    # IoU in ORIGINAL index space — reordering the (K, 4, 2) corners just
    # to build the matrix costs a row gather (~0.7 ms at K=512 on a v5e);
    # the rank comparison below encodes the score order instead.
    iou = rotated_iou_corners(corners, corners)  # (K, K)
    # sup[j, i] == True when the higher-ranked j would kill i
    suppress = (iou > iou_threshold) & (rank[:, None] < rank[None, :])

    # Exact greedy NMS via the overlap-matrix fixpoint (the algorithm a
    # K-step sequential lax.scan would compute, but in O(chain depth)
    # parallel rounds — a 512-step scan costs milliseconds of dispatch on
    # TPU, while each round here is one (K, K) masked matvec):
    #   keep[i] = valid[i] and no kept higher-ranked j suppresses i.
    # Iterating from keep = valid converges to the unique greedy fixpoint
    # in at most the suppression-chain depth (typically < 8) rounds.
    supf = suppress.astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def step(state):
        keep, _, it = state
        killed = (supf.T @ keep.astype(jnp.float32)) > 0.0
        return valid_mask & ~killed, keep, it + 1

    keep0 = valid_mask
    keep_unsorted, _, _ = jax.lax.while_loop(
        cond, step, (keep0, jnp.zeros_like(keep0), jnp.int32(0)))
    keep_mask = keep_unsorted[order]      # tiny bool gather

    if max_keep is not None and max_keep < k:
        rnk = jnp.cumsum(keep_mask) - 1
        keep_mask = keep_mask & (rnk < max_keep)
    return order, keep_mask


def select_topk_boxes(scores, valid_mask, k: int):
    """Pre-filter to the top-k scoring valid entries (indices + mask)."""
    masked = jnp.where(valid_mask, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    return top_idx, top_scores > -jnp.inf

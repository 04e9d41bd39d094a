"""Anchor decode + full detection post-processing as one jitted program.

TPU-first rework of ref voxel_postprocessor.py:243-450 (post_process /
delta_to_boxes3d): sigmoid -> threshold -> dir-bin fix -> (optional IoU
rescoring) -> project to ego -> sanity filters -> rotated NMS -> range mask,
all with fixed shapes (top-K prefilter + masked outputs) and zero host
round-trips — the reference does shapely NMS on CPU mid-pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils.common import limit_period
from coalign_tpu.utils.nms import nms_rotated


def delta_to_boxes3d(deltas, anchors):
    """Decode regression deltas against the anchor grid.

    deltas:  (..., H, W, A*7) NHWC regression map.
    anchors: (H, W, A, 7) static anchor grid (order 'hwl').
    Returns (..., H*W*A, 7) center-form boxes.
    Ref: voxel_postprocessor.py:404 delta_to_boxes3d.
    """
    anchors = jnp.asarray(anchors)
    flat_anchors = anchors.reshape(-1, 7)
    diag = jnp.sqrt(flat_anchors[:, 4] ** 2 + flat_anchors[:, 5] ** 2)
    batch_shape = deltas.shape[:-3]
    d = deltas.reshape(batch_shape + (-1, 7))
    xy = d[..., 0:2] * diag[:, None] + flat_anchors[:, 0:2]
    z = d[..., 2:3] * flat_anchors[:, 3:4] + flat_anchors[:, 2:3]
    hwl = jnp.exp(d[..., 3:6]) * flat_anchors[:, 3:6]
    yaw = d[..., 6:7] + flat_anchors[:, 6:7]
    return jnp.concatenate([xy, z, hwl, yaw], axis=-1)


def delta_to_boxes3d_rows(d, anchor_rows):
    """Row-aligned decode: d (..., 7) deltas against (..., 7) anchors.

    Same math as :func:`delta_to_boxes3d` but for an already-selected set
    of rows — the full-grid decode wastes work on 140k anchors when only
    the top-k prefilter survives (ref voxel_postprocessor.py:404)."""
    diag = jnp.sqrt(anchor_rows[..., 4] ** 2 + anchor_rows[..., 5] ** 2)
    xy = d[..., 0:2] * diag[..., None] + anchor_rows[..., 0:2]
    z = d[..., 2:3] * anchor_rows[..., 3:4] + anchor_rows[..., 2:3]
    hwl = jnp.exp(d[..., 3:6]) * anchor_rows[..., 3:6]
    yaw = d[..., 6:7] + anchor_rows[..., 6:7]
    return jnp.concatenate([xy, z, hwl, yaw], axis=-1)


def correct_direction(boxes7, dir_logits, dir_offset: float, num_bins: int):
    """Resolve heading ambiguity with the direction classifier.

    boxes7: (..., K, 7); dir_logits: (..., K, num_bins).
    Ref: voxel_postprocessor.py:317-333.
    """
    dir_labels = jnp.argmax(dir_logits, axis=-1).astype(boxes7.dtype)
    period = 2 * np.pi / num_bins
    dir_rot = limit_period(boxes7[..., 6] - dir_offset, 0.0, period)
    yaw = dir_rot + dir_offset + period * dir_labels
    yaw = limit_period(yaw, 0.5, 2 * np.pi)
    return jnp.concatenate([boxes7[..., :6], yaw[..., None]], axis=-1)


# NOT jitted: this always runs inside the caller's jit (make_infer_fn,
# evaluate). A nested jit here changed the lowering enough that the fused
# B>1 forward+postprocess program repeatably faulted the v5e worker on the
# axon stack — the same ops inlined into the outer jit compile clean.
def post_process_frame(cls_preds, reg_preds, anchors, transformation_matrix,
                       dir_preds=None, iou_preds=None, unc_preds=None, *,
                       score_threshold: float, nms_threshold: float,
                       gt_range: tuple, prefilter_k: int = 512,
                       max_keep: int = 100, dir_offset: float = 0.7853,
                       num_bins: int = 2):
    """Single-frame detection head -> final boxes, fully on device.

    cls_preds: (H, W, A) logits; reg_preds: (H, W, A*7);
    dir_preds: (H, W, A*num_bins) or None; iou_preds: (H, W, A) or None.
    transformation_matrix: (4, 4) to ego frame (identity for intermediate
    fusion, per-agent transform for late fusion).

    Returns dict(corners3d (max_keep, 8, 3), boxes7 (max_keep, 7),
    scores (max_keep,), mask (max_keep,) bool) — fixed shapes, ranked by
    score. Semantics follow ref voxel_postprocessor.py:243-402.
    """
    h, w, a = cls_preds.shape
    k = h * w * a
    scores = jax.nn.sigmoid(cls_preds.reshape(k))

    if iou_preds is not None:
        # IoU-head rescoring: score *= ((iou+1)/2)^4 (ref :335-339)
        iou = jnp.clip(jax.nn.sigmoid(iou_preds.reshape(k)), 0.0, 1.0)
        scores = scores * ((iou + 1) * 0.5) ** 4

    valid = scores > score_threshold

    # top-k prefilter FIRST, then decode only the survivors: decoding the
    # full grid spends exp/sin work on 140k anchors, and the subsequent
    # row gathers of narrow (7-lane) arrays are slow on TPU — instead ONE
    # packed gather pulls reg+dir+unc+anchor rows for the selected k
    prefilter_k = min(prefilter_k, k)
    sel_scores, sel_idx = jax.lax.top_k(jnp.where(valid, scores, -1.0),
                                        prefilter_k)
    sel_valid = sel_scores > 0

    parts = [reg_preds.reshape(k, 7)]
    if dir_preds is not None:
        parts.append(dir_preds.reshape(k, num_bins))
    unc_dim = 0
    if unc_preds is not None:
        unc_dim = unc_preds.shape[-1] // a
        parts.append(unc_preds.reshape(k, unc_dim))
    parts.append(jnp.asarray(anchors).reshape(k, 7))
    packed = jnp.concatenate(parts, axis=-1)
    sel = packed[sel_idx]  # (P, 7 [+bins] [+unc] + 7)

    sel_reg = sel[:, :7]
    off = 7
    sel_anchor = sel[:, -7:]
    sel_boxes = delta_to_boxes3d_rows(sel_reg, sel_anchor)
    if dir_preds is not None:
        sel_dir = sel[:, off:off + num_bins]
        off += num_bins
        sel_boxes = correct_direction(sel_boxes, sel_dir, dir_offset,
                                      num_bins)
    sel_unc = sel[:, off:off + unc_dim] if unc_preds is not None else None

    corners = B.boxes_to_corners_3d(sel_boxes, "hwl")  # (P, 8, 3)
    corners = B.project_box3d(corners, transformation_matrix)

    # size/z sanity filters run BEFORE NMS, the range mask AFTER it — the
    # reference order (voxel_postprocessor.py:375-397): an out-of-range box
    # still participates in suppression, it is only dropped from the output
    sane = B.remove_large_pred_bbx(corners) & B.remove_bbx_abnormal_z(corners)
    sel_valid = sel_valid & sane

    order, keep_mask = nms_rotated(corners[:, :4, :2], sel_scores, sel_valid,
                                   nms_threshold)
    # ONE ranked gather for all per-box outputs (several narrow row
    # gathers cost ~0.5 ms each on TPU)
    p = corners.shape[0]
    ranked_parts = [corners.reshape(p, 24), sel_boxes,
                    sel_scores[:, None]]
    if sel_unc is not None:
        ranked_parts.append(sel_unc)
    # gather only the top max_keep rows: cheaper than ranking all P rows,
    # and the P-row gather fused after the B>1 forward repeatably faulted
    # the v5e worker (axon stack) — the narrow gather compiles clean
    ranked = jnp.concatenate(ranked_parts, axis=-1)[order[:max_keep]]
    keep = keep_mask[:max_keep]
    # post-NMS range mask, strict all-8-corners-in-xyz convention
    # (ref voxel_postprocessor.py:393 mask_boxes_outside_range_numpy)
    keep = keep & B.mask_corners_all_inside_range(
        ranked[:, :24].reshape(-1, 8, 3), gt_range)
    out = {
        "corners3d": ranked[:, :24].reshape(-1, 8, 3) * keep[:, None, None],
        "boxes7": ranked[:, 24:31] * keep[:, None],
        "scores": jnp.where(keep, ranked[:, 31], 0.0),
        "mask": keep,
    }
    if sel_unc is not None:
        # per-box log sigma^2 carried through selection + NMS ranking
        # (ref uncertainty_voxel_postprocessor.py post_process_stage1:31)
        out["uncertainty"] = ranked[:, 32:32 + unc_dim] * keep[:, None]
    return out


def post_process_refined_frame(boxes7, cls_logits, roi_mask,
                               transformation_matrix, *,
                               score_threshold: float,
                               nms_threshold: float, gt_range,
                               order: str = "hwl"):
    """Decode ONE frame of two-stage (RoI-refined) outputs.

    The FPV-RCNN / FVoxelRCNN families emit already-decoded stage-2 boxes
    (``boxes_refined`` + RoI confidence) instead of anchor maps — the
    reference evals them through FpvrcnnPostprocessor (ref
    fpvrcnn_postprocessor.py:21-246: sigmoid conf -> project -> NMS ->
    range mask). Same masked fixed-shape contract as post_process_frame.
    """
    r = boxes7.shape[0]
    scores = jax.nn.sigmoid(cls_logits.reshape(r))
    boxes7 = B.project_boxes7_by_tfm(boxes7, transformation_matrix, order)
    corners = B.boxes_to_corners_3d(boxes7, order)
    valid = (jnp.asarray(roi_mask).reshape(r)
             & (scores > score_threshold)
             & B.mask_corners_outside_range(corners, gt_range))
    nms_order, keep = nms_rotated(corners[:, :4, :2], scores, valid,
                                  nms_threshold)
    ranked = jnp.concatenate([corners.reshape(r, 24), boxes7,
                              scores[:, None]], axis=-1)[nms_order]
    return {
        "corners3d": ranked[:, :24].reshape(-1, 8, 3) * keep[:, None, None],
        "boxes7": ranked[:, 24:31] * keep[:, None],
        "scores": jnp.where(keep, ranked[:, 31], 0.0),
        "mask": keep,
    }

"""Anchor grid generation and anchor-target assignment.

TPU-first rework of opencood/data_utils/post_processor/voxel_postprocessor.py
(generate_anchor_box :30, generate_label :83): the per-item numpy/Cython loop
becomes one vectorized masked assignment usable inside jit — so labels can be
generated on device from padded gt tensors (no dataloader-worker CPU pass).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from coalign_tpu.utils.box_utils import boxes_to_corners_3d, corners_to_standup_2d
from coalign_tpu.utils.iou import standup_iou


class AnchorSpec(NamedTuple):
    anchors: np.ndarray          # (H, W, A, 7) order-matched boxes
    standup: np.ndarray          # (H*W*A, 4) precomputed standup boxes
    diag: np.ndarray             # (H*W*A,) anchor BEV diagonal
    order: str
    pos_threshold: float
    neg_threshold: float
    num_anchors: int


def generate_anchor_box(anchor_args: dict, order: str = "hwl") -> np.ndarray:
    """(H, W, A, 7) anchor grid; semantics of ref voxel_postprocessor.py:30.

    anchor_args needs: W, H (full-res grid), l, w, h, r (deg list),
    cav_lidar_range, vw, vh, feature_stride (default 2).
    """
    W = anchor_args["W"]
    H = anchor_args["H"]
    l, w, h = anchor_args["l"], anchor_args["w"], anchor_args["h"]
    r = [math.radians(x) for x in anchor_args["r"]]
    num = len(r)
    vw, vh = anchor_args["vw"], anchor_args["vh"]
    xrange = [anchor_args["cav_lidar_range"][0], anchor_args["cav_lidar_range"][3]]
    yrange = [anchor_args["cav_lidar_range"][1], anchor_args["cav_lidar_range"][4]]
    stride = anchor_args.get("feature_stride", 2)

    x = np.linspace(xrange[0] + vw, xrange[1] - vw, W // stride)
    y = np.linspace(yrange[0] + vh, yrange[1] - vh, H // stride)
    cx, cy = np.meshgrid(x, y)  # (H/s, W/s)
    cx = np.tile(cx[..., None], num)
    cy = np.tile(cy[..., None], num)
    cz = np.full_like(cx, -1.0)
    ws = np.full_like(cx, w)
    ls = np.full_like(cx, l)
    hs = np.full_like(cx, h)
    rs = np.stack([np.full_like(cx[..., 0], ri) for ri in r], axis=-1)

    if order == "hwl":
        anchors = np.stack([cx, cy, cz, hs, ws, ls, rs], axis=-1)
    elif order == "lhw":
        anchors = np.stack([cx, cy, cz, ls, hs, ws, rs], axis=-1)
    else:
        raise ValueError(f"unknown order {order}")
    return anchors.astype(np.float32)


def make_anchor_spec(anchor_args: dict, target_args: dict,
                     order: str = "hwl") -> AnchorSpec:
    """Precompute all static anchor tensors once (host-side)."""
    anchors = generate_anchor_box(anchor_args, order)
    flat = anchors.reshape(-1, 7)
    corners = np.asarray(boxes_to_corners_3d(flat, order))
    standup = np.asarray(corners_to_standup_2d(corners[:, :4, :]))
    diag = np.sqrt(flat[:, 4] ** 2 + flat[:, 5] ** 2)
    return AnchorSpec(
        anchors=anchors,
        standup=standup.astype(np.float32),
        diag=diag.astype(np.float32),
        order=order,
        pos_threshold=float(target_args["pos_threshold"]),
        neg_threshold=float(target_args["neg_threshold"]),
        num_anchors=anchors.shape[2],
    )


def assign_targets(gt_boxes, gt_mask, spec: AnchorSpec):
    """Vectorized anchor-target assignment for ONE sample (vmap for batch).

    gt_boxes: (M, 7) padded center-form gt (spec.order), gt_mask: (M,) bool.
    Returns dict with
      pos_equal_one (H, W, A), neg_equal_one (H, W, A), targets (H, W, A*7)
    — the exact label contract of ref voxel_postprocessor.py:201-205.

    Semantics follow the reference: IoU is 2D standup IoU with the Faster-
    RCNN +1 size convention (Cython bbox_overlaps); positives are anchors
    with IoU > pos_threshold plus each gt's best-overlap anchor (force
    match); negatives have every IoU < neg_threshold, and force-matched
    anchors are never negative. One deviation: an anchor above threshold for
    several gts is assigned its *best*-IoU gt (the reference keeps the
    lowest gt index — an artifact of np.unique).
    """
    H, W, A = spec.anchors.shape[:3]
    k = H * W * A
    gt_boxes = jnp.asarray(gt_boxes)
    gt_mask = jnp.asarray(gt_mask)
    m = gt_boxes.shape[0]

    gt_corners = boxes_to_corners_3d(gt_boxes, spec.order)
    gt_standup = corners_to_standup_2d(gt_corners[:, :4, :])
    iou = standup_iou(jnp.asarray(spec.standup), gt_standup, offset=1.0)
    iou = jnp.where(gt_mask[None, :], iou, 0.0)  # (K, M)

    # force-match: best anchor per valid gt with positive overlap
    best_anchor = jnp.argmax(iou, axis=0)  # (M,)
    best_iou = jnp.take_along_axis(iou, best_anchor[None, :], axis=0)[0]
    force = gt_mask & (best_iou > 0)
    forced_onehot = jnp.zeros((k,), bool).at[best_anchor].max(force)

    # per-anchor best gt
    anchor_best_gt = jnp.argmax(iou, axis=1)  # (K,)
    anchor_best_iou = jnp.max(iou, axis=1)

    pos_by_thresh = anchor_best_iou > spec.pos_threshold
    # a forced anchor is assigned the gt that forced it (override best-gt
    # only when it isn't already positive by threshold)
    forced_gt = jnp.zeros((k,), jnp.int32).at[best_anchor].max(
        jnp.where(force, jnp.arange(m, dtype=jnp.int32), 0))
    assigned_gt = jnp.where(pos_by_thresh, anchor_best_gt,
                            jnp.where(forced_onehot, forced_gt, anchor_best_gt))
    pos = pos_by_thresh | forced_onehot
    neg = (anchor_best_iou < spec.neg_threshold) & ~forced_onehot

    # encode regression targets for the assigned gt
    anchors_flat = jnp.asarray(spec.anchors.reshape(-1, 7))
    diag = jnp.asarray(spec.diag)
    g = gt_boxes[assigned_gt]  # (K, 7)
    eps = 1e-6
    t = jnp.stack(
        [
            (g[:, 0] - anchors_flat[:, 0]) / diag,
            (g[:, 1] - anchors_flat[:, 1]) / diag,
            (g[:, 2] - anchors_flat[:, 2]) / anchors_flat[:, 3],
            jnp.log(jnp.maximum(g[:, 3], eps) / anchors_flat[:, 3]),
            jnp.log(jnp.maximum(g[:, 4], eps) / anchors_flat[:, 4]),
            jnp.log(jnp.maximum(g[:, 5], eps) / anchors_flat[:, 5]),
            g[:, 6] - anchors_flat[:, 6],
        ],
        axis=-1,
    )
    t = jnp.where(pos[:, None], t, 0.0)

    return {
        "pos_equal_one": pos.reshape(H, W, A).astype(jnp.float32),
        "neg_equal_one": neg.reshape(H, W, A).astype(jnp.float32),
        "targets": t.reshape(H, W, A * 7).astype(jnp.float32),
    }


def assign_targets_per_agent(gt_boxes, gt_mask, lidar_pose_clean,
                             agent_mask, spec: AnchorSpec):
    """Per-agent "single" labels for ONE sample (vmap for batch).

    The reference's ``supervise_single`` path builds a per-agent
    ``label_dict_single`` with each agent's labels in its OWN frame (ref
    intermediate_fusion_dataset.py:363-377 + train.py:119-121 second loss
    pass). Here the fused ego-frame gt is projected into every agent's
    frame with the CLEAN poses and assigned against the same anchor grid;
    padded agents get all-negative labels.

    gt_boxes: (M, 7) ego-frame, gt_mask: (M,), lidar_pose_clean: (L, 6),
    agent_mask: (L,). Returns labels dict with a leading L axis.
    """
    import jax

    from coalign_tpu.utils.box_utils import project_boxes7_by_tfm
    from coalign_tpu.utils.transforms import x1_to_x2_tfm

    pose_ego = lidar_pose_clean[0]

    def per_agent(pose_a, valid):
        tfm = x1_to_x2_tfm(pose_ego, pose_a)  # T_agent<-ego
        g = project_boxes7_by_tfm(jnp.asarray(gt_boxes), tfm, spec.order)
        labels = assign_targets(g, jnp.asarray(gt_mask) & valid, spec)
        # a padded agent supervises nothing: no positives, all negatives
        labels["pos_equal_one"] = jnp.where(valid, labels["pos_equal_one"],
                                            0.0)
        labels["neg_equal_one"] = jnp.where(valid, labels["neg_equal_one"],
                                            1.0)
        labels["targets"] = jnp.where(valid, labels["targets"], 0.0)
        return labels

    return jax.vmap(per_agent)(jnp.asarray(lidar_pose_clean),
                               jnp.asarray(agent_mask))

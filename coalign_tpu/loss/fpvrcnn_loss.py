"""FPV-RCNN two-stage loss.

TPU-first rework of ref opencood/loss/fpvrcnn_loss.py:7 (+ ciassd_loss.py:9):
stage 1 is the standard anchor loss on the per-agent ``*_single`` outputs;
stage 2 matches fused RoIs to gt by center distance + BEV IoU and applies an
IoU-confidence BCE plus smooth-L1 on the refined residuals of positives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coalign_tpu.loss.point_pillar_loss import build_loss as _build_pp
from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils.iou import rotated_iou_corners


def roi_stage2_loss(outputs: dict, gt_boxes, gt_mask,
                    pos_iou: float = 0.5, neg_iou: float = 0.25):
    """Stage-2 loss for one batch. gt_boxes (B, M, 7), gt_mask (B, M)."""

    def per_frame(rois, roi_mask, cls, refined, gt, gtm):
        rc = B.boxes_to_corners_3d(rois, "hwl")[:, :4, :2]
        gc = B.boxes_to_corners_3d(gt, "hwl")[:, :4, :2]
        iou = rotated_iou_corners(rc, gc)                    # (R, M)
        iou = jnp.where(gtm[None, :], iou, 0.0)
        best = iou.max(-1)
        tgt_idx = iou.argmax(-1)
        pos = (best >= pos_iou) & roi_mask
        neg = (best < neg_iou) & roi_mask
        # IoU-aware confidence target (CIA-SSD style): clipped linear map
        cls_tgt = jnp.clip((best - neg_iou) / (pos_iou - neg_iou), 0, 1)
        ce = (jnp.clip(cls, 0, None) - cls * cls_tgt
              + jnp.log1p(jnp.exp(-jnp.abs(cls))))
        cls_loss = jnp.where(roi_mask, ce, 0.0).sum() / jnp.maximum(
            roi_mask.sum(), 1)

        matched = gt[tgt_idx]
        diff = refined - matched
        yaw = jnp.arctan2(jnp.sin(diff[..., 6]), jnp.cos(diff[..., 6]))
        diff = jnp.concatenate([diff[..., :6], yaw[..., None]], -1)
        sm = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff ** 2,
                       jnp.abs(diff) - 0.5).sum(-1)
        reg_loss = jnp.where(pos, sm, 0.0).sum() / jnp.maximum(pos.sum(), 1)
        del neg
        return cls_loss, reg_loss

    cls_l, reg_l = jax.vmap(per_frame)(
        outputs["rois"], outputs["roi_mask"], outputs["roi_cls"],
        outputs["boxes_refined"], gt_boxes, gt_mask)
    return cls_l.mean(), reg_l.mean()


class FpvRcnnLoss:
    def __init__(self, det_loss, stage2_cls_weight=1.0,
                 stage2_reg_weight=1.0, stage: int = 2):
        self.det_loss = det_loss
        self.stage2_cls_weight = stage2_cls_weight
        self.stage2_reg_weight = stage2_reg_weight
        self.stage = stage

    # make_train_step computes per-agent "_single" labels for this loss
    # (ref supervise_single second pass, train.py:119-121)
    wants_single_labels = True

    def __call__(self, outputs: dict, labels: dict):
        # stage-1 supervision on per-agent maps against per-agent labels
        if "cls_preds_single" in outputs and "pos_equal_one_single" in \
                labels:
            s1_out = {k[:-len("_single")]: v for k, v in outputs.items()
                      if k.endswith("_single")}
            s1_labels = {k[:-len("_single")]: v for k, v in labels.items()
                         if k.endswith("_single")}
            total, metrics = self.det_loss(s1_out, s1_labels)
        elif "cls_preds_single" in outputs and "pos_equal_one" in labels \
                and (outputs["cls_preds_single"].shape[0]
                     == labels["pos_equal_one"].shape[0]):
            # legacy path: caller supplied frame-level labels that already
            # match the per-agent rows (single-agent batches)
            s1_out = {k[:-len("_single")]: v for k, v in outputs.items()
                      if k.endswith("_single")}
            total, metrics = self.det_loss(s1_out, labels)
        else:
            total = jnp.asarray(0.0)
            metrics = {}
        metrics = dict(metrics)
        if self.stage >= 2 and "gt_boxes" in labels:
            cls_l, reg_l = roi_stage2_loss(outputs, labels["gt_boxes"],
                                           labels["gt_mask"])
            total = (total + self.stage2_cls_weight * cls_l
                     + self.stage2_reg_weight * reg_l)
            metrics.update(stage2_cls=cls_l, stage2_reg=reg_l)
        metrics["total_loss"] = total
        return total, metrics


def build_fpvrcnn_loss(args: dict) -> FpvRcnnLoss:
    det = _build_pp(args)
    s2 = args.get("stage2", {})
    return FpvRcnnLoss(det, s2.get("cls_weight", 1.0),
                       s2.get("reg_weight", 1.0), s2.get("stage", 2))

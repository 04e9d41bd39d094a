"""Depth-distribution supervision for the camera branch.

TPU-first rework of the reference's depth supervision
(ref lss_submodule.py:51-69 depth_supervision + camera_utils.bin_depths):
cross-entropy between the CamEncoder's per-pixel depth logits and the
binned gt depth map, ignoring pixels whose depth falls outside the
discretization range.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coalign_tpu.ops.lss import bin_depths


def depth_supervision_loss(depth_logits, depth_map, ddiscr, mode,
                           downsample: int = 8):
    """depth_logits: (F, N, fH, fW, D); depth_map: (F, N, H, W) metric.

    Returns mean CE over supervised pixels."""
    d = depth_logits.shape[-1]
    fh, fw = depth_logits.shape[-3:-1]
    dm = depth_map[..., ::downsample, ::downsample][..., :fh, :fw]
    idx = bin_depths(dm, mode, ddiscr[0], ddiscr[1], d)  # d == ignore
    valid = idx < d
    logp = jax.nn.log_softmax(depth_logits, axis=-1)
    onehot = jax.nn.one_hot(jnp.minimum(idx, d - 1), d, axis=-1)
    ce = -(onehot * logp).sum(-1)
    return (ce * valid).sum() / jnp.maximum(valid.sum(), 1)


class CameraDetLoss:
    """Detection loss + optional depth supervision for LSS models
    (ref camera configs: point_pillar_loss + depth items)."""

    def __init__(self, det_loss, depth_weight: float, ddiscr, mode,
                 downsample: int = 8):
        self.det_loss = det_loss
        self.depth_weight = depth_weight
        self.ddiscr = ddiscr
        self.mode = mode
        self.downsample = downsample

    def __call__(self, outputs: dict, labels: dict):
        total, metrics = self.det_loss(outputs, labels)
        metrics = dict(metrics)
        if (self.depth_weight and "depth_logits" in outputs
                and "depth_map" in labels):
            dl = depth_supervision_loss(
                outputs["depth_logits"], labels["depth_map"],
                self.ddiscr, self.mode, self.downsample)
            total = total + self.depth_weight * dl
            metrics.update(depth_loss=dl, total_loss=total)
        return total, metrics


def build_camera_loss(args: dict):
    from coalign_tpu.loss.point_pillar_loss import build_loss as _pp

    det = _pp(args)
    dep = args.get("depth", {})
    return CameraDetLoss(det, dep.get("weight", 1.0),
                         tuple(dep.get("ddiscr", (2, 50, 48))),
                         dep.get("mode", "LID"),
                         dep.get("downsample", 8))

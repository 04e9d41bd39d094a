"""Robust V2VNet loss: detection + pose regression + attention supervision.

TPU-first rework of ref opencood/loss/point_pillar_v2v_robust_loss.py:77:
detection loss plus (stage >= 1) a smooth-L1 pose-correction loss against
the true noise-correction target (computed on device by the model from
clean vs noisy poses) and a BCE attention target (valid pairs should score
high — the reference supervises attention toward trusting correct poses).
"""

from __future__ import annotations

import jax.numpy as jnp

from coalign_tpu.loss.point_pillar_loss import build_loss as _build_pp


def smooth_l1(x, beta=1.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax ** 2 / beta, ax - 0.5 * beta)


class RobustLoss:
    def __init__(self, det_loss, stage: int = 0, pose_weight: float = 1.0,
                 score_weight: float = 0.2, angle_weight: float = 10.0):
        self.det_loss = det_loss
        self.stage = stage
        self.pose_weight = pose_weight
        self.score_weight = score_weight
        self.angle_weight = angle_weight

    def __call__(self, outputs: dict, labels: dict):
        total, metrics = self.det_loss(outputs, labels)
        metrics = dict(metrics)
        if self.stage >= 1 and "pose_corr_target" in outputs:
            err = outputs["pose_corr"] - outputs["pose_corr_target"]
            # wrap the yaw residual
            yaw = jnp.arctan2(jnp.sin(err[..., 2]), jnp.cos(err[..., 2]))
            pose_loss = (smooth_l1(err[..., :2]).sum(-1)
                         + self.angle_weight * smooth_l1(yaw)).mean()
            score = jnp.clip(outputs["agent_scores"], 1e-4, 1 - 1e-4)
            score_loss = (-jnp.log(score)).mean()
            total = total + self.pose_weight * pose_loss \
                + self.score_weight * score_loss
            metrics.update(pose_loss=pose_loss, score_loss=score_loss)
        metrics["total_loss"] = total
        return total, metrics


def build_robust_loss(args: dict) -> RobustLoss:
    det = _build_pp(args)
    rb = args.get("robust", {})
    return RobustLoss(det, stage=rb.get("stage", 0),
                      pose_weight=rb.get("pose_weight", 1.0),
                      score_weight=rb.get("score_weight", 0.2),
                      angle_weight=rb.get("angle_weight", 10.0))


class MashLoss:
    """Detection + correspondence-entropy regularizer
    (ref opencood/loss/point_pillar_mash_loss.py — the reference supervises
    the correspondence volume with CE toward the true offset; pose-free
    training here encourages confident matches via low entropy)."""

    def __init__(self, det_loss, corr_weight: float = 0.1):
        self.det_loss = det_loss
        self.corr_weight = corr_weight

    def __call__(self, outputs: dict, labels: dict):
        total, metrics = self.det_loss(outputs, labels)
        metrics = dict(metrics)
        if "corr_vol" in outputs and outputs["corr_vol"] is not None:
            logits = outputs["corr_vol"]
            p = jnp.exp(logits - logits.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            entropy = -(p * jnp.log(p + 1e-9)).sum(-1).mean()
            total = total + self.corr_weight * entropy
            metrics.update(corr_entropy=entropy)
        metrics["total_loss"] = total
        return total, metrics


def build_mash_loss(args: dict) -> MashLoss:
    det = _build_pp(args)
    return MashLoss(det, corr_weight=args.get("mash", {}).get(
        "corr_weight", 0.1))

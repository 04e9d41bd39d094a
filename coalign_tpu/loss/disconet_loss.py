"""DiscoNet knowledge-distillation loss.

TPU-first rework of ref opencood/loss/point_pillar_disconet_loss.py:11-75:
the standard PointPillar detection loss plus a channelwise KL divergence
between the student's fused BEV feature map and the frozen early-fusion
teacher's feature map (softmax over channels per pixel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coalign_tpu.loss.point_pillar_loss import build_loss as _build_pp


def channel_kl(student, teacher):
    """mean KL(softmax(teacher) || softmax(student)) over pixels; features
    are NHWC, softmax over C (ref disconet_loss kd_loss_feature)."""
    t = jax.nn.softmax(teacher, axis=-1)
    log_s = jax.nn.log_softmax(student, axis=-1)
    log_t = jax.nn.log_softmax(teacher, axis=-1)
    # KLDivLoss(size_average=True) averages over ALL elements, not pixels
    return (t * (log_t - log_s)).mean()


class DiscoNetLoss:
    def __init__(self, det_loss, kd_weight: float = 1.0,
                 decoder_kd: bool = False):
        self.det_loss = det_loss
        self.kd_weight = kd_weight
        self.decoder_kd = decoder_kd

    def __call__(self, outputs: dict, labels: dict):
        total, metrics = self.det_loss(outputs, labels)
        kd = channel_kl(outputs["feature"],
                        jax.lax.stop_gradient(outputs["teacher_feature"]))
        if self.decoder_kd:
            kd = kd + channel_kl(
                outputs["reg_preds"],
                jax.lax.stop_gradient(outputs["teacher_reg_preds"]))
            kd = kd + channel_kl(
                outputs["cls_preds"],
                jax.lax.stop_gradient(outputs["teacher_cls_preds"]))
        total = total + self.kd_weight * kd
        metrics = dict(metrics)
        metrics.update(kd_loss=kd, total_loss=total)
        return total, metrics


def build_disconet_loss(args: dict) -> DiscoNetLoss:
    det = _build_pp(args)
    kd = args.get("kd", {})
    return DiscoNetLoss(det, kd_weight=kd.get("weight", 1.0),
                        decoder_kd=kd.get("decoder_kd", False))

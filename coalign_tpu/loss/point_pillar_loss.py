"""PointPillars detection loss: focal cls + smooth-L1 reg (sin-diff) + dir CE.

TPU-first rework of opencood/loss/point_pillar_loss.py — a pure function of
(outputs, targets) returning (total, metrics dict); no stateful loss_dict.
NHWC prediction maps; all masking is vectorized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.utils.common import limit_period


class PointPillarLossCfg(NamedTuple):
    pos_cls_weight: float = 2.0
    cls_alpha: float = 0.25
    cls_gamma: float = 2.0
    cls_weight: float = 2.0
    reg_sigma: float = 3.0
    reg_weight: float = 2.0
    use_dir: bool = False
    dir_weight: float = 0.2
    dir_offset: float = 0.7853
    num_bins: int = 2
    anchor_yaw_deg: tuple = (0.0, 90.0)


def build_loss(loss_args: dict) -> "PointPillarLoss":
    """Build from the yaml ``loss.args`` subtree (ref config schema)."""
    cfg = PointPillarLossCfg(
        pos_cls_weight=loss_args.get("pos_cls_weight", 2.0),
        cls_alpha=loss_args["cls"]["alpha"],
        cls_gamma=loss_args["cls"]["gamma"],
        cls_weight=loss_args["cls"]["weight"],
        reg_sigma=loss_args["reg"]["sigma"],
        reg_weight=loss_args["reg"]["weight"],
        use_dir="dir" in loss_args,
        dir_weight=loss_args.get("dir", {}).get("weight", 0.2),
        dir_offset=loss_args.get("dir", {}).get("args", {}).get("dir_offset", 0.7853),
        num_bins=loss_args.get("dir", {}).get("args", {}).get("num_bins", 2),
        anchor_yaw_deg=tuple(
            loss_args.get("dir", {}).get("args", {}).get("anchor_yaw", (0, 90))),
    )
    return PointPillarLoss(cfg)


def sigmoid_focal_loss(logits, targets, alpha, gamma):
    """Elementwise sigmoid focal loss (ref point_pillar_loss.py:234-245)."""
    ce = (jnp.clip(logits, 0, None) - logits * targets
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    modulator = (1.0 - p_t) ** gamma
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    return modulator * alpha_w * ce


def weighted_smooth_l1(preds, targets, sigma):
    """Huber with 1/sigma^2 transition (ref point_pillar_loss.py:222-230)."""
    diff = jnp.abs(preds - targets)
    cut = 1.0 / (sigma ** 2)
    quad = 0.5 * (diff * sigma) ** 2
    lin = diff - 0.5 * cut
    return jnp.where(diff <= cut, quad, lin)


def add_sin_difference(pred_yaw, target_yaw):
    """sin(a - b) angle encoding (ref point_pillar_loss.py:126-137)."""
    return (jnp.sin(pred_yaw) * jnp.cos(target_yaw),
            jnp.cos(pred_yaw) * jnp.sin(target_yaw))


class PointPillarLoss:
    """Callable loss. outputs/targets use NHWC maps:

    outputs: cls_preds (B, H, W, A), reg_preds (B, H, W, A*7),
             optional dir_preds (B, H, W, A*num_bins)
    targets: pos_equal_one (B, H, W, A), neg_equal_one (B, H, W, A),
             targets (B, H, W, A*7)
    sample_mask: optional (B,) bool for padded samples (e.g. padded agents
             when supervising single-agent heads); replaces the reference's
             record_len-based normalization (point_pillar_loss.py:42-48).
    """

    def __init__(self, cfg: PointPillarLossCfg):
        self.cfg = cfg

    def __call__(self, outputs: dict, targets: dict, sample_mask=None,
                 suffix: str = ""):
        cfg = self.cfg
        cls_preds = outputs[f"cls_preds{suffix}"]
        reg_preds = outputs[f"reg_preds{suffix}"]
        b = cls_preds.shape[0]

        pos = targets["pos_equal_one"].reshape(b, -1, 1)
        neg = targets["neg_equal_one"].reshape(b, -1, 1)
        reg_t = targets["targets"].reshape(b, -1, 7)
        if sample_mask is None:
            sample_mask = jnp.ones((b,), dtype=cls_preds.dtype)
        else:
            sample_mask = jnp.asarray(sample_mask).astype(cls_preds.dtype)
        denom = jnp.maximum(jnp.sum(sample_mask), 1.0)

        pos = pos * sample_mask[:, None, None]
        neg = neg * sample_mask[:, None, None]
        pos_normalizer = jnp.clip(pos.sum(axis=1, keepdims=True), 1.0, None)

        # cls
        cls_logits = cls_preds.reshape(b, -1, 1)
        cls_weights = (pos * cfg.pos_cls_weight + neg) / pos_normalizer
        cls_loss = sigmoid_focal_loss(cls_logits, pos, cfg.cls_alpha,
                                      cfg.cls_gamma) * cls_weights
        cls_loss = cls_loss.sum() * cfg.cls_weight / denom

        # reg
        reg_weights = pos / pos_normalizer
        reg_p = reg_preds.reshape(b, -1, 7)
        sin_p, sin_t = add_sin_difference(reg_p[..., 6], reg_t[..., 6])
        reg_p = jnp.concatenate([reg_p[..., :6], sin_p[..., None]], axis=-1)
        reg_tt = jnp.concatenate([reg_t[..., :6], sin_t[..., None]], axis=-1)
        reg_loss = weighted_smooth_l1(reg_p, reg_tt, cfg.reg_sigma) * reg_weights
        reg_loss = reg_loss.sum() * cfg.reg_weight / denom

        total = cls_loss + reg_loss
        metrics = {"cls_loss": cls_loss, "reg_loss": reg_loss}

        if cfg.use_dir and f"dir_preds{suffix}" in outputs:
            dir_logits = outputs[f"dir_preds{suffix}"].reshape(
                b, -1, cfg.num_bins)
            dir_targets = self._direction_targets(reg_t)
            logp = jax.nn.log_softmax(dir_logits, axis=-1)
            dir_ce = -jnp.sum(dir_targets * logp, axis=-1)  # (B, K)
            dir_loss = (dir_ce * reg_weights[..., 0]).sum() * cfg.dir_weight / denom
            total = total + dir_loss
            metrics["dir_loss"] = dir_loss

        metrics["total_loss"] = total
        return total, metrics

    def _direction_targets(self, reg_t):
        """One-hot direction bins from yaw residuals
        (ref point_pillar_loss.py:139-166 get_direction_target)."""
        cfg = self.cfg
        b, k, _ = reg_t.shape
        a = len(cfg.anchor_yaw_deg)
        anchor_yaw = jnp.deg2rad(jnp.asarray(cfg.anchor_yaw_deg))
        yaw_map = jnp.tile(anchor_yaw, k // a)  # (K,)
        rot_gt = reg_t[..., 6] + yaw_map[None, :]
        offset_rot = limit_period(rot_gt - cfg.dir_offset, 0.0, 2 * np.pi)
        bins = jnp.floor(offset_rot / (2 * np.pi / cfg.num_bins)).astype(jnp.int32)
        bins = jnp.clip(bins, 0, cfg.num_bins - 1)
        return jax.nn.one_hot(bins, cfg.num_bins, dtype=reg_t.dtype)

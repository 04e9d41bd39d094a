"""VoxelNet loss: per-anchor BCE split into pos/neg terms + smooth-L1.

Faithful semantics of ref opencood/loss/voxel_net_loss.py:13-62 as a pure
(outputs, labels) -> (total, metrics) function:

  cls_pos = sum(-pos * log(sigmoid(psm) + 1e-6)) / (sum(pos) + 1e-6)
  cls_neg = sum(-neg * log(1 - sigmoid(psm) + 1e-6)) / (sum(neg) + 1e-6)
  reg     = sum(smooth_l1(rm * pos, targets * pos)) / (sum(pos) + 1e-6)
  total   = reg_coe * reg + alpha * cls_pos + beta * cls_neg

The reference's SmoothL1Loss(size_average=False) is a SUM over all
elements (beta=1 kink), normalized by the positive-anchor count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class VoxelNetLoss:
    def __init__(self, alpha: float = 1.5, beta: float = 1.0,
                 reg_coe: float = 2.0):
        self.alpha = alpha
        self.beta = beta
        self.reg_coe = reg_coe

    def __call__(self, outputs: dict, labels: dict):
        """outputs: cls_preds (B, H, W, A), reg_preds (B, H, W, A*7) —
        NHWC already (the reference permutes from NCHW first);
        labels: pos_equal_one/neg_equal_one (B, H, W, A),
        targets (B, H, W, A*7)."""
        psm = outputs["cls_preds"]
        rm = outputs["reg_preds"]
        pos = labels["pos_equal_one"]
        neg = labels["neg_equal_one"]
        targets = labels["targets"]

        p_pos = jax.nn.sigmoid(psm)
        pos_sum = pos.sum()
        cls_pos = (-pos * jnp.log(p_pos + 1e-6)).sum() / (pos_sum + 1e-6)
        cls_neg = ((-neg * jnp.log1p(-(p_pos - 1e-6))).sum()
                   / (neg.sum() + 1e-6))

        a = rm.shape[-1] // 7
        shape = rm.shape[:-1] + (a, 7)
        pos7 = pos[..., None]
        diff = (rm.reshape(shape) - targets.reshape(shape)) * pos7
        sm = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff ** 2,
                       jnp.abs(diff) - 0.5)
        reg = sm.sum() / (pos_sum + 1e-6)

        conf = self.alpha * cls_pos + self.beta * cls_neg
        total = self.reg_coe * reg + conf
        return total, {"total_loss": total, "conf_loss": conf,
                       "reg_loss": reg, "cls_pos_loss": cls_pos,
                       "cls_neg_loss": cls_neg}


def build_voxelnet_loss(args: dict) -> VoxelNetLoss:
    return VoxelNetLoss(alpha=args.get("alpha", 1.5),
                        beta=args.get("beta", 1.0),
                        reg_coe=args.get("reg", 2.0))

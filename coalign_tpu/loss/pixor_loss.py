"""PIXOR dense-map loss: BCE occupancy + masked smooth-L1 regression.

TPU-first rework of ref opencood/loss/pixor_loss.py:13-70 as a pure
(outputs, labels) -> (total, metrics) function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class PixorLoss:
    def __init__(self, alpha: float = 1.0, beta: float = 1.0):
        self.alpha = alpha
        self.beta = beta

    def __call__(self, outputs: dict, labels: dict):
        """outputs: cls_map (B, H, W, 1), reg_map (B, H, W, 6);
        labels: label_map (B, H, W, 7)."""
        label_map = labels["label_map"]
        cls_t = label_map[..., 0:1]
        reg_t = label_map[..., 1:]
        cls_p, reg_p = outputs["cls_map"], outputs["reg_map"]

        ce = (jnp.clip(cls_p, 0, None) - cls_p * cls_t
              + jnp.log1p(jnp.exp(-jnp.abs(cls_p))))
        cls_loss = ce.mean()

        diff = (reg_p - reg_t) * cls_t
        sm = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff ** 2,
                       jnp.abs(diff) - 0.5)
        pos = cls_t.sum()
        reg_loss = sm.sum() / jnp.maximum(pos, 1.0)

        total = self.alpha * cls_loss + self.beta * reg_loss
        return total, {"total_loss": total, "cls_loss": cls_loss,
                       "reg_loss": reg_loss}


def build_pixor_loss(args: dict) -> PixorLoss:
    return PixorLoss(alpha=args.get("alpha", 1.0),
                     beta=args.get("beta", 1.0))

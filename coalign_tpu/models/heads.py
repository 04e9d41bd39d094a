"""Detection heads: 1x1 convs for cls / reg / dir / iou / uncertainty.

Uniform head contract of the reference model zoo (ref SURVEY §2.6): NHWC
maps ``cls_preds (F, H, W, A)``, ``reg_preds (F, H, W, A*7)``, optional
``dir_preds (F, H, W, A*bins)``, ``iou_preds``, ``unc_preds``.
"""

from __future__ import annotations

import flax.linen as nn


class DetectionHeads(nn.Module):
    anchor_number: int
    use_dir: bool = False
    num_bins: int = 2
    use_iou: bool = False
    use_unc: bool = False
    unc_dim: int = 3  # (x, y, yaw) log-variances per anchor

    @nn.compact
    def __call__(self, x):
        out = {
            "cls_preds": nn.Conv(self.anchor_number, (1, 1), name="cls_head")(x),
            "reg_preds": nn.Conv(7 * self.anchor_number, (1, 1),
                                 name="reg_head")(x),
        }
        if self.use_dir:
            out["dir_preds"] = nn.Conv(self.num_bins * self.anchor_number,
                                       (1, 1), name="dir_head")(x)
        if self.use_iou:
            out["iou_preds"] = nn.Conv(self.anchor_number, (1, 1),
                                       name="iou_head")(x)
        if self.use_unc:
            out["unc_preds"] = nn.Conv(self.unc_dim * self.anchor_number,
                                       (1, 1), name="unc_head")(x)
        return out

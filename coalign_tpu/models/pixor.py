"""PIXOR dense BEV detector (+ intermediate-fusion variant).

TPU-first rework of ref opencood/models/pixor.py:256 /
pixor_intermediate.py:38: the BEV occupancy raster is computed on device
(ops/bev_raster.py) instead of in dataloader workers, the backbone is a
Bottleneck ResNet ([3, 6, 6, 3] stages like the reference) returning 4x
downsampled features, and the header emits a 1-ch dense cls map + 6-ch reg
map [cos, sin, dx, dy, log w, log l] (no anchors).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from coalign_tpu.models import register_model
from coalign_tpu.models.fuse.fusion import build_fusion
from coalign_tpu.models.layers import ConvBNReLU, MaskedBatchNorm
from coalign_tpu.ops.bev_raster import BevSpec, rasterize_bev


class Bottleneck(nn.Module):
    """torchvision-style bottleneck (ref pixor.py Bottleneck)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * 4
        identity = x
        y = ConvBNReLU(self.planes, 1, 1, 0)(x, train=train)
        y = ConvBNReLU(self.planes, 3, self.stride, 1)(y, train=train)
        y = nn.Conv(out_ch, (1, 1), use_bias=False)(y)
        y = MaskedBatchNorm()(y, train=train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
            identity = MaskedBatchNorm()(identity, train=train)
        return nn.relu(y + identity)


class PixorBackbone(nn.Module):
    """Bottleneck stages [3, 6, 6, 3] with top-down lateral fusion; output
    is 4x downsampled (ref pixor.py BackBone)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(32, 3, 1, 1)(x, train=train)
        x = ConvBNReLU(32, 3, 1, 1)(x, train=train)

        def stage(x, planes, blocks, stride):
            x = Bottleneck(planes, stride)(x, train=train)
            for _ in range(blocks - 1):
                x = Bottleneck(planes, 1)(x, train=train)
            return x

        c1 = stage(x, 24, 3, 2)    # /2
        c2 = stage(c1, 48, 6, 2)   # /4
        c3 = stage(c2, 64, 6, 2)   # /8
        c4 = stage(c3, 96, 3, 2)   # /16

        # top-down: upsample c4 -> c3 -> /4 resolution
        l3 = nn.Conv(196, (1, 1))(c3)
        p4 = nn.Conv(196, (1, 1))(c4)
        p3 = l3 + nn.ConvTranspose(196, (3, 3), strides=(2, 2))(p4)
        l2 = nn.Conv(128, (1, 1))(c2)
        p2 = l2 + nn.ConvTranspose(128, (3, 3), strides=(2, 2))(p3)
        return p2  # (B, H/4, W/4, 128)


class PixorHeader(nn.Module):
    """4 shared convs -> 1-ch cls + 6-ch reg (ref pixor.py Header)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(4):
            x = ConvBNReLU(96, 3, 1, 1)(x, train=train)
        cls = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                      bias_init=nn.initializers.constant(-4.595))(x)
        reg = nn.Conv(6, (3, 3), padding=[(1, 1), (1, 1)],
                      kernel_init=nn.initializers.zeros)(x)
        return cls, reg


class _PixorBase(nn.Module):
    args: Dict[str, Any]

    @classmethod
    def from_config(cls, args: dict):
        return cls(args=dict(args))

    @property
    def spec(self) -> BevSpec:
        return BevSpec.from_config(self.args["geometry_param"])

    def _rasterize(self, batch):
        points, mask = batch["points"], batch["point_mask"]
        if points.ndim == 4:
            points = points.reshape((-1,) + points.shape[2:])
            mask = mask.reshape((-1,) + mask.shape[2:])
        return jax.vmap(lambda p, m: rasterize_bev(p, m, self.spec))(
            points, mask)


@register_model("pixor")
class Pixor(_PixorBase):
    """Single-agent PIXOR (ref pixor.py:256-311)."""

    @nn.compact
    def __call__(self, batch, train: bool = False):
        bev = self._rasterize(batch)
        feat = PixorBackbone()(bev, train=train)
        cls, reg = PixorHeader()(feat, train=train)
        return {"cls_map": cls, "reg_map": reg}


@register_model("pixor_intermediate")
class PixorIntermediate(_PixorBase):
    """PIXOR with single-scale attentive fusion on the 4x features
    (ref pixor_intermediate.py:38)."""

    @nn.compact
    def __call__(self, batch, train: bool = False):
        b, l = batch["agent_mask"].shape
        bev = self._rasterize(batch)
        feat = PixorBackbone()(bev, train=train)
        fh, fw, c = feat.shape[1:]
        # the reference fuses with no warping (assumes points are already
        # projected into the ego frame, proj_first-style) — identity affine
        eye = jnp.tile(
            jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                        dtype=feat.dtype), (b, l, l, 1, 1))
        fusion = build_fusion(self.args.get("fusion_method", "att"),
                              self.args, c)
        fused = fusion(feat.reshape(b, l, fh, fw, c), eye,
                       batch["agent_mask"], train=train)
        cls, reg = PixorHeader()(fused, train=train)
        return {"cls_map": cls, "reg_map": reg}

"""BEV backbones with a multiscale split for intermediate fusion.

ResNetBEVBackbone (ref base_bev_backbone_resnet.py:15) and BaseBEVBackbone
(ref base_bev_backbone.py:6) in flax/NHWC. Both expose
``encode`` (-> per-scale features, fusion happens in between) and ``decode``
(per-scale deblocks + concat), mirroring the reference's
get_multiscale_feature / decode_multiscale_feature split.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from coalign_tpu.models.layers import ConvStage, Deblock, ResNetTrunk


class ResNetBEVBackbone(nn.Module):
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[float]
    num_upsample_filters: Sequence[int]

    @classmethod
    def from_config(cls, cfg: dict):
        return cls(
            layer_nums=tuple(cfg["layer_nums"]),
            layer_strides=tuple(cfg["layer_strides"]),
            num_filters=tuple(cfg["num_filters"]),
            upsample_strides=tuple(cfg.get("upsample_strides", ())),
            num_upsample_filters=tuple(cfg.get("num_upsample_filter", ())),
        )

    def setup(self):
        self.trunk = ResNetTrunk(self.layer_nums, self.layer_strides,
                                 self.num_filters)
        self.deblocks = [
            Deblock(f, s) for f, s in zip(self.num_upsample_filters,
                                          self.upsample_strides)
        ]
        # optional extra final deblock (ref base_bev_backbone_resnet.py:79-85)
        self.extra_deblock = (
            Deblock(sum(self.num_upsample_filters), self.upsample_strides[-1])
            if len(self.upsample_strides) > len(self.layer_nums) else None)

    def encode(self, x, train: bool = False, mask=None):
        """(F, H, W, C) -> tuple of per-scale features."""
        return self.trunk(x, train=train, mask=mask)

    def decode(self, features, train: bool = False, mask=None):
        """Per-scale deblocks + channel concat -> (F, H/2, W/2, sum(C_up))."""
        ups = [deb(f, train=train, mask=mask)
               for deb, f in zip(self.deblocks, features)]
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if self.extra_deblock is not None:
            x = self.extra_deblock(x, train=train, mask=mask)
        return x

    def __call__(self, x, train: bool = False, mask=None):
        return self.decode(self.encode(x, train=train, mask=mask),
                           train=train, mask=mask)


class BaseBEVBackbone(nn.Module):
    """Plain SECOND-style conv backbone (ref base_bev_backbone.py:6)."""

    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[float]
    num_upsample_filters: Sequence[int]

    @classmethod
    def from_config(cls, cfg: dict):
        return cls(
            layer_nums=tuple(cfg["layer_nums"]),
            layer_strides=tuple(cfg["layer_strides"]),
            num_filters=tuple(cfg["num_filters"]),
            upsample_strides=tuple(cfg.get("upsample_strides", ())),
            num_upsample_filters=tuple(cfg.get("num_upsample_filter", ())),
        )

    def setup(self):
        self.stages = [
            ConvStage(n, f, s) for n, f, s in zip(
                self.layer_nums, self.num_filters, self.layer_strides)
        ]
        self.deblocks = [
            Deblock(f, s) for f, s in zip(self.num_upsample_filters,
                                          self.upsample_strides)
        ]
        self.extra_deblock = (
            Deblock(sum(self.num_upsample_filters), self.upsample_strides[-1])
            if len(self.upsample_strides) > len(self.layer_nums) else None)

    def encode(self, x, train: bool = False, mask=None):
        outs = []
        for stage in self.stages:
            x = stage(x, train=train, mask=mask)
            outs.append(x)
        return tuple(outs)

    def decode(self, features, train: bool = False, mask=None):
        ups = [deb(f, train=train, mask=mask)
               for deb, f in zip(self.deblocks, features)]
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if self.extra_deblock is not None:
            x = self.extra_deblock(x, train=train, mask=mask)
        return x

    def __call__(self, x, train: bool = False, mask=None):
        return self.decode(self.encode(x, train=train, mask=mask),
                           train=train, mask=mask)

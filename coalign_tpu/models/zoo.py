"""PointPillars model family (single-agent, single-scale and multiscale
collaborative fusion).

TPU-first rework of:
  * opencood/models/point_pillar.py:17 (single agent)
  * opencood/models/point_pillar_baseline.py:17 (single-scale fusion)
  * opencood/models/point_pillar_baseline_multiscale.py:17 (per-scale
    fusion; `point_pillar_coalign.py:9` aliases it as the CoAlign model)

Batch contract (padded, fixed shapes — see coalign_tpu/__init__ docstring):
  points            (B, L, N, 4) float   raw lidar in each agent's frame
  point_mask        (B, L, N)    bool
  agent_mask        (B, L)       bool    (ego is slot 0, always valid)
  pairwise_t_matrix (B, L, L, 4, 4)      T_j<-i agent transforms

Outputs NHWC: cls_preds (B, H/2, W/2, A), reg_preds (..., A*7),
optionally dir_preds (..., A*bins). Single-agent heads for
``supervise_single`` come out with the ``_single`` suffix on (B*L, ...).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from coalign_tpu.models import register_model
from coalign_tpu.models.backbones import BaseBEVBackbone, ResNetBEVBackbone
from coalign_tpu.models.fuse.fusion import build_fusion
from coalign_tpu.models.heads import DetectionHeads
from coalign_tpu.models.layers import DownsampleConv, NaiveCompressor
from coalign_tpu.models.pillar_encoder import PillarEncoder
from coalign_tpu.ops.pillars import PillarSpec
from coalign_tpu.utils.transforms import normalize_pairwise_tfm


def _backbone_from_config(cfg: dict):
    if cfg.get("resnet", True):
        return ResNetBEVBackbone.from_config(cfg)
    return BaseBEVBackbone.from_config(cfg)


class _PillarBase(nn.Module):
    """Shared config plumbing for the PointPillars family."""

    args: Dict[str, Any]

    @classmethod
    def from_config(cls, args: dict):
        return cls(args=dict(args))

    @property
    def spec(self) -> PillarSpec:
        return PillarSpec.from_config(self.args["lidar_range"],
                                      self.args["voxel_size"])

    def _make_encoder(self):
        vfe = self.args["pillar_vfe"]
        return PillarEncoder(
            spec=self.spec,
            num_filters=tuple(vfe["num_filters"]),
            use_norm=vfe.get("use_norm", True),
            with_distance=vfe.get("with_distance", False),
            use_absolute_xyz=vfe.get("use_absolute_xyz", True),
            pad_parity=vfe.get("pad_parity", False),
        )

    def _make_heads(self):
        return DetectionHeads(
            anchor_number=self.args["anchor_number"],
            use_dir="dir_args" in self.args,
            num_bins=self.args.get("dir_args", {}).get("num_bins", 2),
            use_iou=self.args.get("use_iou_head", False),
            use_unc="uncertainty_dim" in self.args,
            unc_dim=self.args.get("uncertainty_dim", 3),
        )


@register_model("point_pillar")
class PointPillar(_PillarBase):
    """Single-agent PointPillars (no fusion / late-fusion per-agent model)."""

    def setup(self):
        self.encoder = self._make_encoder()
        self.backbone = _backbone_from_config(self.args["base_bev_backbone"])
        self.shrink = (DownsampleConv.from_config(self.args["shrink_header"])
                       if "shrink_header" in self.args else None)
        self.heads = self._make_heads()

    def __call__(self, batch, train: bool = False):
        points = batch["points"]
        mask = batch["point_mask"]
        if points.ndim == 4:  # (B, L, N, 4) -> flatten agents
            points = points.reshape((-1,) + points.shape[2:])
            mask = mask.reshape((-1,) + mask.shape[2:])
        bev = self.encoder(points, mask, train=train)
        sample_mask = batch.get("agent_mask")
        bn_mask = (sample_mask.reshape(-1)[:, None, None]
                   if sample_mask is not None else None)
        x = self.backbone(bev, train=train, mask=bn_mask)
        if self.shrink is not None:
            x = self.shrink(x, train=train)
        return self.heads(x)


class _CollaborativeBase(_PillarBase):
    """Shared forward plumbing for intermediate-fusion models."""

    def _encode_agents(self, batch, train):
        from coalign_tpu.models.layers import compute_dtype

        b, l, n, _ = batch["points"].shape
        points = batch["points"].reshape(b * l, n, -1)
        pmask = batch["point_mask"].reshape(b * l, n)
        bev = self.encoder(points, pmask, train=train)  # (B*L, ny, nx, C)
        if compute_dtype() is not None:
            bev = bev.astype(compute_dtype())
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], self.spec.ny, self.spec.nx,
            self.args["voxel_size"][0])  # (B, L, L, 2, 3); [b,i,j] i<-j warp
        bn_mask = batch["agent_mask"].reshape(b * l)[:, None, None]
        return bev, affine, bn_mask, (b, l)


@register_model("point_pillar_baseline")
class PointPillarBaseline(_CollaborativeBase):
    """Backbone -> (shrink/compress) -> single-scale fusion -> heads
    (ref point_pillar_baseline.py:100-138)."""

    def setup(self):
        self.encoder = self._make_encoder()
        self.backbone = _backbone_from_config(self.args["base_bev_backbone"])
        self.shrink = (DownsampleConv.from_config(self.args["shrink_header"])
                       if "shrink_header" in self.args else None)
        self.compressor = (
            NaiveCompressor(self.args["shrink_header"]["dim"][-1]
                            if "shrink_header" in self.args else
                            sum(self.args["base_bev_backbone"]
                                ["num_upsample_filter"]),
                            self.args["compression"])
            if self.args.get("compression", 0) else None)
        out_dim = (self.args["shrink_header"]["dim"][-1]
                   if "shrink_header" in self.args
                   else sum(self.args["base_bev_backbone"]["num_upsample_filter"]))
        self.fusion = build_fusion(self.args["fusion_method"], self.args,
                                   out_dim)
        self.heads = self._make_heads()

    def __call__(self, batch, train: bool = False):
        bev, affine, bn_mask, (b, l) = self._encode_agents(batch, train)
        x = self.backbone(bev, train=train, mask=bn_mask)
        if self.shrink is not None:
            x = self.shrink(x, train=train)
        if self.compressor is not None:
            x = self.compressor(x, train=train, mask=bn_mask)
        h, w, c = x.shape[1:]
        fused = self.fusion(x.reshape(b, l, h, w, c), affine,
                            batch["agent_mask"], train=train)
        return self.heads(fused)


@register_model("point_pillar_baseline_multiscale")
class PointPillarBaselineMultiscale(_CollaborativeBase):
    """Per-scale fusion inside the backbone — the CoAlign model
    (ref point_pillar_baseline_multiscale.py:93-138)."""

    def setup(self):
        self.encoder = self._make_encoder()
        bb_cfg = self.args["base_bev_backbone"]
        self.backbone = _backbone_from_config(bb_cfg)
        self.compressor = (NaiveCompressor(64, self.args["compression"])
                           if self.args.get("compression", 0) else None)
        feat_dims = self.args.get("att", {}).get(
            "feat_dim", list(bb_cfg["num_filters"]))
        self.fusion_nets = [
            build_fusion(self.args["fusion_method"], self.args, feat_dims[i])
            for i in range(len(bb_cfg["layer_nums"]))
        ]
        self.shrink = (DownsampleConv.from_config(self.args["shrink_header"])
                       if "shrink_header" in self.args else None)
        self.heads = self._make_heads()
        self.supervise_single = self.args.get("supervise_single", False)
        self.single_heads = self._make_heads() if self.supervise_single else None

    def __call__(self, batch, train: bool = False):
        bev, affine, bn_mask, (b, l) = self._encode_agents(batch, train)
        if self.compressor is not None:
            bev = self.compressor(bev, train=train, mask=bn_mask)
        scales = self.backbone.encode(bev, train=train, mask=bn_mask)
        fused_scales = []
        for i, feat in enumerate(scales):
            h, w, c = feat.shape[1:]
            fused_scales.append(self.fusion_nets[i](
                feat.reshape(b, l, h, w, c), affine,
                batch["agent_mask"], train=train))
        fused = self.backbone.decode(tuple(fused_scales), train=train)
        if self.shrink is not None:
            fused = self.shrink(fused, train=train)
        out = self.heads(fused)
        if self.supervise_single:
            single = self.backbone.decode(scales, train=train, mask=bn_mask)
            if self.shrink is not None:
                single = self.shrink(single, train=train)
            for k, v in self.single_heads(single).items():
                out[k + "_single"] = v
        return out


@register_model("point_pillar_coalign")
class CoAlign(PointPillarBaselineMultiscale):
    """Alias (ref point_pillar_coalign.py:9)."""


@register_model("point_pillar_intermediate")
class PointPillarIntermediate(PointPillarBaseline):
    """OpenCOOD's original attentive intermediate fusion — the baseline
    with self-attention fusion (ref point_pillar_intermediate.py:15)."""

    @classmethod
    def from_config(cls, args: dict):
        args = dict(args)
        args.setdefault("fusion_method", "att")
        return cls(args=args)


@register_model("point_pillar_deform_transformer")
class PointPillarDeformTransformer(PointPillarBaseline):
    """Deformable-attention fusion (ref point_pillar_deform_transformer.py
    :20, sub_modules/ms_deform_attn.py — the reference needs an external
    CUDA MSDA extension; here deformable sampling is bilinear gathers in
    XLA, see fuse/deform.py)."""

    @classmethod
    def from_config(cls, args: dict):
        args = dict(args)
        args.setdefault("fusion_method", "deform")
        return cls(args=args)


@register_model("point_pillar_where2comm")
class PointPillarWhere2comm(_CollaborativeBase):
    """Where2comm: per-agent confidence -> sparse transmission masks ->
    multiscale fusion (ref comm_modules/where2comm.py +
    fuse_modules/where2comm_attn.py:174). Single-agent heads provide both
    the confidence maps and the ``_single`` supervision outputs."""

    def setup(self):
        from coalign_tpu.models.fuse.where2comm import Where2commFusion

        self.encoder = self._make_encoder()
        bb_cfg = self.args["base_bev_backbone"]
        self.backbone = _backbone_from_config(bb_cfg)
        w2c = self.args.get("where2comm", {})
        self.fusion = Where2commFusion(
            agg_mode=w2c.get("agg_operator", {}).get("mode", "ATTEN"),
            feature_dims=tuple(bb_cfg["num_filters"]))
        self.shrink = (DownsampleConv.from_config(self.args["shrink_header"])
                       if "shrink_header" in self.args else None)
        self.heads = self._make_heads()
        self.single_heads = self._make_heads()

    def __call__(self, batch, train: bool = False):
        bev, affine, bn_mask, (b, l) = self._encode_agents(batch, train)
        scales = self.backbone.encode(bev, train=train, mask=bn_mask)

        single_feat = self.backbone.decode(scales, train=train, mask=bn_mask)
        if self.shrink is not None:
            single_feat = self.shrink(single_feat, train=train)
        single_out = self.single_heads(single_feat)

        h0, w0, a = single_out["cls_preds"].shape[1:]
        conf_logits = single_out["cls_preds"].reshape(b, l, h0, w0, a)
        conf_logits = jnp.asarray(jax.lax.stop_gradient(conf_logits))

        batched_scales = [
            f.reshape(b, l, *f.shape[1:]) for f in scales
        ]
        fused_scales, comm_rate = self.fusion(
            batched_scales, conf_logits, affine, batch["agent_mask"],
            train=train)
        fused = self.backbone.decode(tuple(fused_scales), train=train)
        if self.shrink is not None:
            fused = self.shrink(fused, train=train)
        out = self.heads(fused)
        out["comm_rate"] = comm_rate
        for k, v in single_out.items():
            out[k + "_single"] = v
        return out


@register_model("point_pillar_v2vnet_robust")
class PointPillarV2VNetRobust(_CollaborativeBase):
    """Robust V2VNet: learned pose correction + global consistency +
    agent attention (ref point_pillar_v2vnet_robust.py:21-139; see
    fuse/robust.py). The 3-stage curriculum (det -> pose nets -> joint,
    ref :72-79) is driven by ``robust.stage`` via optimizer param masks
    (tools/train_robust.stage_param_mask), not in-place requires_grad."""

    def setup(self):
        from coalign_tpu.models.fuse.robust import RobustFusion

        self.encoder = self._make_encoder()
        self.backbone = _backbone_from_config(self.args["base_bev_backbone"])
        self.shrink = (DownsampleConv.from_config(self.args["shrink_header"])
                       if "shrink_header" in self.args else None)
        out_dim = (self.args["shrink_header"]["dim"][-1]
                   if "shrink_header" in self.args
                   else sum(self.args["base_bev_backbone"]
                            ["num_upsample_filter"]))
        rb = self.args.get("robust", {})
        self.fusion = RobustFusion(
            feature_dim=out_dim,
            hidden=rb.get("hidden", 128),
            downsample_rate=rb.get("downsample_rate", 2.0),
            discrete_ratio=self.args["voxel_size"][0],
            use_consistency=rb.get("use_consistency", True))
        self.heads = self._make_heads()

    def __call__(self, batch, train: bool = False):
        from coalign_tpu.models.fuse.robust import tfm_to_pose3
        from coalign_tpu.utils.transforms import (get_pairwise_transformation,
                                                  inverse_tfm)

        bev, _, bn_mask, (b, l) = self._encode_agents(batch, train)
        x = self.backbone(bev, train=train, mask=bn_mask)
        if self.shrink is not None:
            x = self.shrink(x, train=train)
        h, w, c = x.shape[1:]
        fused, aux = self.fusion(
            x.reshape(b, l, h, w, c),
            batch["pairwise_t_matrix"].astype(x.dtype),
            batch["agent_mask"], train=train)
        out = self.heads(fused)
        out.update(aux)
        if "lidar_pose_clean" in batch:
            clean = get_pairwise_transformation(batch["lidar_pose_clean"],
                                                batch["agent_mask"])
            noisy = batch["pairwise_t_matrix"]
            target = tfm_to_pose3(
                clean @ jnp.asarray(inverse_tfm(noisy)))
            out["pose_corr_target"] = jax.lax.stop_gradient(target)
        return out


@register_model("point_pillar_mash")
class PointPillarMash(_CollaborativeBase):
    """MASH: pose-free correspondence-attention fusion
    (ref point_pillar_mash.py:18-160; see fuse/mash.py for the redesign)."""

    def setup(self):
        from coalign_tpu.models.fuse.mash import MASHFusion

        self.encoder = self._make_encoder()
        self.backbone = _backbone_from_config(self.args["base_bev_backbone"])
        self.shrink = (DownsampleConv.from_config(self.args["shrink_header"])
                       if "shrink_header" in self.args else None)
        out_dim = (self.args["shrink_header"]["dim"][-1]
                   if "shrink_header" in self.args
                   else sum(self.args["base_bev_backbone"]
                            ["num_upsample_filter"]))
        mash = self.args.get("mash", {})
        self.fusion = MASHFusion(
            feature_dim=out_dim,
            coarse_downsample=mash.get("coarse_downsample", 4),
            query_dim=mash.get("query_dim", 32))
        self.heads = self._make_heads()

    def __call__(self, batch, train: bool = False):
        bev, affine, bn_mask, (b, l) = self._encode_agents(batch, train)
        x = self.backbone(bev, train=train, mask=bn_mask)
        if self.shrink is not None:
            x = self.shrink(x, train=train)
        h, w, c = x.shape[1:]
        fused, corr_vol = self.fusion(x.reshape(b, l, h, w, c), affine,
                                      batch["agent_mask"], train=train)
        out = self.heads(fused)
        out["corr_vol"] = corr_vol
        return out


@register_model("point_pillar_disconet")
class PointPillarDiscoNet(PointPillarBaseline):
    """DiscoNet student: baseline with DiscoFusion + the fused ``feature``
    map exposed for knowledge distillation
    (ref point_pillar_disconet.py:19-100)."""

    @classmethod
    def from_config(cls, args: dict):
        args = dict(args)
        args.setdefault("fusion_method", "disconet")
        return cls(args=args)

    def __call__(self, batch, train: bool = False):
        bev, affine, bn_mask, (b, l) = self._encode_agents(batch, train)
        x = self.backbone(bev, train=train, mask=bn_mask)
        if self.shrink is not None:
            x = self.shrink(x, train=train)
        if self.compressor is not None:
            x = self.compressor(x, train=train, mask=bn_mask)
        h, w, c = x.shape[1:]
        fused = self.fusion(x.reshape(b, l, h, w, c), affine,
                            batch["agent_mask"], train=train)
        out = self.heads(fused)
        out["feature"] = fused
        return out


@register_model("point_pillar_disconet_teacher")
class PointPillarDiscoNetTeacher(_PillarBase):
    """Early-fusion teacher: runs on the merged ego-frame cloud
    (``teacher_points``) and exposes ``teacher_feature``
    (ref point_pillar_disconet_teacher.py:15-75)."""

    def setup(self):
        self.encoder = self._make_encoder()
        self.backbone = _backbone_from_config(self.args["base_bev_backbone"])
        self.shrink = (DownsampleConv.from_config(self.args["shrink_header"])
                       if "shrink_header" in self.args else None)
        self.heads = self._make_heads()

    def __call__(self, batch, train: bool = False):
        points = batch.get("teacher_points", batch["points"])
        mask = batch.get("teacher_point_mask", batch["point_mask"])
        if points.ndim == 4:  # (B, 1, N, 4) merged virtual agent
            points = points.reshape((-1,) + points.shape[2:])
            mask = mask.reshape((-1,) + mask.shape[2:])
        bev = self.encoder(points, mask, train=train)
        x = self.backbone(bev, train=train)
        if self.shrink is not None:
            x = self.shrink(x, train=train)
        out = {"teacher_feature": x}
        for k, v in self.heads(x).items():
            out["teacher_" + k] = v
        return out


@register_model("point_pillar_uncertainty")
class PointPillarUncertainty(PointPillar):
    """Single-agent PointPillars with a log-variance head — the CoAlign
    stage-1 detector feeding the pose graph
    (ref opencood/models/point_pillar_uncertainty.py:15)."""

    @classmethod
    def from_config(cls, args: dict):
        args = dict(args)
        args.setdefault("uncertainty_dim", 3)
        return cls(args=args)

"""FPV-RCNN / FVoxelRCNN: two-stage keypoint-fusion detectors.

TPU-first rework of ref opencood/models/fpvrcnn.py:18-90 / fvoxelrcnn.py:17:
  stage 1: per-agent dense-voxel backbone + SSFA + CIA-SSD head (reused
           from models/second_family.py), decoded per agent ON DEVICE.
  matcher: per-agent boxes projected to ego, clustered + score-fused
           (models/matcher.py, replacing matcher.py's python loops).
  stage 2: instead of VSA ball-query CUDA keypoint features (vsa.py:45,
           pcdet_utils/pointnet2), each fused RoI reads a fixed rotated
           grid of bilinear samples from the agents' ego-warped BEV feature
           maps (ops/roi.py) and a shared MLP regresses the refinement +
           an IoU confidence (roi_head.py:13 / voxel_rcnn_head.py).

The keypoint machinery the reference uses (FPS sampling, point-in-box
pooling) exists as reusable ops (ops/roi.py farthest_point_sample,
points_in_rotated_boxes) for parity.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.models import register_model
from coalign_tpu.models.matcher import match_and_fuse
from coalign_tpu.models.second_family import _VoxelBase
from coalign_tpu.models.heads import DetectionHeads
from coalign_tpu.models.voxel_backbone import SSFA
from coalign_tpu.ops.roi import roi_grid_pool
from coalign_tpu.ops.warp import warp_agents_to_ego
from coalign_tpu.postprocess.anchors import generate_anchor_box
from coalign_tpu.postprocess.decode import post_process_frame
from coalign_tpu.utils.transforms import normalize_pairwise_tfm


class RoIHead(nn.Module):
    """Shared-MLP RoI refinement head (ref roi_head.py:13)."""

    hidden: int = 256

    @nn.compact
    def __call__(self, roi_feats, boxes):
        """roi_feats (R, G, C); boxes (R, 7). Returns (cls (R,), reg (R, 7))."""
        r, g, c = roi_feats.shape
        x = roi_feats.reshape(r, g * c)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        cls = nn.Dense(1)(x)[:, 0]
        reg = nn.Dense(7, kernel_init=nn.initializers.zeros)(x)
        return cls, reg


@register_model("fpvrcnn")
class FpvRcnn(_VoxelBase):
    """Two-stage collaborative detector (ref fpvrcnn.py:18-90)."""

    args: Dict[str, Any]

    def _anchors(self):
        aa = dict(self.args["anchor_args"])
        # derive grid geometry when the yaml parser hasn't filled it
        aa.setdefault("vw", self.args["voxel_size"][0])
        aa.setdefault("vh", self.args["voxel_size"][1])
        aa.setdefault("W", self.spec.nx)
        aa.setdefault("H", self.spec.ny)
        return jnp.asarray(generate_anchor_box(aa, self.args.get(
            "order", "hwl")))

    @nn.compact
    def __call__(self, batch, train: bool = False):
        b, l = batch["agent_mask"].shape
        feat = self._bev_features(batch, train)          # (B*L, H/8, W/8, C)
        feat = SSFA(feature_num=self.args.get("ssfa", {}).get(
            "feature_num", 128))(feat, train=train)
        stage1 = DetectionHeads(
            anchor_number=self.args["anchor_number"], use_iou=True,
            use_dir="dir_args" in self.args,
            num_bins=self.args.get("dir_args", {}).get("num_bins", 2),
        )(feat)

        anchors = self._anchors()
        post = self.args.get("stage1_postprocess", {})
        score_thr = post.get("score_threshold", 0.2)
        nms_thr = post.get("nms_thresh", 0.15)
        max_boxes = post.get("max_boxes", 32)
        gt_range = tuple(self.args["lidar_range"])

        # decode per agent, project to ego via the pairwise transform
        tfm = batch["pairwise_t_matrix"][:, :, 0]        # T_ego<-j (B, L)
        dir_preds = stage1.get("dir_preds")
        if dir_preds is None:
            dir_preds = jnp.zeros(stage1["cls_preds"].shape[:-1] + (
                stage1["cls_preds"].shape[-1] * 2,))

        def per_agent(cls_p, reg_p, dir_p, t):
            return post_process_frame(
                cls_p, reg_p, anchors, t, dir_preds=dir_p,
                score_threshold=score_thr, nms_threshold=nms_thr,
                gt_range=gt_range, prefilter_k=256, max_keep=max_boxes)

        dets = jax.vmap(per_agent)(
            stage1["cls_preds"], stage1["reg_preds"], dir_preds,
            tfm.reshape(b * l, 4, 4).astype(feat.dtype))
        # proposals are stage-2 INPUTS, not differentiable outputs: the
        # reference decodes them under no_grad (fpvrcnn.py:60-74), and
        # differentiating through decode+NMS box geometry produces NaN
        # grads on degenerate/padded boxes (sqrt/atan at 0)
        dets = jax.lax.stop_gradient(dets)

        k = max_boxes
        boxes = dets["boxes7"].reshape(b, l * k, 7)
        scores = dets["scores"].reshape(b, l * k)
        valid = (dets["mask"].reshape(b, l, k)
                 & batch["agent_mask"][:, :, None]).reshape(b, l * k)

        fused = jax.vmap(lambda bx, sc, vm: match_and_fuse(
            bx, sc, vm, self.args.get("matcher_iou", 0.1),
            self.args.get("max_rois", 32),
            version=self.args.get("matcher_version", "ref"),
            gt_range=self.args.get("lidar_range")))(boxes, scores, valid)

        grid_size = self.args.get("roi_grid_size", 6)
        roi_head = RoIHead(hidden=self.args.get("roi_hidden", 256))
        g = grid_size * grid_size

        if "vsa" in self.args:
            # stage 2, keypoint path (ref vsa.py:45 + roi_head.py): each
            # agent FPS-samples keypoints from its raw cloud, features them
            # from its own BEV map + ball-query grouping over its points
            # (the num_out_features-dim CPM it transmits), the ego merges
            # all agents' keypoints and every fused RoI ball-queries the
            # merged set through a rotated grid.
            from coalign_tpu.models.vsa import VoxelSetAbstraction
            from coalign_tpu.ops.pointnet2 import SAModuleMSG
            from coalign_tpu.ops.roi import (points_in_rotated_boxes,
                                             roi_grid_points)
            from coalign_tpu.utils.transforms import project_points

            vsa_cfg = self.args["vsa"]
            vsa = VoxelSetAbstraction(
                cfg=vsa_cfg, lidar_range=tuple(self.args["lidar_range"]),
                voxel_size=tuple(self.args["voxel_size"]), bev_stride=8)
            pts = batch["points"].reshape((b * l,) + batch["points"].shape[2:])
            pmask = batch["point_mask"].reshape(b * l, -1)
            kp_xyz, kp_feat, kp_mask = vsa(pts, pmask, bev_feat=feat,
                                           train=train)
            # project keypoints to ego (the CPM crossing the channel)
            nk = kp_xyz.shape[1]
            kp_ego = jax.vmap(project_points)(
                kp_xyz, tfm.reshape(b * l, 4, 4).astype(jnp.float32))
            kp_ego = kp_ego.reshape(b, l * nk, 3)
            kp_feat = kp_feat.reshape(b, l * nk, kp_feat.shape[-1])
            kp_mask = (kp_mask.reshape(b, l, nk)
                       & batch["agent_mask"][:, :, None]).reshape(b, l * nk)
            # keep keypoints inside (enlarged) stage-1 fused boxes
            # (ref vsa.py:165-201 kpt_mask2 via points_in_boxes_gpu)
            if vsa_cfg.get("enlarge_selection_boxes", True):
                sel = fused["boxes"].at[..., 3:6].add(0.5)
            else:
                sel = fused["boxes"]

            def in_any_box(kxyz, boxes7, bmask):
                inb = points_in_rotated_boxes(kxyz, boxes7)  # (R, N)
                return (inb & bmask[:, None]).any(axis=0)

            kp_mask = kp_mask & jax.vmap(in_any_box)(
                kp_ego, sel, fused["mask"])

            # RoI grid points ball-query the merged keypoint set
            rg = self.args.get("roi_head", {}).get("roi_grid_pool", {})
            grid_size = int(rg.get("grid_size", grid_size))
            g = grid_size * grid_size
            grid_xy = jax.vmap(lambda bx: roi_grid_points(bx, grid_size))(
                fused["boxes"])                       # (B, R, G, 2)
            r = grid_xy.shape[1]
            grid_z = jnp.broadcast_to(
                fused["boxes"][..., None, 2:3], (b, r, g, 1))
            new_xyz = jnp.concatenate([grid_xy, grid_z], -1) \
                .reshape(b, r * g, 3)
            new_mask = jnp.broadcast_to(
                fused["mask"][..., None], (b, r, g)).reshape(b, r * g)
            sa2 = SAModuleMSG(
                radii=tuple(rg.get("pool_radius", (0.8, 1.6))),
                nsamples=tuple(rg.get("n_sample", (16, 16))),
                mlps=tuple(tuple(m) for m in rg.get("mlps",
                                                    ((64, 64), (64, 64)))))
            pooled = sa2(new_xyz, new_mask, kp_ego, kp_mask,
                         feats=kp_feat, train=train)  # (B, R*G, C2)
            c = pooled.shape[-1]
            pooled = pooled.reshape(b, r, g, c)
        else:
            # stage 2, BEV path: pool RoI grids from ego-warped per-agent
            # feature maps (the measured-equal TPU alternative,
            # docs/PARITY.md VSA ablation)
            h, w, c = feat.shape[1:]
            affine = normalize_pairwise_tfm(
                batch["pairwise_t_matrix"].astype(feat.dtype),
                self.spec.ny // 8, self.spec.nx // 8,
                self.args["voxel_size"][0] * 8)
            warped = warp_agents_to_ego(feat.reshape(b, l, h, w, c),
                                        affine[:, 0], batch["agent_mask"])
            ego_feat = warped.max(axis=1)                # (B, H, W, C)

            def per_frame(f, boxes7):
                return roi_grid_pool(f, boxes7, self.args["lidar_range"],
                                     self.args["voxel_size"], 8, grid_size)

            pooled = jax.vmap(per_frame)(ego_feat, fused["boxes"])
            r = pooled.shape[1]

        cls, reg = roi_head(pooled.reshape(b * r, g, c),
                            fused["boxes"].reshape(b * r, 7))
        cls = cls.reshape(b, r)
        reg = reg.reshape(b, r, 7)

        # refinement: dx,dy,dz scaled by box diag; dh,dw,dl log-residual;
        # dyaw additive — standard RoI residual coding
        rois = fused["boxes"]
        diag = jnp.sqrt(rois[..., 4] ** 2 + rois[..., 5] ** 2 + 1e-6)
        refined = jnp.concatenate([
            rois[..., 0:2] + reg[..., 0:2] * diag[..., None],
            rois[..., 2:3] + reg[..., 2:3] * rois[..., 3:4],
            rois[..., 3:6] * jnp.exp(jnp.clip(reg[..., 3:6], -2, 2)),
            rois[..., 6:7] + reg[..., 6:7],
        ], axis=-1)

        out = {k_ + "_single": v for k_, v in stage1.items()}
        out.update({
            "stage1_boxes": boxes, "stage1_scores": scores,
            "stage1_valid": valid,
            "rois": rois, "roi_mask": fused["mask"],
            "roi_scores": fused["scores"],
            "roi_cls": cls, "roi_reg": reg,
            "boxes_refined": refined,
            "scores_refined": jax.nn.sigmoid(cls) * fused["mask"],
        })
        return out


@register_model("fvoxelrcnn")
class FVoxelRcnn(FpvRcnn):
    """Voxel-RCNN-headed variant (ref fvoxelrcnn.py:17) — same TPU stage-2
    design; the reference differs only in the CUDA pooling backend."""

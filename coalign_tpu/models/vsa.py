"""Voxel-set-abstraction keypoint features (FPV-RCNN stage 2).

TPU-first rework of ref opencood/models/sub_modules/vsa.py:45
VoxelSetAbstraction: FPS keypoints from the raw cloud, per-keypoint
features from (a) bilinear BEV reads and (b) multi-scale ball-query
grouping over the raw points (ops/pointnet2.py replacing the CUDA
pointnet2 stack), fused through a Linear+BN+ReLU bottleneck to the
``num_out_features``-dim CPM the agents transmit.

Differences from the reference, by TPU design:
  * fixed shapes: always ``num_keypoints`` keypoints per frame, carried
    with a mask instead of the reference's variable-length index games
    (vsa.py:120-165 get_sampled_points);
  * the sparse-conv scale sources (x_conv1..4) are BEV reads at the
    matching strides of the dense masked-conv backbone, not sparse-tensor
    neighborhoods — same receptive information, gather instead of CUDA
    hash lookups.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from coalign_tpu.models.layers import MaskedBatchNorm
from coalign_tpu.ops.pointnet2 import SAModuleMSG
from coalign_tpu.ops.roi import farthest_point_sample, sample_bev_features


class VoxelSetAbstraction(nn.Module):
    """Per-frame keypoint sampler + feature extractor.

    cfg keys (ref fpvrcnn.yaml vsa block): num_keypoints,
    num_out_features, sa_layer.raw_points {mlps, pool_radius, n_sample}.
    """

    cfg: Dict[str, Any]
    lidar_range: tuple
    voxel_size: tuple
    bev_stride: int = 8

    @nn.compact
    def __call__(self, points, pt_mask, bev_feat=None, train: bool = False):
        """points (F, N, 4); pt_mask (F, N); bev_feat (F, H, W, C)|None.
        Returns (kp_xyz (F, K, 3), kp_feat (F, K, Fo), kp_mask (F, K))."""
        k = int(self.cfg["num_keypoints"])
        xyz = points[..., :3].astype(jnp.float32)
        idx = jax.vmap(lambda p, m: farthest_point_sample(p, m, k))(
            xyz, pt_mask)
        kp_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        kp_mask = jnp.take_along_axis(pt_mask, idx, axis=1)
        # z-band filter (ref vsa.py:186 kpt_mask1: z in (-2.8, 1.0) for the
        # (-3, 1) range) — relative to the configured range here
        lo = self.lidar_range[2] + 0.2
        hi = self.lidar_range[5]
        kp_mask = kp_mask & (kp_xyz[..., 2] > lo) & (kp_xyz[..., 2] < hi)

        feats = []
        if bev_feat is not None:
            feats.append(jax.vmap(
                lambda f, p: sample_bev_features(
                    f.astype(jnp.float32), p, self.lidar_range,
                    self.voxel_size, self.bev_stride))(bev_feat,
                                                       kp_xyz[..., :2]))
        raw_cfg = self.cfg.get("sa_layer", {}).get("raw_points", {})
        if raw_cfg:
            sa = SAModuleMSG(radii=tuple(raw_cfg["pool_radius"]),
                             nsamples=tuple(raw_cfg["n_sample"]),
                             mlps=tuple(tuple(m) for m in raw_cfg["mlps"]))
            feats.append(sa(kp_xyz, kp_mask, xyz, pt_mask,
                            feats=points[..., 3:].astype(jnp.float32),
                            train=train))
        x = jnp.concatenate(feats, axis=-1)
        # vsa_point_feature_fusion (ref vsa.py:97-101)
        x = nn.Dense(int(self.cfg["num_out_features"]), use_bias=False)(x)
        x = MaskedBatchNorm()(x, mask=kp_mask, train=train)
        x = nn.relu(x) * kp_mask[..., None]
        return kp_xyz, x, kp_mask

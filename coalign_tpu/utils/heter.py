"""Heterogeneous-modality agent assignment + per-CAV eval box helpers.

TPU-first rework of ref opencood/utils/heter_utils.py:10 (AgentSelector):
deterministically assigns each agent a sensing modality (lidar / camera)
per the configured ego modality + assignment ratio, seeded for
reproducibility across train/eval runs. Also the heterogeneous eval-output
helpers (ref opencood/tools/inference_utils.py:200-302): marker boxes at
each collaborating agent's position, injected into the pred/gt sets so
camera-only agents are counted in AP even when they emit no detections.
"""

from __future__ import annotations

import numpy as np


class AgentSelector:
    def __init__(self, lidar_ratio: float = 0.5,
                 ego_modality: str = "lidar", seed: int = 303):
        self.lidar_ratio = lidar_ratio
        self.ego_modality = ego_modality
        self.rng = np.random.default_rng(seed)

    def select(self, num_agents: int):
        """Returns a list of 'lidar' / 'camera' per agent, ego first."""
        mods = ["lidar" if self.rng.random() < self.lidar_ratio
                else "camera" for _ in range(num_agents)]
        if num_agents:
            mods[0] = self.ego_modality
        return mods


def _marker_corners(extent, z_offset=-1.2):
    """(1, 8, 3) axis-aligned marker box at the agent origin (ref
    inference_utils.py create_bbx usage: half-extents, z lowered 1.2 m)."""
    ex, ey, ez = extent
    corners = np.array(
        [[ex, -ey, -ez], [ex, ey, -ez], [-ex, ey, -ez], [-ex, -ey, -ez],
         [ex, -ey, ez], [ex, ey, ez], [-ex, ey, ez], [-ex, -ey, ez]],
        dtype=np.float32)
    corners[:, 2] += z_offset
    return corners[None]


def _relative_transforms(lidar_pose, agent_mask):
    """T_ego<-cav for each live agent: (N, 4, 4) numpy."""
    from coalign_tpu.utils.transforms import (inverse_tfm, pose_to_tfm)

    live = np.flatnonzero(np.asarray(agent_mask))
    poses = np.asarray(lidar_pose)[live]
    t_we = np.asarray(pose_to_tfm(poses[0]))          # world <- ego
    t_ew = np.asarray(inverse_tfm(t_we))              # ego <- world
    return np.stack([t_ew @ np.asarray(pose_to_tfm(p)) for p in poses])


def get_cav_box(lidar_pose, agent_mask, modalities=None):
    """Per-CAV marker boxes in the ego frame + lidar-agent record (ref
    inference_utils.py:266 get_cav_box).

    lidar_pose: (L, 6) per-agent world poses; agent_mask: (L,) validity.
    modalities: optional list from AgentSelector.select; default all-lidar.
    Returns (cav_box (N, 8, 3) f32, lidar_agent_record (N,) int).
    """
    from coalign_tpu.utils.box_utils import project_box3d

    rel = _relative_transforms(lidar_pose, agent_mask)
    marker = _marker_corners([0.2, 0.2, 0.2])
    boxes = [marker[0]] + [np.asarray(project_box3d(marker, rel[i]))[0]
                           for i in range(1, len(rel))]
    n = len(boxes)
    record = np.ones(n, dtype=np.int64) if modalities is None else np.array(
        [1 if m == "lidar" else 0 for m in modalities[:n]], dtype=np.int64)
    return np.stack(boxes).astype(np.float32), record


def fix_cavs_box(pred_corners, pred_scores, gt_corners, lidar_pose,
                 agent_mask):
    """Inject car-sized marker boxes at every live agent position into
    BOTH the prediction and gt corner sets (score 1.0 / gt), then NMS-dedup
    at IoU 0.01 (ref inference_utils.py:200 fix_cavs_box — used by the
    heterogeneous camera eval where agents themselves must count).

    All numpy; corner sets are (N, 8, 3) in the ego frame.
    Returns (pred_corners, pred_scores, gt_corners, num_cavs).
    """
    from coalign_tpu.utils.box_utils import project_box3d
    from coalign_tpu.utils.iou import rotated_iou_corners

    rel = _relative_transforms(lidar_pose, agent_mask)
    marker = _marker_corners([2.45, 1.06, 0.75])
    cav = np.concatenate(
        [marker] + [np.asarray(project_box3d(marker, rel[i]))
                    for i in range(1, len(rel))], axis=0).astype(np.float32)
    n = cav.shape[0]

    def nms_dedup(corners, scores):
        iou = np.asarray(rotated_iou_corners(
            corners[:, :4, :2], corners[:, :4, :2], xp=np))
        order = np.argsort(-scores, kind="stable")
        keep = []
        for i in order:
            if all(iou[i, j] <= 0.01 for j in keep):
                keep.append(i)
        keep = np.array(sorted(keep), dtype=np.int64)
        return corners[keep], scores[keep]

    pred = np.concatenate([cav, np.asarray(pred_corners)], axis=0)
    ps = np.concatenate([np.ones(n, np.float32), np.asarray(pred_scores)])
    pred, ps = nms_dedup(pred, ps)
    gt = np.concatenate([cav, np.asarray(gt_corners)], axis=0)
    gs = np.concatenate([np.ones(n, np.float32),
                         np.full(len(gt_corners), 0.5, np.float32)])
    gt, _ = nms_dedup(gt, gs)
    return pred, ps, gt, n

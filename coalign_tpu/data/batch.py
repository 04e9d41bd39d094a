"""Batch assembly: frames -> padded fixed-shape device tensors.

TPU-first rework of the reference's intermediate-fusion dataset + collate
(ref opencood/data_utils/datasets/intermediate_fusion_dataset.py:236-575):
instead of flattening a variable agent dim with record_len, agents are
padded to ``L = max_cav`` with ``agent_mask``; voxelization happens on
device (models/pillar_encoder.py), so the host side only masks/pads raw
points. Labels are generated on device from the padded gt boxes
(postprocess/anchors.assign_targets) rather than in dataloader workers.

Batch contract (Appendix A of SURVEY.md, padded form):
  points            (B, L, N, 4)       lidar in each agent's own frame
  point_mask        (B, L, N) bool
  agent_mask        (B, L)    bool     slot 0 = ego
  pairwise_t_matrix (B, L, L, 4, 4)    from NOISY poses (what the model sees)
  lidar_pose        (B, L, 6)          noisy; lidar_pose_clean (B, L, 6)
  gt_boxes          (B, M, 7) hwl      ego-frame fused gt (CLEAN poses)
  gt_mask           (B, M)   bool
  transformation_matrix (B, 4, 4)      identity for intermediate fusion
"""

from __future__ import annotations

import numpy as np

from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils.transforms import (
    get_pairwise_transformation, inverse_tfm, pose_to_tfm, project_points)

try:  # C++ data plane (coalign_tpu/native); numpy fallback below
    from coalign_tpu import native as _native
    if not _native.available():
        _native = None
except Exception:  # pragma: no cover
    _native = None


class IntermediateFusionBatcher:
    """Assemble intermediate-fusion batches from base frames."""

    def __init__(self, max_cav=5, max_points=30000, max_objects=100,
                 lidar_range=(-140.8, -40, -3, 140.8, 40, 1),
                 comm_range=70.0, pos_std=0.0, rot_std=0.0, seed=303,
                 augmentor=None, train=False, laplace=False):
        self.train = train
        self.max_cav = max_cav
        self.max_points = max_points
        self.max_objects = max_objects
        self.lidar_range = lidar_range
        self.comm_range = comm_range
        self.pos_std = pos_std
        self.rot_std = rot_std
        self.laplace = laplace  # ref pose_utils.py:19 'laplace' arg key
        self.rng = np.random.default_rng(seed)
        self.augmentor = augmentor  # data/augment.WorldAugmentor or None

    def _noise(self):
        if self.pos_std == 0 and self.rot_std == 0:
            return np.zeros(6, dtype=np.float32)
        draw = self.rng.laplace if self.laplace else self.rng.normal
        n = np.zeros(6, dtype=np.float32)
        n[:2] = draw(0, self.pos_std, 2)
        n[4] = draw(0, self.rot_std)
        return n

    def assemble(self, frames: list) -> dict:
        """frames: list of base-data frames (see data/synthetic.py)."""
        b, l, n, m = (len(frames), self.max_cav, self.max_points,
                      self.max_objects)
        points = np.zeros((b, l, n, 4), dtype=np.float32)
        point_mask = np.zeros((b, l, n), dtype=bool)
        agent_mask = np.zeros((b, l), dtype=bool)
        poses_clean = np.zeros((b, l, 6), dtype=np.float32)
        poses_noisy = np.zeros((b, l, 6), dtype=np.float32)
        gt_boxes = np.zeros((b, m, 7), dtype=np.float32)
        gt_mask = np.zeros((b, m), dtype=bool)

        for bi, frame in enumerate(frames):
            if self.augmentor is not None:
                frame = self.augmentor(frame)
            agents = frame["agents"]
            ego_pose = agents[0]["pose"]
            # comm-range filter wrt ego (ref intermediate_fusion_dataset.py:277)
            kept = [agents[0]]
            for ag in agents[1:]:
                d = np.linalg.norm(ag["pose"][:2] - ego_pose[:2])
                if d <= self.comm_range:
                    kept.append(ag)
            kept = kept[:l]

            for ai, ag in enumerate(kept):
                pts = ag["points"]
                if _native is not None:
                    # C++ fast path: range-mask + subsample + pad in one call
                    points[bi, ai], point_mask[bi, ai] = \
                        _native.mask_pad_points(pts, self.lidar_range, n)
                else:
                    inr = np.asarray(
                        B.mask_points_by_range(pts, self.lidar_range))
                    pts = pts[inr]
                    if len(pts) > n:
                        sel = self.rng.choice(len(pts), n, replace=False)
                        pts = pts[sel]
                    points[bi, ai, :len(pts)] = pts
                    point_mask[bi, ai, :len(pts)] = True
                agent_mask[bi, ai] = True
                poses_clean[bi, ai] = ag["pose"]
                poses_noisy[bi, ai] = ag["pose"] + self._noise()

            # fused gt in ego frame from CLEAN poses, world objects
            boxes_w = frame["objects"]["boxes"]
            t_we = np.asarray(pose_to_tfm(ego_pose))
            t_ew = np.asarray(inverse_tfm(t_we))
            corners_w = np.asarray(B.boxes_to_corners_3d(boxes_w, "hwl"))
            corners_e = np.asarray(B.project_box3d(corners_w, t_ew))
            boxes_e = np.asarray(B.corner_to_center(corners_e, "hwl"))
            keep = np.asarray(
                B.mask_corners_outside_range(corners_e, self.lidar_range))
            boxes_e = boxes_e[keep][:m]
            gt_boxes[bi, :len(boxes_e)] = boxes_e
            gt_mask[bi, :len(boxes_e)] = True

        pair = np.asarray(get_pairwise_transformation(
            poses_noisy, agent_mask), dtype=np.float32)
        return {
            "points": points,
            "point_mask": point_mask,
            "agent_mask": agent_mask,
            "pairwise_t_matrix": pair,
            "lidar_pose": poses_noisy,
            "lidar_pose_clean": poses_clean,
            "gt_boxes": gt_boxes,
            "gt_mask": gt_mask,
            "transformation_matrix": np.tile(np.eye(4, dtype=np.float32),
                                             (b, 1, 1)),
        }

    def batches(self, dataset, batch_size, shuffle=True, drop_last=True):
        idx = np.arange(len(dataset))
        if shuffle:
            self.rng.shuffle(idx)
        for start in range(0, len(idx), batch_size):
            chunk = idx[start:start + batch_size]
            if drop_last and len(chunk) < batch_size:
                return
            frames = [dataset[i] for i in chunk]
            # train-mode batchers may build different batches (the late
            # batcher trains on ONE random cav per frame,
            # ref late_fusion_dataset.py:52-69)
            if self.train and hasattr(self, "assemble_train"):
                yield self.assemble_train(frames)
            else:
                yield self.assemble(frames)


class EarlyFusionBatcher(IntermediateFusionBatcher):
    """Early ("2-round") fusion: every agent's raw point cloud is projected
    into the ego frame and stacked into ONE virtual agent, then the
    single-agent model runs on the merged cloud
    (ref early_fusion_dataset.py:40-140).

    Points are projected with the NOISY poses (that is the whole point of
    the robustness benchmark); gt comes from clean poses as usual.
    """

    def _merge_points(self, inter: dict):
        """Project every agent's cloud into the ego frame with the NOISY
        pairwise transforms and flatten agents -> (B, 1, L*N, 4)."""
        b, l, n, _ = inter["points"].shape
        points = inter["points"].reshape(b, l * n, 4).copy()
        mask = inter["point_mask"].reshape(b, l * n).copy()

        # T_ego<-cav from noisy poses = pairwise_t_matrix[cav, 0]
        # (pairwise[i, j] = T_j<-i, transforms.get_pairwise_transformation)
        for bi in range(b):
            for ai in range(1, l):
                if not inter["agent_mask"][bi, ai]:
                    continue
                t = inter["pairwise_t_matrix"][bi, ai, 0]
                seg = slice(ai * n, (ai + 1) * n)
                xyz1 = np.concatenate(
                    [points[bi, seg, :3], np.ones((n, 1), np.float32)], -1)
                points[bi, seg, :3] = (xyz1 @ t.T)[:, :3]
        # re-mask to ego range after projection
        r = self.lidar_range
        inr = ((points[..., 0] >= r[0]) & (points[..., 0] < r[3])
               & (points[..., 1] >= r[1]) & (points[..., 1] < r[4]))
        mask &= inr

        # what actually crosses the channel: valid NON-EGO points after
        # projection (eval-time bandwidth accounting, ref
        # lidar_benchmark.md:9 'Early' row = raw points shipped)
        shipped = mask.reshape(b, l, n)[:, 1:].sum(-1).sum(-1)

        # repack into (B, 1, L*N, 4) — one merged virtual agent
        out = {
            "shipped_points": shipped.astype(np.float32),
            "points": points[:, None],
            "point_mask": mask[:, None],
            "agent_mask": np.ones((b, 1), dtype=bool),
            "pairwise_t_matrix": np.tile(
                np.eye(4, dtype=np.float32), (b, 1, 1, 1, 1)),
            "lidar_pose": inter["lidar_pose"][:, :1],
            "lidar_pose_clean": inter["lidar_pose_clean"][:, :1],
            "gt_boxes": inter["gt_boxes"],
            "gt_mask": inter["gt_mask"],
            "transformation_matrix": inter["transformation_matrix"],
        }
        return out

    def assemble(self, frames: list) -> dict:
        return self._merge_points(super().assemble(frames))


class KDFusionBatcher(EarlyFusionBatcher):
    """Knowledge-distillation batches: per-agent points for the student plus
    the merged ego-frame cloud (``teacher_points``) for the frozen
    early-fusion teacher (ref intermediate_fusion_dataset's
    ``teacher_processed_lidar`` + tools/train_w_kd.py:32-112). Both views
    share ONE noise realization (same pairwise transforms)."""

    def assemble(self, frames: list) -> dict:
        inter = IntermediateFusionBatcher.assemble(self, frames)
        early = self._merge_points(inter)
        inter["teacher_points"] = early["points"]
        inter["teacher_point_mask"] = early["point_mask"]
        return inter


class LateFusionBatcher(IntermediateFusionBatcher):
    """Late fusion: each agent is an independent single-agent detection
    problem (ref late_fusion_dataset.py).

    Train: one random cav per frame, own frame, own-frame gt (ref :52-69).
    Test (``assemble``): all cavs kept with per-agent ``transformation_matrix``
    T_ego<-cav so per-agent boxes are projected to ego before joint NMS
    (ref :72-128); gt stays ego-frame fused.
    """

    def assemble_train(self, frames: list) -> dict:
        picked = []
        for frame in frames:
            agents = frame["agents"]
            ai = int(self.rng.integers(0, len(agents)))
            ag = agents[ai]
            # rebase: the chosen cav becomes ego of a single-agent frame
            picked.append({"agents": [ag], "objects": frame["objects"]})
        out = super().assemble(picked)
        # single-agent training batch: drop the padded agent slots so the
        # model emits exactly one prediction map per sample
        for key in ("points", "point_mask", "agent_mask", "lidar_pose",
                    "lidar_pose_clean"):
            out[key] = out[key][:, :1]
        out["pairwise_t_matrix"] = out["pairwise_t_matrix"][:, :1, :1]
        return out

    def assemble(self, frames: list) -> dict:
        inter = super().assemble(frames)
        b, l = inter["agent_mask"].shape
        # T_ego<-cav per agent from NOISY poses (what late fusion has at
        # test time); identity for ego / padded slots.
        # pairwise[i, j] = T_j<-i, so ego<-cav is [:, cav, 0].
        t = inter["pairwise_t_matrix"][:, :, 0]  # (B, L, 4, 4)
        inter["transformation_matrix"] = t.astype(np.float32)
        return inter

"""CoAlign stage-1: per-agent uncertainty detections + pose correction.

TPU-first rework of the two-pass CoAlign pipeline:
  * ref opencood/tools/pose_graph_pre_calc.py:36 runs a frozen single-agent
    detector with an uncertainty head over the whole dataset and dumps
    ``stage1_boxes.json``; the intermediate dataset later consumes it per
    item (intermediate_fusion_dataset.py:301-328).
  * here the stage-1 model runs ON DEVICE inside the same program: detect
    per agent -> batched pose-graph alignment -> corrected
    pairwise_t_matrix, no json round-trip. A json-compatible dump is still
    provided for offline parity.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.posegraph import BoxAlignConfig, align_poses_batch
from coalign_tpu.postprocess.decode import post_process_frame
from coalign_tpu.utils.transforms import get_pairwise_transformation


def make_stage1_fn(model, anchors, postprocess_cfg: dict, max_boxes=24):
    """Returns jitted (variables, batch) -> per-agent stage-1 detections.

    The stage-1 model is a single-agent detector with an uncertainty head
    (ref point_pillar_uncertainty.py:15); it sees each agent's OWN points
    (no fusion), so its boxes live in each agent's frame — exactly what the
    pose graph needs.

    Output: dict(box_poses (B, L, K, 3) x/y/yaw-rad in agent frame,
    box_mask (B, L, K), uncertainty (B, L, K, 3)).
    """
    score_thr = float(postprocess_cfg["target_args"]["score_threshold"])
    nms_thr = float(postprocess_cfg["nms_thresh"])
    gt_range = tuple(postprocess_cfg["gt_range"])
    dir_args = postprocess_cfg.get("dir_args", {})
    anchors = jnp.asarray(anchors)

    @jax.jit
    def stage1(variables, batch):
        b, l = batch["agent_mask"].shape
        out = model.apply(variables, batch, train=False)  # (B*L, ...) maps

        def per_agent(cls_p, reg_p, dir_p, unc_p):
            det = post_process_frame(
                cls_p, reg_p, anchors, jnp.eye(4), dir_preds=dir_p,
                unc_preds=unc_p, score_threshold=score_thr,
                nms_threshold=nms_thr, gt_range=gt_range,
                max_keep=max_boxes,
                dir_offset=float(dir_args.get("dir_offset", 0.7853)),
                num_bins=int(dir_args.get("num_bins", 2)))
            pose = jnp.stack([det["boxes7"][:, 0], det["boxes7"][:, 1],
                              det["boxes7"][:, 6]], axis=-1)
            return pose, det["mask"], det["uncertainty"]

        dir_preds = out.get("dir_preds")
        if dir_preds is None:
            dir_preds = jnp.zeros(out["cls_preds"].shape[:-1]
                                  + (out["cls_preds"].shape[-1] * 2,))
        poses, masks, uncs = jax.vmap(per_agent)(
            out["cls_preds"], out["reg_preds"], dir_preds, out["unc_preds"])
        k = poses.shape[1]
        return {
            "box_poses": poses.reshape(b, l, k, 3),
            "box_mask": masks.reshape(b, l, k) & batch["agent_mask"][..., None],
            "uncertainty": uncs.reshape(b, l, k, -1),
        }

    return stage1


def correct_batch_poses(batch: dict, stage1_dets: dict,
                        cfg: BoxAlignConfig = BoxAlignConfig()) -> dict:
    """Pose-graph-correct a batch: refined poses -> new pairwise_t_matrix.

    Mirrors the dataset integration (ref intermediate_fusion_dataset.py:
    301-332: rewrite lidar_pose, then recompute pairwise transforms).
    """
    refined = align_poses_batch(
        stage1_dets["box_poses"], stage1_dets["box_mask"],
        stage1_dets["uncertainty"], batch["lidar_pose"],
        batch["agent_mask"], cfg)
    pair = get_pairwise_transformation(refined, batch["agent_mask"])
    out = dict(batch)
    out["lidar_pose"] = refined
    out["pairwise_t_matrix"] = pair.astype(jnp.float32)
    return out


def dump_stage1_json(stage1_dets: dict, frame_ids, path: str):
    """Offline dump compatible in spirit with stage1_boxes.json
    (ref pose_graph_pre_calc.py:136-150)."""
    out = {}
    poses = np.asarray(stage1_dets["box_poses"])
    masks = np.asarray(stage1_dets["box_mask"])
    uncs = np.asarray(stage1_dets["uncertainty"])
    for i, fid in enumerate(frame_ids):
        agents = []
        for a in range(poses.shape[1]):
            keep = masks[i, a]
            agents.append({
                "box_poses": poses[i, a][keep].tolist(),
                "uncertainty": uncs[i, a][keep].tolist(),
            })
        out[str(fid)] = agents
    with open(path, "w") as f:
        json.dump(out, f)


def load_stage1_json(path: str):
    """Load a ``stage1_boxes.json`` dump back into per-frame content
    (the offline path: ref intermediate_fusion_dataset.py:301-328 reads the
    precalc json per item before computing pairwise transforms)."""
    with open(path) as f:
        return json.load(f)


def stage1_content_to_arrays(content, frame_ids, max_cav: int,
                             max_boxes: int = 24):
    """Per-frame json content -> padded (B, L, K, ...) stage-1 det arrays
    accepted by :func:`correct_batch_poses`."""
    b = len(frame_ids)
    poses = np.zeros((b, max_cav, max_boxes, 3), np.float32)
    masks = np.zeros((b, max_cav, max_boxes), bool)
    uncs = np.zeros((b, max_cav, max_boxes, 3), np.float32)
    for i, fid in enumerate(frame_ids):
        agents = content.get(str(fid), [])
        for a, rec in enumerate(agents[:max_cav]):
            bp = np.asarray(rec.get("box_poses", []), np.float32)
            un = np.asarray(rec.get("uncertainty", []), np.float32)
            k = min(len(bp), max_boxes)
            if k:
                poses[i, a, :k] = bp[:k]
                masks[i, a, :k] = True
                if un.size:
                    uncs[i, a, :k] = un.reshape(len(un), -1)[:k, :3]
    return {"box_poses": jnp.asarray(poses), "box_mask": jnp.asarray(masks),
            "uncertainty": jnp.asarray(uncs)}


def correct_batch_poses_from_json(batch: dict, content, frame_ids,
                                  cfg: BoxAlignConfig = BoxAlignConfig(),
                                  max_boxes: int = 24) -> dict:
    """Offline CoAlign pass 2: pose-graph-correct a batch from a precalc
    json (tools/run.py precalc), keyed by dataset frame index."""
    max_cav = int(batch["agent_mask"].shape[1])
    dets = stage1_content_to_arrays(content, frame_ids, max_cav, max_boxes)
    return correct_batch_poses(batch, dets, cfg)

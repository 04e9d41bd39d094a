"""Pose-graph correction quality evaluation.

TPU-first rework of ref opencood/tools/pose_graph_evaluate.py:129
(evaluate_pose_graph): measures how much the agent-object pose-graph
optimization reduces relative pose error — translation (m) and rotation
(deg) errors of every non-ego agent wrt ego, before vs after correction —
and reports summary stats + CDF samples.
"""

from __future__ import annotations

import numpy as np


def relative_pose_errors(poses, poses_clean, agent_mask):
    """Per-agent relative (to ego) pose errors.

    poses, poses_clean: (B, L, 6) [x, y, z, roll, yaw, pitch] degrees.
    Returns (trans_err (K,), rot_err_deg (K,)) over valid non-ego agents.
    """
    rel = poses[:, :, :2] - poses[:, :1, :2]
    rel_c = poses_clean[:, :, :2] - poses_clean[:, :1, :2]
    terr = np.linalg.norm(rel - rel_c, axis=-1)
    yaw = poses[:, :, 4] - poses[:, :1, 4]
    yaw_c = poses_clean[:, :, 4] - poses_clean[:, :1, 4]
    rerr = np.abs((yaw - yaw_c + 180.0) % 360.0 - 180.0)
    m = np.asarray(agent_mask, dtype=bool).copy()
    m[:, 0] = False  # ego is the reference
    return terr[m], rerr[m]


def summarize(trans_err, rot_err, cdf_points=(0.5, 0.9, 0.95)):
    out = {
        "trans_mean": float(np.mean(trans_err)) if len(trans_err) else 0.0,
        "rot_mean": float(np.mean(rot_err)) if len(rot_err) else 0.0,
    }
    for q in cdf_points:
        out[f"trans_p{int(q * 100)}"] = (
            float(np.quantile(trans_err, q)) if len(trans_err) else 0.0)
        out[f"rot_p{int(q * 100)}"] = (
            float(np.quantile(rot_err, q)) if len(rot_err) else 0.0)
    return out


def evaluate_pose_graph(model, variables, batcher, dataset, anchors,
                        postprocess_cfg, align_cfg=None, batch_size=4,
                        max_frames=None):
    """Run stage-1 + pose-graph over the dataset; report pose-error stats
    before/after correction."""
    import jax.numpy as jnp

    from coalign_tpu.posegraph.box_align import BoxAlignConfig
    from coalign_tpu.tools.stage1 import correct_batch_poses, make_stage1_fn

    align_cfg = align_cfg or BoxAlignConfig()
    stage1 = make_stage1_fn(model, anchors, postprocess_cfg)
    before_t, before_r, after_t, after_r = [], [], [], []
    frames = 0
    for batch in batcher.batches(dataset, batch_size, shuffle=False,
                                 drop_last=False):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        dets = stage1(variables, jb)
        corrected = correct_batch_poses(jb, dets, align_cfg)
        bt, br = relative_pose_errors(
            np.asarray(batch["lidar_pose"]),
            np.asarray(batch["lidar_pose_clean"]), batch["agent_mask"])
        at, ar = relative_pose_errors(
            np.asarray(corrected["lidar_pose"]),
            np.asarray(batch["lidar_pose_clean"]), batch["agent_mask"])
        before_t.append(bt), before_r.append(br)
        after_t.append(at), after_r.append(ar)
        frames += len(batch["agent_mask"])
        if max_frames and frames >= max_frames:
            break
    cat = lambda xs: np.concatenate(xs) if xs else np.zeros(0)
    return {
        "before": summarize(cat(before_t), cat(before_r)),
        "after": summarize(cat(after_t), cat(after_r)),
        "frames": frames,
    }


def main(argv=None):
    """CLI mirroring ref tools/pose_graph_evaluate.py: load a trained
    stage-1 (uncertainty) model_dir, add pose noise, report relative pose
    error CDFs before/after pose-graph correction."""
    import argparse
    import copy
    import json
    import os

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--pos_std", type=float, default=0.4)
    p.add_argument("--rot_std", type=float, default=0.4)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--eval_frames", type=int, default=None)
    p.add_argument("--root_dir", default=None)
    opt = p.parse_args(argv)

    from coalign_tpu.config.yaml_utils import save_yaml
    from coalign_tpu.tools.run import _load_model_dir, postprocess_cfg

    def hook(params):
        params = copy.deepcopy(params)
        params["noise_setting"] = {"add_noise": True,
                                   "args": {"pos_std": opt.pos_std,
                                            "rot_std": opt.rot_std,
                                            "pos_mean": 0, "rot_mean": 0}}
        # the stage-1 detector is trained per-agent (late fusion), but the
        # pose graph needs all agents of a frame together with their noisy
        # poses + pairwise transforms: evaluate on the intermediate batcher
        # (ref pose_graph_evaluate.py builds the intermediate dataset)
        params["fusion"] = dict(params["fusion"],
                                core_method="intermediate")
        return params

    # shared loader: flax orbax runs AND reference torch runs (the
    # uncertainty stage-1 family is checkpoint-importable)
    params, base, batcher, model, spec, state = _load_model_dir(opt, hook)
    res = evaluate_pose_graph(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        batcher, base, getattr(spec, "anchors", spec), postprocess_cfg(params),
        batch_size=opt.batch_size, max_frames=opt.eval_frames)
    print(json.dumps(res))
    save_yaml(res, os.path.join(opt.model_dir, "eval_pose_graph.yaml"))
    return res


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Camera-branch demo: train LiftSplatShoot on the rendered pinhole oracle
(data/synthetic.py render_agent_cameras) and evaluate AP — no dataset or
image download needed.

The oracle renders each gt box into 4 pinhole views with the exact OpenCV
projection; splat size and brightness encode depth, so the model must
recover bearing AND range from images alone to score. Real-image training
uses the same CameraBatcher against an OPV2V checkout.

Runs on whatever accelerator JAX sees (TPU/CPU).

  PYTHONPATH=. python examples/lss_camera_demo.py [--steps 300]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from coalign_tpu.data.camera_batch import CameraBatcher
from coalign_tpu.data.synthetic import SyntheticCameraScenes
from coalign_tpu.inference import evaluate
from coalign_tpu.loss import build_loss
from coalign_tpu.models import build_model
from coalign_tpu.postprocess.anchors import make_anchor_spec
from coalign_tpu.train import (build_optimizer, create_train_state,
                               make_train_step)

LIDAR_RANGE = [-16.0, -16.0, -3.0, 16.0, 16.0, 1.0]
CAM_HW = (64, 96)
GRID = {"xbound": [-16, 16, 0.8], "ybound": [-16, 16, 0.8],
        "zbound": [-10, 10, 20.0], "ddiscr": [2, 26, 24], "mode": "UD"}

MODEL = {
    "core_method": "lift_splat_shoot",
    "args": {"grid_conf": GRID, "data_aug_conf": {"final_dim": CAM_HW},
             "img_features": 32, "anchor_number": 2,
             "bev_out_channels": 64,
             "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                          "anchor_yaw": [0, 90]}},
}
ANCHORS = {"W": 40, "H": 40, "l": 4.2, "w": 1.8, "h": 1.6, "r": [0, 90],
           "vw": 0.8, "vh": 0.8, "feature_stride": 1,
           "cav_lidar_range": LIDAR_RANGE}
POST = {"anchor_args": ANCHORS,
        "target_args": {"pos_threshold": 0.4, "neg_threshold": 0.25,
                        "score_threshold": 0.25},
        "order": "hwl", "max_num": 50, "nms_thresh": 0.15,
        "gt_range": LIDAR_RANGE,
        "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                     "anchor_yaw": [0, 90]}}
LOSS = {"pos_cls_weight": 2.0,
        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
        "reg": {"sigma": 3.0, "weight": 2.0},
        "dir": {"weight": 0.2,
                "args": {"dir_offset": 0.7853, "num_bins": 2,
                         "anchor_yaw": [0, 90]}}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    ds = SyntheticCameraScenes(
        num_frames=args.frames, num_agents=1, num_objects=3,
        lidar_range=LIDAR_RANGE, points_per_object=8, ground_points=8,
        seed=11, cam_hw=CAM_HW, num_cams=4, focal=46.0)
    batcher = CameraBatcher(max_cav=1, num_cams=4, final_dim=CAM_HW,
                            max_objects=8, lidar_range=LIDAR_RANGE)
    batch = {k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict)
                 else jnp.asarray(v))
             for k, v in batcher.assemble(
                 [ds[i] for i in range(args.frames)]).items()}

    model = build_model(MODEL)
    spec = make_anchor_spec(ANCHORS, POST["target_args"], "hwl")
    loss_fn = build_loss(LOSS)
    tx = build_optimizer({"lr": 3e-3, "args": {}}, None)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, spec)

    t0 = time.time()
    for i in range(args.steps):
        state, m = step(state, batch)
        if i % 50 == 0:
            print(f"step {i}: total_loss {float(m['total_loss']):.4f}")
    train_s = time.time() - t0

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    res = evaluate(model, variables, batcher, ds, spec.anchors, POST,
                   batch_size=args.frames)
    print(json.dumps({"ap30": res["ap30"], "ap50": res["ap50"],
                      "frames": res["frames"],
                      "train_seconds": round(train_s, 1),
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()

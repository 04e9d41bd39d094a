#!/usr/bin/env python
"""End-to-end demo: train the CoAlign flagship on the synthetic oracle and
evaluate AP — no dataset download needed.

Runs on whatever accelerator JAX sees (TPU/CPU). ~2 min on a v5e chip.

  PYTHONPATH=. python examples/train_eval_synthetic.py [--steps 60]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
from coalign_tpu.inference import evaluate
from coalign_tpu.loss import build_loss
from coalign_tpu.models import build_model
from coalign_tpu.postprocess.anchors import make_anchor_spec
from coalign_tpu.train import (build_optimizer, create_train_state,
                               make_train_step)

LIDAR_RANGE = [-25.6, -25.6, -3.0, 25.6, 25.6, 1.0]

MODEL = {
    "core_method": "point_pillar_baseline_multiscale",
    "args": {
        "voxel_size": [0.4, 0.4, 4.0], "lidar_range": LIDAR_RANGE,
        "anchor_number": 2,
        "pillar_vfe": {"use_norm": True, "with_distance": False,
                       "use_absolute_xyz": True, "num_filters": [64]},
        "point_pillar_scatter": {"num_features": 64},
        "base_bev_backbone": {"layer_nums": [3, 5, 8],
                              "layer_strides": [2, 2, 2],
                              "num_filters": [64, 128, 256],
                              "upsample_strides": [1, 2, 4],
                              "num_upsample_filter": [128, 128, 128]},
        "fusion_method": "att", "att": {"feat_dim": [64, 128, 256]},
        "shrink_header": {"kernal_size": [3], "stride": [1], "padding": [1],
                          "dim": [256], "input_dim": 384},
        "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                     "anchor_yaw": [0, 90]},
    },
}
ANCHOR_ARGS = {"W": 128, "H": 128, "l": 3.9, "w": 1.6, "h": 1.56,
               "r": [0, 90], "vw": 0.4, "vh": 0.4, "feature_stride": 2,
               "cav_lidar_range": LIDAR_RANGE}
POST = {"target_args": {"score_threshold": 0.20, "pos_threshold": 0.6,
                        "neg_threshold": 0.45},
        "nms_thresh": 0.15, "gt_range": LIDAR_RANGE,
        "dir_args": MODEL["args"]["dir_args"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--frames", type=int, default=8)
    opt = ap.parse_args()

    print("devices:", jax.devices())
    ds = SyntheticScenes(num_frames=opt.frames, num_agents=3, num_objects=6,
                         lidar_range=LIDAR_RANGE, points_per_object=120,
                         ground_points=2048, seed=7)
    batcher = IntermediateFusionBatcher(
        max_cav=3, max_points=8192, max_objects=16, lidar_range=LIDAR_RANGE)
    batch = {k: jnp.asarray(v) for k, v in
             batcher.assemble([ds[i] for i in range(opt.frames)]).items()}

    model = build_model(MODEL)
    spec = make_anchor_spec(ANCHOR_ARGS, POST["target_args"], "hwl")
    loss_fn = build_loss({
        "pos_cls_weight": 2.0,
        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
        "reg": {"sigma": 3.0, "weight": 2.0},
        "dir": {"weight": 0.2, "args": MODEL["args"]["dir_args"]}})
    tx = build_optimizer({"lr": 2e-3, "args": {}}, None)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, spec)

    t0 = time.time()
    for i in range(opt.steps):
        state, metrics = step(state, batch)
        if (i + 1) % 20 == 0:
            print(f"step {i + 1}: loss={float(metrics['total_loss']):.3f} "
                  f"({time.time() - t0:.0f}s)")

    res = evaluate(model,
                   {"params": state.params,
                    "batch_stats": state.batch_stats},
                   batcher, ds, spec.anchors, POST, batch_size=4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""End-to-end throughput benchmark on real TPU hardware.

Measures frames/sec/chip of the full CoAlign pipeline at OPV2V scale
(voxelize -> pillar encode -> multiscale backbone -> warp + attention
fusion -> decode -> rotated NMS), batch of frames with L=5 agents each —
the SURVEY §6 north-star metric. The reference publishes no throughput
numbers (BASELINE.md); ``vs_baseline`` is measured fps divided by
REFERENCE_GPU_FPS, a conservative estimate of the PyTorch reference's
end-to-end eval throughput on a datacenter GPU (its eval loop is
batch-size-1 with CPU shapely NMS, ref inference.py:40-227).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REFERENCE_GPU_FPS = 10.0  # assumed PyTorch-GPU e2e eval fps (see docstring)

# OPV2V PointPillars CoAlign config (ref hypes_yaml/opv2v/lidar_only_with_
# noise/coalign/pointpillar_coalign.yaml)
LIDAR_RANGE = [-140.8, -40.0, -3.0, 140.8, 40.0, 1.0]
VOXEL = [0.4, 0.4, 4.0]
MAX_CAV = 5
POINTS_PER_AGENT = 30000
BATCH = 1

MODEL_ARGS = {
    "voxel_size": VOXEL,
    "lidar_range": LIDAR_RANGE,
    "anchor_number": 2,
    "pillar_vfe": {"use_norm": True, "with_distance": False,
                   "use_absolute_xyz": True, "num_filters": [64]},
    "point_pillar_scatter": {"num_features": 64},
    "base_bev_backbone": {
        "layer_nums": [3, 5, 8],
        "layer_strides": [2, 2, 2],
        "num_filters": [64, 128, 256],
        "upsample_strides": [1, 2, 4],
        "num_upsample_filter": [128, 128, 128],
    },
    "fusion_method": "att",
    "att": {"feat_dim": [64, 128, 256]},
    "shrink_header": {"kernal_size": [3], "stride": [1], "padding": [1],
                      "dim": [256], "input_dim": 384},
    "dir_args": {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]},
}
ANCHOR_ARGS = {
    "W": 704, "H": 200, "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
    "vw": 0.4, "vh": 0.4, "feature_stride": 2,
    "cav_lidar_range": LIDAR_RANGE,
}
POSTPROCESS = {
    "anchor_args": ANCHOR_ARGS,
    "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                    "score_threshold": 0.2},
    "order": "hwl", "max_num": 100, "nms_thresh": 0.15,
    "gt_range": LIDAR_RANGE,
    "dir_args": {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]},
}


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the OPV2V-scale program takes minutes
    # to compile via the remote TPU compiler; cache hits make reruns fast
    try:
        cache_dir = "/root/.cache/jax_comp_cache"
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
    from coalign_tpu.inference import make_infer_fn
    from coalign_tpu.models import build_model
    from coalign_tpu.models.layers import set_compute_dtype
    from coalign_tpu.postprocess.anchors import make_anchor_spec

    # MXU-native conv dtype (params + BN stats + geometry stay f32)
    set_compute_dtype(jnp.bfloat16)

    dataset = SyntheticScenes(
        num_frames=BATCH, num_agents=MAX_CAV, num_objects=20,
        lidar_range=LIDAR_RANGE, points_per_object=400, ground_points=16000,
        agent_spread=30.0, seed=1)
    batcher = IntermediateFusionBatcher(
        max_cav=MAX_CAV, max_points=POINTS_PER_AGENT, max_objects=100,
        lidar_range=LIDAR_RANGE, comm_range=70.0)
    batch = batcher.assemble([dataset[i] for i in range(BATCH)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = build_model({"core_method": "point_pillar_baseline_multiscale",
                         "args": MODEL_ARGS})
    spec = make_anchor_spec(ANCHOR_ARGS, POSTPROCESS["target_args"], "hwl")
    # jit the init: eager init dispatches one remote compile per op on TPU
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch)
    infer = make_infer_fn(model, spec.anchors, POSTPROCESS)

    # compile + warmup
    out = infer(variables, batch)
    jax.block_until_ready(out)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = BATCH * iters / dt

    print(json.dumps({
        "metric": "opv2v_coalign_e2e_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())

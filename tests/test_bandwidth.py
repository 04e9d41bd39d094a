"""Eval-time bandwidth accounting (ref docs/md_files/lidar_benchmark.md:26-28
publishes a per-method transmission-size table; here the numbers surface in
inference.evaluate results)."""

import numpy as np

from conftest import jit_apply, jit_init

from coalign_tpu.utils.bandwidth import (frame_comm_bytes,

                                         intermediate_feature_bytes,
                                         summarize_bandwidth)

MODEL_ARGS = {
    "lidar_range": [-140.8, -40.0, -3.0, 140.8, 40.0, 1.0],
    "voxel_size": [0.4, 0.4, 4.0],
    "base_bev_backbone": {"layer_nums": [3, 5, 8], "layer_strides": [2, 2, 2],
                          "num_filters": [64, 128, 256],
                          "upsample_strides": [1, 2, 4],
                          "num_upsample_filter": [128, 128, 128]},
    "shrink_header": {"dim": [256]},
}


def test_intermediate_single_scale_bytes():
    # 704x200 grid -> fusion input 256ch at 352x100, f32
    want = 256 * 352 * 100 * 4.0
    assert intermediate_feature_bytes(MODEL_ARGS) == want
    # compression divides channel count
    compressed = dict(MODEL_ARGS, compression=4)
    assert intermediate_feature_bytes(compressed) == want / 4


def test_intermediate_multiscale_bytes():
    h, w = 200, 704
    want = (64 * (h // 2) * (w // 2) + 128 * (h // 4) * (w // 4)
            + 256 * (h // 8) * (w // 8)) * 4.0
    assert intermediate_feature_bytes(MODEL_ARGS, multiscale=True) == want


def test_frame_comm_bytes_early_counts_real_points():
    batch = {
        "agent_mask": np.array([[True, True, True]]),
        "point_mask": np.zeros((1, 3, 100), bool),
    }
    batch["point_mask"][0, 1, :30] = True   # 30 shipped points
    batch["point_mask"][0, 2, :20] = True   # 20 shipped points
    batch["point_mask"][0, 0, :99] = True   # ego: not transmitted
    assert frame_comm_bytes("early", batch) == (30 + 20) * 16.0


def test_frame_comm_bytes_late_uses_links():
    batch = {"agent_mask": np.array([[True, True, False]])}
    assert frame_comm_bytes("late", batch, max_num=100) == 1 * 100 * 32.0


def test_comm_rate_scales_intermediate():
    class FakeModel:
        args = MODEL_ARGS
    batch = {"agent_mask": np.array([[True, True]])}
    full = frame_comm_bytes("intermediate", batch, model=FakeModel())
    scaled = frame_comm_bytes("intermediate", batch, model=FakeModel(),
                              comm_rate=0.25)
    assert scaled == full * 0.25


def test_summarize_format():
    out = summarize_bandwidth(2**20 * 10, frames=10)
    assert out["bandwidth_mb_per_frame"] == 1.0
    assert out["bandwidth_log2_mb"] == 0.0
    assert summarize_bandwidth(float("nan"), 10) == {}


def test_evaluate_reports_bandwidth_with_comm_rate():
    """End-to-end: evaluate() on a where2comm model surfaces
    bandwidth_mb_per_frame scaled by the measured comm_rate."""
    import jax
    import jax.numpy as jnp

    from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
    from coalign_tpu.inference import evaluate
    from coalign_tpu.models import build_model
    from coalign_tpu.postprocess.anchors import make_anchor_spec

    lr = [-6.4, -6.4, -3.0, 6.4, 6.4, 1.0]
    args = {
        "voxel_size": [0.4, 0.4, 4], "lidar_range": lr, "anchor_number": 2,
        "pillar_vfe": {"use_norm": True, "with_distance": False,
                       "use_absolute_xyz": True, "num_filters": [16]},
        "point_pillar_scatter": {"num_features": 16},
        "base_bev_backbone": {"layer_nums": [2, 2, 2],
                              "layer_strides": [2, 2, 2],
                              "num_filters": [16, 32, 48],
                              "upsample_strides": [1, 2, 4],
                              "num_upsample_filter": [24, 24, 24]},
        "fusion_method": "att", "att": {"feat_dim": [16, 32, 48]},
        "shrink_header": {"kernal_size": [3], "stride": [1], "padding": [1],
                          "dim": [32], "input_dim": 72},
        "where2comm": {"agg_operator": {"mode": "ATTEN"},
                       "communication": {"thre": 0.01}},
        "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                     "anchor_yaw": [0, 90]},
    }
    model = build_model({"core_method": "point_pillar_where2comm",
                         "args": args})
    ds = SyntheticScenes(num_frames=2, num_agents=2, num_objects=2,
                         lidar_range=lr, points_per_object=32,
                         ground_points=64, seed=11)
    batcher = IntermediateFusionBatcher(max_cav=2, max_points=256,
                                        max_objects=8, lidar_range=lr)
    anchor_args = {"W": 32, "H": 32, "l": 3.9, "w": 1.6, "h": 1.56,
                   "r": [0, 90], "vw": 0.4, "vh": 0.4, "feature_stride": 2,
                   "cav_lidar_range": lr}
    post = {"anchor_args": anchor_args,
            "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                            "score_threshold": 0.2},
            "order": "hwl", "max_num": 16, "nms_thresh": 0.15,
            "gt_range": lr,
            "dir_args": args["dir_args"]}
    spec = make_anchor_spec(anchor_args, post["target_args"], "hwl")
    batch0 = {k: jnp.asarray(v)
              for k, v in batcher.assemble([ds[0]]).items()}
    variables = jit_init(model, jax.random.PRNGKey(0), batch0, train=False)
    res = evaluate(model, variables, batcher, ds, spec.anchors, post,
                   batch_size=1, max_frames=2)
    assert "bandwidth_mb_per_frame" in res, res
    assert res["bandwidth_mb_per_frame"] > 0
    # comm_rate <= 1 bounds it by the full feature transmission
    from coalign_tpu.utils.bandwidth import intermediate_feature_bytes
    full_mb = intermediate_feature_bytes(args) / 2**20
    assert res["bandwidth_mb_per_frame"] <= full_mb + 1e-6

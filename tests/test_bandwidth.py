"""Eval-time bandwidth accounting (ref docs/md_files/lidar_benchmark.md:26-28
publishes a per-method transmission-size table; here the numbers surface in
inference.evaluate results)."""

import numpy as np

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

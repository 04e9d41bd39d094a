"""Auxiliary utils: param surgery, consensus registration, heterogeneity,
subsampling, profiling."""

import jax.numpy as jnp
import numpy as np

from coalign_tpu.utils.consensus import max_consensus_align
from coalign_tpu.utils.heter import AgentSelector
from coalign_tpu.utils.model_utils import (compose_params, count_params,
                                           flatten_params,
                                           rename_param_keys,
                                           unflatten_params)
from coalign_tpu.utils.profiling import StageTimer
from coalign_tpu.utils.subsampling import (mask_ego_points,
                                           random_subsample,
                                           voxel_grid_subsample)


def test_param_surgery_roundtrip():
    params = {"backbone": {"conv1": {"kernel": np.ones((3, 3))}},
              "heads": {"cls": {"bias": np.zeros(2)}}}
    flat = flatten_params(params)
    assert set(flat) == {"backbone/conv1/kernel", "heads/cls/bias"}
    assert unflatten_params(flat) == params

    renamed = rename_param_keys(params, r"^backbone", "encoder")
    assert "encoder" in renamed and "backbone" not in renamed

    donor = {"backbone": {"conv1": {"kernel": np.full((3, 3), 7.0)}},
             "heads": {"cls": {"bias": np.ones(2)}}}
    merged = compose_params(params, donor, [r"backbone/"])
    assert (merged["backbone"]["conv1"]["kernel"] == 7.0).all()
    assert (merged["heads"]["cls"]["bias"] == 0).all()
    assert count_params(params) == 9 + 2


def test_max_consensus_recovers_shift():
    rng = np.random.default_rng(0)
    dst = rng.uniform(-10, 10, (40, 2)).astype(np.float32)
    shift = np.array([1.0, -0.5], dtype=np.float32)
    src = dst - shift  # moving src by +shift aligns it
    best, score = max_consensus_align(
        jnp.asarray(src), jnp.ones(40, bool), jnp.asarray(dst),
        jnp.ones(40, bool), xy_span=2.0, xy_steps=9, yaw_span_deg=0.0,
        yaw_steps=1, radius=0.3)
    np.testing.assert_allclose(np.asarray(best[:2]), shift, atol=0.26)
    assert int(score) >= 35


def test_agent_selector():
    sel = AgentSelector(lidar_ratio=0.5, ego_modality="camera", seed=1)
    mods = sel.select(10)
    assert mods[0] == "camera"
    assert set(mods) <= {"lidar", "camera"}


def test_get_cav_box_positions():
    """Marker boxes land at each live agent's position in the ego frame
    (ref inference_utils.py:266 get_cav_box)."""
    from coalign_tpu.utils.heter import get_cav_box

    poses = np.zeros((4, 6), dtype=np.float32)
    poses[1, :2] = [10.0, 5.0]
    poses[2, :2] = [-8.0, 2.0]
    poses[2, 4] = 90.0  # yaw should not move the box center
    mask = np.array([True, True, True, False])
    boxes, record = get_cav_box(poses, mask,
                                modalities=["lidar", "camera", "lidar"])
    assert boxes.shape == (3, 8, 3)
    np.testing.assert_allclose(boxes[0, :, :2].mean(0), [0, 0], atol=1e-5)
    np.testing.assert_allclose(boxes[1, :, :2].mean(0), [10, 5], atol=1e-4)
    np.testing.assert_allclose(boxes[2, :, :2].mean(0), [-8, 2], atol=1e-4)
    assert record.tolist() == [1, 0, 1]


def test_fix_cavs_box_injects_and_dedups():
    """Car-sized agent markers join pred+gt sets with score 1.0; a
    prediction overlapping an agent marker is NMS-deduped at IoU 0.01
    (ref inference_utils.py:200 fix_cavs_box)."""
    from coalign_tpu.utils.box_utils import boxes_to_corners_3d
    from coalign_tpu.utils.heter import fix_cavs_box

    poses = np.zeros((2, 6), dtype=np.float32)
    poses[1, :2] = [12.0, 0.0]
    mask = np.array([True, True])
    # one detection far away + one sitting exactly on agent 1 (dup)
    det7 = np.array([[30.0, 10.0, -1.0, 1.5, 2.0, 4.5, 0.0],
                     [12.0, 0.0, -1.2, 1.5, 2.0, 4.5, 0.0]], np.float32)
    det = np.asarray(boxes_to_corners_3d(det7, "hwl"))
    gt = det[:1]
    pred, scores, gt_out, n = fix_cavs_box(
        det, np.array([0.9, 0.8], np.float32), gt, poses, mask)
    assert n == 2
    # 2 markers + far detection survive; the overlapping det is deduped
    assert pred.shape[0] == 3
    assert (scores == 1.0).sum() == 2
    assert gt_out.shape[0] == 3  # 2 markers + 1 gt


def test_subsampling():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (500, 4)).astype(np.float32)
    sub = voxel_grid_subsample(pts, 2.0)
    assert len(sub) < len(pts)
    keys = np.floor(sub[:, :3] / 2.0).astype(int)
    assert len(np.unique(keys, axis=0)) == len(sub)

    r = random_subsample(pts, 100)
    assert len(r) == 100
    pts[0] = [0.1, 0.1, 0, 0]
    masked = mask_ego_points(pts)
    assert len(masked) < len(pts)
    assert not ((np.abs(masked[:, 0]) < 1.95)
                & (np.abs(masked[:, 1]) < 1.1)).any()


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0


def test_lr_schedules_match_reference_semantics(monkeypatch):
    """step / multistep / exponential decay once per EPOCH
    (ref train_utils.py:209-246: StepLR / MultiStepLR / ExponentialLR).
    Captures the schedule build_optimizer actually hands to adam."""
    from coalign_tpu import train as T

    captured = {}
    real_adam = T.optax.adam

    def spy(lr, **kw):
        captured["sched"] = lr
        return real_adam(lr, **kw)

    monkeypatch.setattr(T.optax, "adam", spy)
    spe = 10  # steps per epoch

    def sched(cfg):
        T.build_optimizer({"lr": 1.0, "args": {}}, cfg, spe)
        return captured["sched"]

    ms = sched({"core_method": "multistep", "step_size": [1, 3],
                "gamma": 0.1})
    assert float(ms(5)) == 1.0
    assert abs(float(ms(15)) - 0.1) < 1e-6
    assert abs(float(ms(35)) - 0.01) < 1e-6

    st = sched({"core_method": "step", "step_size": 2, "gamma": 0.5})
    assert float(st(19)) == 1.0 and float(st(20)) == 0.5
    assert float(st(45)) == 0.25  # staircase within epoch 4

    ex = sched({"core_method": "exponential", "gamma": 0.9})
    assert float(ex(9)) == 1.0  # staircase: flat within epoch 0
    assert abs(float(ex(10)) - 0.9) < 1e-6


def test_device_trace_writes_xplane(tmp_path):
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from coalign_tpu.utils.profiling import device_trace

    logdir = str(tmp_path / "trace")
    with device_trace(logdir):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    assert glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True)


def test_comm_volume_accounting():
    from coalign_tpu.utils.compression import (comm_volume_mbits,
                                               masked_comm_volume_mbits)
    # 256ch 100x352 f32 map ~ 115.3 Mbit (lidar_benchmark.md scale)
    v = comm_volume_mbits((100, 352, 256))
    assert 280 < v < 300
    assert abs(masked_comm_volume_mbits(0.01, (100, 352, 256)) - v * 0.01) \
        < 1e-6
    v8 = comm_volume_mbits((100, 352, 256), dtype_bits=8,
                           compression_ratio=64)
    assert v8 < v / 200


def test_bev_keypoints_prefer_structure():
    import jax.numpy as jnp
    from coalign_tpu.utils.keypoints import sample_bev_keypoints
    rng = np.random.default_rng(0)
    # a dense wall of points (structure) + sparse ground
    wall = np.stack([np.full(300, 5.0) + rng.normal(0, 0.05, 300),
                     np.linspace(-8, 8, 300),
                     rng.uniform(0, 1.5, 300)], -1)
    ground = np.stack([rng.uniform(-15, 15, 300),
                       rng.uniform(-15, 15, 300),
                       np.full(300, -1.9)], -1)
    pts = np.concatenate([wall, ground]).astype(np.float32)
    mask = np.ones(600, dtype=bool)
    idx = np.asarray(sample_bev_keypoints(
        jnp.asarray(pts), jnp.asarray(mask), [-16, -16, -3, 16, 16, 2],
        voxel=0.5, num_keypoints=64, pool=256))
    frac_wall = (idx < 300).mean()
    assert frac_wall > 0.5  # keypoints concentrate on the structure

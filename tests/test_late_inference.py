"""Late / no-fusion inference paths: per-agent decode + joint NMS + AP."""

import jax

from conftest import jit_apply, jit_init
import numpy as np

from coalign_tpu.data import LateFusionBatcher, SyntheticScenes
from coalign_tpu.inference import evaluate
from coalign_tpu.loss import build_loss
from coalign_tpu.models import build_model
from coalign_tpu.postprocess.anchors import make_anchor_spec
from coalign_tpu.train import (build_optimizer, create_train_state,

                               make_train_step)

LIDAR_RANGE = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]

ARGS = {
    "voxel_size": [0.4, 0.4, 4.0], "lidar_range": LIDAR_RANGE,
    "anchor_number": 2,
    "pillar_vfe": {"use_norm": True, "with_distance": False,
                   "use_absolute_xyz": True, "num_filters": [32]},
    "point_pillar_scatter": {"num_features": 32},
    "base_bev_backbone": {"layer_nums": [2, 2], "layer_strides": [2, 2],
                          "num_filters": [32, 64],
                          "upsample_strides": [1, 2],
                          "num_upsample_filter": [64, 64], "resnet": False},
    "shrink_header": {"kernal_size": [3], "stride": [1], "padding": [1],
                      "dim": [64], "input_dim": 128},
}

POST = {"target_args": {"score_threshold": 0.1}, "nms_thresh": 0.15,
        "gt_range": LIDAR_RANGE}


def test_late_fusion_eval_beats_no_fusion():
    """Train single-agent PP briefly; late fusion over 3 agents must find
    at least as much as ego-only on the synthetic oracle."""
    ds = SyntheticScenes(num_frames=4, num_agents=3, num_objects=4,
                         lidar_range=LIDAR_RANGE, points_per_object=48,
                         ground_points=96, seed=9)
    batcher = LateFusionBatcher(max_cav=3, max_points=1024, max_objects=8,
                                lidar_range=LIDAR_RANGE)
    model = build_model({"core_method": "point_pillar", "args": ARGS})

    anchor_args = {"W": 64, "H": 64, "l": 3.9, "w": 1.6, "h": 1.56,
                   "r": [0, 90], "vw": 0.4, "vh": 0.4, "feature_stride": 2,
                   "cav_lidar_range": LIDAR_RANGE}
    spec = make_anchor_spec(anchor_args, {"pos_threshold": 0.3,
                                          "neg_threshold": 0.2}, "hwl")
    loss_fn = build_loss({
        "pos_cls_weight": 2.0,
        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
        "reg": {"sigma": 3.0, "weight": 2.0}})

    # train on single-cav items (late-fusion train protocol)
    train_batch = batcher.assemble_train([ds[i] for i in range(4)])
    train_batch = {k: jax.numpy.asarray(v) for k, v in train_batch.items()}
    tx = build_optimizer({"lr": 3e-3, "args": {}}, None)
    state = create_train_state(model, train_batch, tx,
                               jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, spec)
    for _ in range(80):
        state, m = step(state, train_batch)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    res_late = evaluate(model, variables, batcher, ds, spec.anchors, POST,
                        batch_size=2, fusion_method="late")
    res_no = evaluate(model, variables, batcher, ds, spec.anchors, POST,
                      batch_size=2, fusion_method="no")
    assert res_late["frames"] == res_no["frames"] == 4
    for k in ("ap30", "ap50"):
        assert np.isfinite(res_late[k]) and np.isfinite(res_no[k])
    # with a briefly-trained detector extra agents can add a few false
    # positives; allow a small AP margin — the invariant under test is
    # that the late path runs all agents and stays in the same ballpark
    assert res_late["ap30"] >= res_no["ap30"] - 0.05
    assert res_late["ap30"] > 0.05  # the oracle scene must be learnable


def test_evaluate_dumps_npy_and_vis(tmp_path):
    """npy dump + BEV visualization hooks of the eval loop
    (ref inference_utils.py:176 + inference.py:199-223)."""
    import os

    from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes

    ds = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                         lidar_range=LIDAR_RANGE, points_per_object=32,
                         ground_points=64, seed=3)
    batcher = IntermediateFusionBatcher(max_cav=2, max_points=1024,
                                        max_objects=8,
                                        lidar_range=LIDAR_RANGE)
    model = build_model({"core_method": "point_pillar_baseline_multiscale",
                         "args": dict(ARGS, fusion_method="att",
                                      att={"feat_dim": [32, 64]})})
    batch = {k: jax.numpy.asarray(v)
             for k, v in batcher.assemble([ds[0]]).items()}
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    anchor_args = {"W": 64, "H": 64, "l": 3.9, "w": 1.6, "h": 1.56,
                   "r": [0, 90], "vw": 0.4, "vh": 0.4, "feature_stride": 2,
                   "cav_lidar_range": LIDAR_RANGE}
    spec = make_anchor_spec(anchor_args, {"pos_threshold": 0.3,
                                          "neg_threshold": 0.2}, "hwl")
    npy = str(tmp_path / "npy")
    vis = str(tmp_path / "vis")
    from coalign_tpu.utils.heter import AgentSelector

    evaluate(model, variables, batcher, ds, spec.anchors, POST,
             batch_size=1, npy_dir=npy, vis_dir=vis, vis_interval=1,
             heter_selector=AgentSelector(seed=1))
    assert os.path.exists(os.path.join(npy, "00000_pred_corners.npy"))
    assert os.path.exists(os.path.join(npy, "00001_gt_boxes.npy"))
    assert os.path.exists(os.path.join(vis, "bev_00000.png"))
    # heterogeneous runs also dump per-CAV marker boxes + modality record
    # (ref inference.py:195)
    cav = np.load(os.path.join(npy, "00000_cav_box.npy"))
    rec = np.load(os.path.join(npy, "00000_lidar_agent.npy"))
    assert cav.shape[1:] == (8, 3) and cav.shape[0] == len(rec)

"""DiscoNet knowledge distillation: batcher, teacher/student, KD train step."""

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.data import SyntheticScenes
from coalign_tpu.data.batch import KDFusionBatcher
from coalign_tpu.loss import build_loss
from coalign_tpu.models import build_model
from coalign_tpu.postprocess.anchors import make_anchor_spec
from coalign_tpu.tools.train_kd import make_kd_train_step
from coalign_tpu.train import build_optimizer, create_train_state

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


def _batch():
    ds = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                         lidar_range=LIDAR_RANGE, points_per_object=32,
                         ground_points=64, seed=4)
    b = KDFusionBatcher(max_cav=2, max_points=512, max_objects=8,
                        lidar_range=LIDAR_RANGE)
    return {k: jnp.asarray(v) for k, v in b.assemble([ds[0], ds[1]]).items()}


def test_kd_batch_contract():
    batch = _batch()
    assert batch["points"].shape[:2] == (2, 2)
    assert batch["teacher_points"].shape[:2] == (2, 1)
    assert batch["teacher_points"].shape[2] == 2 * batch["points"].shape[2]
    assert batch["teacher_point_mask"].sum() >= batch["point_mask"][:, 0].sum()


def test_kd_train_step_runs_and_improves():
    batch = _batch()
    student = build_model({"core_method": "point_pillar_disconet",
                           "args": ARGS})
    teacher = build_model({"core_method": "point_pillar_disconet_teacher",
                           "args": ARGS})

    t_vars = teacher.init(jax.random.PRNGKey(1), batch, train=False)
    t_out = teacher.apply(t_vars, batch, train=False)
    assert t_out["teacher_feature"].shape[0] == 2  # B frames (merged agent)
    assert "teacher_cls_preds" in t_out

    anchor_args = {"W": 64, "H": 64, "l": 3.9, "w": 1.6, "h": 1.56,
                   "r": [0, 90], "vw": 0.4, "vh": 0.4, "feature_stride": 2,
                   "cav_lidar_range": LIDAR_RANGE}
    spec = make_anchor_spec(anchor_args, {"pos_threshold": 0.3,
                                          "neg_threshold": 0.2}, "hwl")
    loss_fn = build_loss({
        "core_method": "point_pillar_disconet_loss",
        "args": {"pos_cls_weight": 2.0,
                 "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
                 "reg": {"sigma": 3.0, "weight": 2.0},
                 "kd": {"weight": 1.0}},
    })
    tx = build_optimizer({"lr": 2e-3, "args": {}}, None)
    state = create_train_state(student, batch, tx, jax.random.PRNGKey(0))
    step = make_kd_train_step(student, teacher, t_vars, loss_fn, spec)
    state, m0 = step(state, batch)
    assert "kd_loss" in m0 and np.isfinite(float(m0["kd_loss"]))
    for _ in range(5):
        state, m = step(state, batch)
    assert float(m["total_loss"]) < float(m0["total_loss"])


def _kd_cfg(root, model_args):
    return {
        "name": "kd_test",
        "root_dir": root, "validate_dir": root, "test_dir": root,
        "noise_setting": {"add_noise": False},
        "yaml_parser": "load_point_pillar_params",
        "train_params": {"batch_size": 2, "epoches": 1, "max_cav": 2},
        "input_source": ["lidar"], "label_type": "lidar",
        "comm_range": 70,
        "fusion": {"core_method": "intermediate", "dataset": "opv2v",
                   "args": {"proj_first": False}},
        "preprocess": {"core_method": "SpVoxelPreprocessor",
                       "args": {"voxel_size": [0.4, 0.4, 4],
                                "max_points_per_voxel": 16,
                                "max_voxel_train": 2000,
                                "max_voxel_test": 2000},
                       "cav_lidar_range": LIDAR_RANGE},
        "postprocess": {"core_method": "VoxelPostprocessor",
                        "gt_range": LIDAR_RANGE,
                        "anchor_args": {"cav_lidar_range": LIDAR_RANGE,
                                        "l": 3.9, "w": 1.6, "h": 1.56,
                                        "r": [0, 90], "feature_stride": 2,
                                        "num": 2},
                        "target_args": {"pos_threshold": 0.6,
                                        "neg_threshold": 0.45,
                                        "score_threshold": 0.2},
                        "order": "hwl", "max_num": 8, "nms_thresh": 0.15},
        "model": {"core_method": "point_pillar_disconet",
                  "args": model_args},
        "loss": {"core_method": "point_pillar_disconet_loss",
                 "args": {"pos_cls_weight": 2.0,
                          "cls": {"alpha": 0.25, "gamma": 2.0,
                                  "weight": 2.0},
                          "reg": {"sigma": 3.0, "weight": 2.0},
                          "kd": {"weight": 1.0}}},
        "optimizer": {"core_method": "Adam", "lr": 0.002, "args": {}},
    }


def test_train_kd_cli(tmp_path):
    """CLI mirroring ref train_w_kd.py: student+teacher from one yaml,
    checkpoints written."""
    import os

    import yaml

    from coalign_tpu.data.fixtures import write_opv2v_fixture
    from coalign_tpu.tools.train_kd import main as kd_main

    ds = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                         lidar_range=LIDAR_RANGE, points_per_object=32,
                         ground_points=64, seed=4)
    root = write_opv2v_fixture(str(tmp_path / "opv2v"), ds,
                               frames_per_scenario=2)
    path = str(tmp_path / "kd.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(_kd_cfg(root, ARGS), f)
    model_dir = str(tmp_path / "kd_run")
    state, history = kd_main(["-y", path, "--model_dir", model_dir,
                              "--epochs", "1"])
    assert history and np.isfinite(history[-1]["total_loss"])
    assert any(d.startswith("step_") for d in os.listdir(model_dir))


def test_train_kd_cli_reference_torch_teacher(tmp_path, capsys):
    """The reference KD workflow: a FROZEN torch teacher checkpoint
    (net_epoch*.pth) drives distillation (ref tools/train_w_kd.py:32-112
    loads the early-fusion teacher from a model dir). The golden
    point_pillar fixture doubles as the teacher — the reference teacher
    (point_pillar_disconet_teacher.py:15-40) has the same module layout as
    point_pillar (pillar_vfe/scatter/backbone/shrink/heads)."""
    import os
    import shutil

    import yaml

    from coalign_tpu.data.fixtures import write_opv2v_fixture
    from coalign_tpu.tools.train_kd import main as kd_main

    ds = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                         lidar_range=LIDAR_RANGE, points_per_object=32,
                         ground_points=64, seed=4)
    root = write_opv2v_fixture(str(tmp_path / "opv2v"), ds,
                               frames_per_scenario=2)
    # model args matching the golden fixture's TINY_ARGS geometry
    args64 = {
        "voxel_size": [0.4, 0.4, 4.0], "lidar_range": LIDAR_RANGE,
        "anchor_number": 2,
        "pillar_vfe": {"use_norm": True, "with_distance": False,
                       "use_absolute_xyz": True, "num_filters": [64]},
        "point_pillar_scatter": {"num_features": 64},
        "base_bev_backbone": {"layer_nums": [2, 2], "layer_strides": [2, 2],
                              "num_filters": [32, 64],
                              "upsample_strides": [1, 2],
                              "num_upsample_filter": [64, 64],
                              "resnet": False},
        "shrink_header": {"kernal_size": [3], "stride": [1], "padding": [1],
                          "dim": [64], "input_dim": 128},
        "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                     "anchor_yaw": [0, 90]},
    }
    teacher_dir = tmp_path / "ref_teacher"
    teacher_dir.mkdir()
    shutil.copy(os.path.join(os.path.dirname(__file__), "golden",
                             "point_pillar_base.pth"),
                teacher_dir / "net_epoch1.pth")
    path = str(tmp_path / "kd64.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(_kd_cfg(root, args64), f)
    model_dir = str(tmp_path / "kd_run64")
    state, history = kd_main(["-y", path, "--model_dir", model_dir,
                              "--epochs", "1",
                              "--teacher_dir", str(teacher_dir)])
    assert history and np.isfinite(history[-1]["total_loss"])
    assert "imported_reference_teacher" in capsys.readouterr().out

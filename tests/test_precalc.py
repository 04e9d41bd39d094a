"""CoAlign stage-1 precalc CLI (ref tools/pose_graph_pre_calc.py) and the
offline stage1_boxes.json consumption path (ref
intermediate_fusion_dataset.py:301-328)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import yaml

from coalign_tpu.config.yaml_utils import load_yaml

HYPES_DIR = os.path.join(os.path.dirname(__file__), "..",
                         "coalign_tpu", "hypes_yaml")
LR = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]


def _fixture(tmp_path):
    from coalign_tpu.data import SyntheticScenes
    from coalign_tpu.data.fixtures import write_opv2v_fixture

    scenes = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                             lidar_range=LR, points_per_object=32,
                             ground_points=64, seed=5)
    return write_opv2v_fixture(str(tmp_path / "opv2v"), scenes,
                               frames_per_scenario=2)


def _precalc_yaml(tmp_path, root):
    """Tiny precalc config: a point-pillar uncertainty stage-1 model (the
    SECOND stage-1 of the real precalc.yaml is exercised by the config
    zoo; PP keeps this test fast)."""
    base = load_yaml(os.path.join(HYPES_DIR, "opv2v",
                                  "pointpillar_uncertainty.yaml"))
    base["root_dir"] = root
    base["validate_dir"] = None
    base["test_dir"] = None
    base["fusion"] = {"core_method": "intermediate", "dataset": "opv2v",
                      "args": {"proj_first": False}}
    base["train_params"].update(batch_size=2, max_cav=2)
    base["noise_setting"] = {"add_noise": False}
    base["preprocess"]["cav_lidar_range"] = LR
    base["postprocess"]["gt_range"] = LR
    base["postprocess"]["anchor_args"]["cav_lidar_range"] = LR
    base["model"]["args"]["lidar_range"] = LR
    base["box_align_pre_calc"] = {
        "stage1_model": base["model"]["core_method"],
        "stage1_model_config": base["model"]["args"],
        "stage1_postprocessor_name": "uncertainty_voxel_postprocessor",
        "stage1_model_path": "",
        "output_save_path": str(tmp_path / "precalc_out"),
        "max_boxes": 8,
        "batch_size": 2,
    }
    path = str(tmp_path / "precalc.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(base, f)
    return path


def test_precalc_cli_dumps_json_and_offline_correction(tmp_path, capsys):
    root = _fixture(tmp_path)
    cfg = _precalc_yaml(tmp_path, root)

    from coalign_tpu.tools.run import main
    written = main(["precalc", "-y", cfg])
    assert len(written) == 1 and written[0].endswith("stage1_boxes.json")
    content = json.load(open(written[0]))
    assert set(content) == {"0", "1"}  # one entry per frame
    # each frame: per-agent box_poses [(x, y, yaw)] + uncertainty triples
    for rec in content["0"]:
        bp = np.asarray(rec["box_poses"], np.float32)
        assert bp.ndim in (1, 2)
        if bp.size:
            assert bp.shape[-1] == 3

    # ---- offline consumption: json -> padded dets -> pose correction ----
    from coalign_tpu.data import build_dataset
    from coalign_tpu.posegraph import BoxAlignConfig
    from coalign_tpu.tools.stage1 import (correct_batch_poses_from_json,
                                          load_stage1_json,
                                          stage1_content_to_arrays)

    params = load_yaml(cfg)
    base, batcher = build_dataset(params, train=False)
    batch = {k: jnp.asarray(v)
             for k, v in batcher.assemble([base[0], base[1]]).items()}

    content = load_stage1_json(written[0])
    dets = stage1_content_to_arrays(content, [0, 1], max_cav=2, max_boxes=8)
    assert dets["box_poses"].shape == (2, 2, 8, 3)

    out = correct_batch_poses_from_json(
        batch, content, [0, 1],
        BoxAlignConfig(abandon_hard_cases=False, landmark_SE2=False),
        max_boxes=8)
    assert out["lidar_pose"].shape == batch["lidar_pose"].shape
    assert np.isfinite(np.asarray(out["lidar_pose"])).all()
    assert np.isfinite(np.asarray(out["pairwise_t_matrix"])).all()
    # clean poses (no noise) + self-consistent detections => correction
    # must stay near the originals
    delta = np.abs(np.asarray(out["lidar_pose"])
                   - np.asarray(batch["lidar_pose"]))
    assert delta[..., :2].max() < 2.0

    # ---- CLI wiring: inference applies the json hook automatically when
    # the config's box_align block points at the dump (run.py
    # _box_align_hook; ref intermediate_fusion_dataset.py:301-328) ----
    model_dir = tmp_path / "balign_run"
    model_dir.mkdir()
    params2 = load_yaml(os.path.join(HYPES_DIR, "opv2v",
                                     "pointpillar_coalign.yaml"))
    params2["root_dir"] = root
    params2["validate_dir"] = root
    params2["train_params"].update(batch_size=2, epoches=1, max_cav=2)
    params2["preprocess"]["cav_lidar_range"] = LR
    params2["postprocess"]["gt_range"] = LR
    params2["postprocess"]["anchor_args"]["cav_lidar_range"] = LR
    params2["model"]["args"]["lidar_range"] = LR
    params2["box_align"] = {
        "val_result": written[0],
        "args": {"landmark_SE2": False, "abandon_hard_cases": False},
    }
    params2["noise_setting"] = {"add_noise": True,
                                "args": {"pos_std": 0.2, "rot_std": 0.2,
                                         "pos_mean": 0, "rot_mean": 0}}
    with open(model_dir / "config.yaml", "w") as f:
        yaml.safe_dump(params2, f)
    from coalign_tpu.tools.run import main as run_main
    capsys.readouterr()
    res = run_main(["inference", "--model_dir", str(model_dir),
                    "--eval_frames", "2"])
    assert '"box_align_json"' in capsys.readouterr().out
    assert np.isfinite(res["ap30"])

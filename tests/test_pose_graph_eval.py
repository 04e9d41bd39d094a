"""Pose-graph evaluation tool: error stats before/after correction."""

import numpy as np

from coalign_tpu.tools.pose_graph_eval import (relative_pose_errors,
                                               summarize)


def test_relative_pose_errors_oracle():
    clean = np.zeros((2, 3, 6), dtype=np.float32)
    clean[:, 1, 0] = 10.0  # agent 1 at x=10
    clean[:, 2, 4] = 30.0  # agent 2 yawed 30 deg
    noisy = clean.copy()
    noisy[0, 1, 0] += 0.5          # 0.5 m translation error
    noisy[1, 2, 4] += -2.0         # 2 deg rotation error
    mask = np.ones((2, 3), dtype=bool)
    terr, rerr = relative_pose_errors(noisy, clean, mask)
    assert terr.shape == (4,)      # 2 frames x 2 non-ego agents
    np.testing.assert_allclose(sorted(terr)[-1], 0.5, atol=1e-5)
    np.testing.assert_allclose(sorted(rerr)[-1], 2.0, atol=1e-5)

    s = summarize(terr, rerr)
    assert s["trans_mean"] > 0 and s["rot_mean"] > 0
    assert s["trans_p95"] >= s["trans_p50"]


def test_relative_pose_errors_wraps_yaw():
    clean = np.zeros((1, 2, 6), dtype=np.float32)
    noisy = clean.copy()
    noisy[0, 1, 4] = 359.0  # = -1 deg
    terr, rerr = relative_pose_errors(noisy, clean,
                                      np.ones((1, 2), dtype=bool))
    np.testing.assert_allclose(rerr, [1.0], atol=1e-5)
    np.testing.assert_allclose(terr, [0.0], atol=1e-6)


def test_pose_graph_eval_cli(tmp_path):
    """CLI: trained uncertainty model_dir -> pose-error CDFs yaml."""
    import os

    import yaml

    from coalign_tpu.config.yaml_utils import load_yaml
    from coalign_tpu.data import SyntheticScenes
    from coalign_tpu.data.fixtures import write_opv2v_fixture

    lr = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]
    scenes = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                             lidar_range=lr, points_per_object=32,
                             ground_points=64, seed=13)
    root = write_opv2v_fixture(str(tmp_path / "opv2v"), scenes,
                               frames_per_scenario=2)
    hy = os.path.join(os.path.dirname(__file__), "..", "coalign_tpu",
                      "hypes_yaml", "opv2v", "pointpillar_uncertainty.yaml")
    base = load_yaml(hy)
    base["root_dir"] = root
    base["validate_dir"] = root
    base["train_params"].update(batch_size=2, epoches=1, max_cav=2)
    base["preprocess"]["cav_lidar_range"] = lr
    base["postprocess"]["gt_range"] = lr
    base["postprocess"]["anchor_args"]["cav_lidar_range"] = lr
    base["model"]["args"]["lidar_range"] = lr
    base["noise_setting"] = {"add_noise": False}
    cfg = str(tmp_path / "unc.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(base, f)

    from coalign_tpu.tools.run import main as run_main
    model_dir = str(tmp_path / "run")
    run_main(["train", "-y", cfg, "--model_dir", model_dir,
              "--epochs", "1", "--eval_frames", "1"])

    from coalign_tpu.tools.pose_graph_eval import main as pge_main
    res = pge_main(["--model_dir", model_dir, "--pos_std", "0.4",
                    "--rot_std", "0.4", "--eval_frames", "2",
                    "--batch_size", "2"])
    assert res["frames"] >= 2
    for phase in ("before", "after"):
        assert np.isfinite(res[phase]["trans_mean"])
    assert os.path.exists(os.path.join(model_dir, "eval_pose_graph.yaml"))

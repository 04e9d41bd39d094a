"""inference_w_noise CLI (ref tools/inference_w_noise.py): trained
model_dir -> AP per pose-noise level, yaml dump."""

import os

import numpy as np
import yaml

from coalign_tpu.config.yaml_utils import load_yaml

HYPES_DIR = os.path.join(os.path.dirname(__file__), "..",
                         "coalign_tpu", "hypes_yaml")
LR = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]


def test_noise_sweep_cli_roundtrip(tmp_path):
    from coalign_tpu.data import SyntheticScenes
    from coalign_tpu.data.fixtures import write_opv2v_fixture

    scenes = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                             lidar_range=LR, points_per_object=32,
                             ground_points=64, seed=9)
    root = write_opv2v_fixture(str(tmp_path / "opv2v"), scenes,
                               frames_per_scenario=2)

    base = load_yaml(os.path.join(HYPES_DIR, "opv2v",
                                  "pointpillar_coalign.yaml"))
    base["root_dir"] = root
    base["validate_dir"] = root
    base["train_params"].update(batch_size=2, epoches=1, max_cav=2)
    base["preprocess"]["cav_lidar_range"] = LR
    base["postprocess"]["gt_range"] = LR
    base["postprocess"]["anchor_args"]["cav_lidar_range"] = LR
    base["model"]["args"]["lidar_range"] = LR
    base.pop("box_align", None)
    base["noise_setting"] = {"add_noise": False}
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(base, f)

    from coalign_tpu.tools.run import main as run_main
    model_dir = str(tmp_path / "run")
    run_main(["train", "-y", cfg_path, "--model_dir", model_dir,
              "--epochs", "1", "--eval_frames", "1"])

    from coalign_tpu.tools.noise_sweep import main as sweep_main
    results = sweep_main(["--model_dir", model_dir,
                          "--levels", "0,0.4",
                          "--eval_frames", "2", "--also_laplace"])
    assert set(results) == {(0.0, 0.0), (0.4, 0.4)}
    for v in results.values():
        assert np.isfinite(v["ap30"])
    dumped = os.path.join(model_dir, "eval_noise_sweep.yaml")
    assert os.path.exists(dumped)
    loaded = yaml.safe_load(open(dumped))
    assert "0_0" in loaded and "0.4_0.4" in loaded
    # --also_laplace repeats the table with Laplace noise (ref
    # inference_w_noise.py also_laplace)
    assert "laplace_0.4_0.4" in loaded
    assert np.isfinite(loaded["laplace_0.4_0.4"]["ap30"])

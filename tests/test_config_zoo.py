"""Config zoo: every shipped hypes yaml must parse, derive params and build
its model + loss. The CoAlign flagship config additionally runs end-to-end
(train 1 step + eval 1 frame) from an on-disk OPV2V fixture via the CLI
runner (tools/run.py) — the reference's train.py/inference.py workflow."""

import glob
import os

import numpy as np
import pytest

from coalign_tpu.config.yaml_utils import load_yaml
from coalign_tpu.loss import build_loss
from coalign_tpu.models import build_model

HYPES_DIR = os.path.join(os.path.dirname(__file__), "..",
                         "coalign_tpu", "hypes_yaml")
ALL_YAMLS = sorted(glob.glob(os.path.join(HYPES_DIR, "**", "*.yaml"),
                             recursive=True))


def test_zoo_is_populated():
    # full reference coverage: 64+ experiment yamls across 4 datasets
    # (ref opencood/hypes_yaml/{opv2v,dairv2x,v2xsim}/ + v2xset)
    assert len(ALL_YAMLS) >= 70


@pytest.mark.parametrize("path", ALL_YAMLS,
                         ids=[os.path.basename(p) for p in ALL_YAMLS])
def test_config_builds(path):
    params = load_yaml(path)
    model = build_model(params["model"])
    assert model is not None
    loss = build_loss(params["loss"])
    assert loss is not None
    # derived anchor args must be filled by the parser
    if params["postprocess"].get("core_method") in (
            "VoxelPostprocessor", "UncertaintyVoxelPostprocessor"):
        aa = params["postprocess"]["anchor_args"]
        assert "W" in aa and "H" in aa, path
        from coalign_tpu.postprocess.anchors import make_anchor_spec
        spec = make_anchor_spec(aa, params["postprocess"]["target_args"],
                                params["postprocess"].get("order", "hwl"))
        assert spec.anchors.shape[-1] == 7


def test_cli_train_and_inference_roundtrip(tmp_path, capsys):
    from coalign_tpu.data import SyntheticScenes
    from coalign_tpu.data.fixtures import write_opv2v_fixture
    from coalign_tpu.tools.run import main

    lr = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]
    scenes = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                             lidar_range=lr, points_per_object=32,
                             ground_points=64, seed=3)
    root = write_opv2v_fixture(str(tmp_path / "opv2v"), scenes,
                               frames_per_scenario=2)

    # a tiny flagship-style config pointing at the fixture
    import yaml
    base = load_yaml(os.path.join(HYPES_DIR, "opv2v",
                                  "pointpillar_coalign.yaml"))
    base["root_dir"] = root
    base["validate_dir"] = root
    base["train_params"].update(batch_size=2, epoches=1, max_cav=2,
                                eval_freq=1)
    base["preprocess"]["cav_lidar_range"] = lr
    base["postprocess"]["gt_range"] = lr
    base["postprocess"]["anchor_args"]["cav_lidar_range"] = lr
    base["model"]["args"]["lidar_range"] = lr
    base.pop("box_align", None)
    base["noise_setting"] = {"add_noise": False}
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(base, f)

    model_dir = str(tmp_path / "run")

    class Opt:
        hypes_yaml = cfg_path
        root_dir = None
        fusion_method = "intermediate"
        epochs = 1
        eval_frames = 2
        output = None
        platforms = "cpu"
        save_npy = True
        save_vis = True
        save_vis_interval = 1

    opt = Opt()
    opt.model_dir = model_dir
    from coalign_tpu.tools.run import cmd_inference, cmd_train
    state, res = cmd_train(opt)
    assert os.path.exists(os.path.join(model_dir, "config.yaml"))
    assert np.isfinite(res["ap30"])

    # second train in the same dir must RESUME from the snapshot
    # (ref train.py:55-75), and eval_freq=1 wrote a bestval slot
    capsys.readouterr()
    cmd_train(opt)
    out = capsys.readouterr().out
    assert '"resumed_from"' in out
    assert os.path.isdir(os.path.join(model_dir, "bestval"))

    res2 = cmd_inference(opt)
    # eval prefers the bestval slot like ref train_utils load_saved_model
    assert '"loaded_checkpoint": "bestval"' in capsys.readouterr().out
    assert np.isfinite(res2["ap30"])
    assert os.path.exists(os.path.join(model_dir,
                                       "eval_intermediate.yaml"))
    # --save_npy / --save_vis artifacts (ref inference.py workflow)
    assert glob.glob(os.path.join(model_dir, "npy", "*.npy"))
    assert glob.glob(os.path.join(model_dir, "vis", "*.png"))

    # deployment: export a serving artifact from the same run dir and
    # reload it (coalign_tpu/serving.py)
    from coalign_tpu.serving import load_artifact
    from coalign_tpu.tools.run import cmd_export
    artifact = cmd_export(opt)
    serving = load_artifact(artifact)
    assert serving.meta["platforms"] == ["cpu"]


def test_cli_bf16_flag_sets_compute_policy():
    from coalign_tpu.models.layers import compute_dtype, set_compute_dtype
    from coalign_tpu.tools.run import _apply_bf16

    class Opt:
        bf16 = True

    try:
        _apply_bf16(Opt())
        import jax.numpy as jnp
        assert compute_dtype() == jnp.bfloat16
    finally:
        set_compute_dtype(None)

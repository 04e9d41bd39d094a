"""Serving artifact: export the fused inference program with jax.export,
reload it WITHOUT the model zoo, and get bit-identical detections."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
from coalign_tpu.inference import make_infer_fn
from coalign_tpu.models import build_model
from coalign_tpu.postprocess.anchors import make_anchor_spec
from coalign_tpu.serving import export_inference, load_artifact

from conftest import jit_init

LIDAR_RANGE = [-8.0, -8.0, -3.0, 8.0, 8.0, 1.0]
VOXEL = [0.5, 0.5, 4.0]
MODEL_ARGS = {
    "voxel_size": VOXEL, "lidar_range": LIDAR_RANGE, "anchor_number": 2,
    "pillar_vfe": {"use_norm": True, "with_distance": False,
                   "use_absolute_xyz": True, "num_filters": [16]},
    "point_pillar_scatter": {"num_features": 16},
    "base_bev_backbone": {"layer_nums": [1], "layer_strides": [2],
                          "num_filters": [16], "upsample_strides": [1],
                          "num_upsample_filter": [16]},
    "fusion_method": "max", "max": {},
}
ANCHOR_ARGS = {"W": 32, "H": 32, "l": 4.2, "w": 1.8, "h": 1.6,
               "r": [0, 90], "vw": 0.5, "vh": 0.5, "feature_stride": 2,
               "cav_lidar_range": LIDAR_RANGE}
POSTPROCESS = {
    "anchor_args": ANCHOR_ARGS,
    "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                    "score_threshold": 0.2},
    "order": "hwl", "max_num": 50, "nms_thresh": 0.15,
    "gt_range": LIDAR_RANGE,
}


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    ds = SyntheticScenes(num_frames=2, num_agents=2, num_objects=2,
                         lidar_range=LIDAR_RANGE, points_per_object=24,
                         ground_points=48, seed=5)
    batcher = IntermediateFusionBatcher(max_cav=2, max_points=256,
                                        max_objects=8,
                                        lidar_range=LIDAR_RANGE)
    batch = {k: jnp.asarray(v) for k, v in batcher.assemble([ds[0]]).items()}
    model = build_model({"core_method": "point_pillar_baseline",
                         "args": MODEL_ARGS})
    spec = make_anchor_spec(ANCHOR_ARGS, POSTPROCESS["target_args"], "hwl")
    variables = jit_init(model, __import__("jax").random.PRNGKey(0), batch,
                         train=False)
    out_dir = str(tmp_path_factory.mktemp("artifact"))
    export_inference(model, variables, batch, spec.anchors, POSTPROCESS,
                     out_dir, platforms=("cpu", "tpu"))
    infer = make_infer_fn(model, spec.anchors, POSTPROCESS)
    want = infer(variables, batch)
    return out_dir, batch, want


def test_artifact_files_and_meta(exported):
    out_dir, batch, _ = exported
    assert os.path.exists(os.path.join(out_dir, "program.jaxexport"))
    assert os.path.exists(os.path.join(out_dir, "params.npz"))
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    # the TPU-serving artifact also carries the cpu lowering for fallback
    assert meta["platforms"] == ["cpu", "tpu"]
    assert set(meta["batch_spec"]) == set(batch)


def test_reload_matches_direct_inference(exported):
    out_dir, batch, want = exported
    serving = load_artifact(out_dir)
    got = serving(batch)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=1e-6, err_msg=k)


def test_batch_contract_is_validated(exported):
    out_dir, batch, _ = exported
    serving = load_artifact(out_dir)
    bad = dict(batch)
    bad.pop("points")
    with pytest.raises(ValueError, match="missing keys"):
        serving(bad)
    bad = dict(batch)
    bad["points"] = np.zeros((1, 2, 7, 4), np.float32)
    with pytest.raises(ValueError, match="fixed-shape"):
        serving(bad)


def test_artifact_is_self_contained(exported, tmp_path):
    """A fresh process that imports ONLY coalign_tpu.serving (no model
    zoo, no flax model build, no config) reproduces the detections."""
    out_dir, batch, want = exported
    np.savez(tmp_path / "batch.npz",
             **{k: np.asarray(v) for k, v in batch.items()})
    script = tmp_path / "serve.py"
    script.write_text(
        "import os, sys, json\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from coalign_tpu.serving import load_artifact\n"
        f"m = load_artifact({out_dir!r})\n"
        f"npz = np.load({str(tmp_path / 'batch.npz')!r})\n"
        "dets = m({k: npz[k] for k in npz.files})\n"
        "print(json.dumps({k: float(np.asarray(v).astype(np.float64).sum())"
        " for k, v in dets.items()}))\n")
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run([sys.executable, str(script)], text=True,
                         capture_output=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    sums = json.loads(out.stdout.strip().splitlines()[-1])
    for k, v in sums.items():
        np.testing.assert_allclose(
            v, float(np.asarray(want[k]).astype(np.float64).sum()),
            rtol=1e-5, err_msg=k)

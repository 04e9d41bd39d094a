"""PIXOR dense-BEV family: raster oracle, label maps, forward, loss, decode."""

import jax

from conftest import jit_apply, jit_init
import jax.numpy as jnp
import numpy as np

from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
from coalign_tpu.models import build_model
from coalign_tpu.ops.bev_raster import BevSpec, rasterize_bev
from coalign_tpu.postprocess.dense_bev import (DenseBevSpec,

                                               assign_dense_targets,
                                               decode_dense_map)

GEOM = {"L1": -16.0, "L2": 16.0, "W1": -16.0, "W2": 16.0,
        "H1": -3.0, "H2": 1.0, "res": 0.5, "downsample_rate": 4}
LIDAR_RANGE = [GEOM["L1"], GEOM["W1"], GEOM["H1"],
               GEOM["L2"], GEOM["W2"], GEOM["H2"]]


def test_rasterize_oracle():
    spec = BevSpec.from_config(GEOM)
    assert spec.input_shape == (64, 64, 9)
    pts = np.array([
        [-15.9, -15.9, -2.9, 0.4],
        [-15.8, -15.9, -2.8, 0.8],   # same (x, y) cell, same z slab
        [0.1, 0.2, 0.9, 1.0],
    ], dtype=np.float32)
    bev = np.asarray(rasterize_bev(jnp.asarray(pts),
                                   jnp.ones(3, dtype=bool), spec))
    assert bev[0, 0, 0] == 1.0                   # occupancy
    np.testing.assert_allclose(bev[0, 0, -1], 0.6, atol=1e-5)  # mean inten
    assert bev[32, 32, 7] == 1.0                 # z=0.9 -> slab 7
    assert bev.sum() == 1.0 + 1.0 + 0.6 + 1.0


def test_dense_targets_and_decode_roundtrip():
    """decode(encode(gt)) recovers the gt boxes — the debug_utils.py:27
    style round-trip of the reference."""
    spec = DenseBevSpec(bev=BevSpec.from_config(GEOM))
    gt = np.zeros((4, 7), dtype=np.float32)
    # footprints must span the 2 m label-pixel pitch to get positives
    gt[0] = [3.0, 2.0, -1.0, 1.56, 3.0, 4.4, 0.4]
    gt[1] = [-6.0, -5.0, -1.0, 1.56, 2.8, 4.8, -1.2]
    mask = np.array([True, True, False, False])

    label = assign_dense_targets(jnp.asarray(gt), jnp.asarray(mask), spec)
    assert label.shape == (16, 16, 7)
    assert float(label[..., 0].sum()) > 0

    # perfect predictions = targets; logits large where positive
    cls_logit = jnp.where(label[..., :1] > 0, 12.0, -12.0)
    det = decode_dense_map(cls_logit, label[..., 1:], spec,
                           score_threshold=0.5, nms_threshold=0.1,
                           max_keep=8)
    boxes = np.asarray(det["boxes"])[np.asarray(det["valid"])]
    assert len(boxes) == 2
    # match to gt by center distance
    for g in gt[:2]:
        d = np.linalg.norm(boxes[:, :2] - g[:2], axis=1)
        j = d.argmin()
        assert d[j] < 0.3
        np.testing.assert_allclose(boxes[j, 4:6], g[4:6], rtol=0.05)
        dyaw = abs((boxes[j, 6] - g[6] + np.pi) % (2 * np.pi) - np.pi)
        assert dyaw < 0.1


def _batch(num_agents=2):
    ds = SyntheticScenes(num_frames=1, num_agents=num_agents, num_objects=3,
                         lidar_range=LIDAR_RANGE, points_per_object=48,
                         ground_points=128, seed=5)
    b = IntermediateFusionBatcher(max_cav=num_agents, max_points=512,
                                  max_objects=8, lidar_range=LIDAR_RANGE)
    return {k: jnp.asarray(v) for k, v in b.assemble([ds[0]]).items()}


def test_pixor_forward_and_loss():
    from coalign_tpu.loss import build_loss
    model = build_model({"core_method": "pixor",
                         "args": {"geometry_param": GEOM, "use_bn": True}})
    batch = _batch(num_agents=1)
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    assert out["cls_map"].shape == (1, 16, 16, 1)
    assert out["reg_map"].shape == (1, 16, 16, 6)

    spec = DenseBevSpec(bev=BevSpec.from_config(GEOM))
    labels = {"label_map": jax.vmap(
        lambda b, m: assign_dense_targets(b, m, spec))(
        batch["gt_boxes"], batch["gt_mask"])}
    loss_fn = build_loss({"core_method": "pixor_loss",
                          "args": {"alpha": 1.0, "beta": 1.0}})
    total, metrics = loss_fn(out, labels)
    assert np.isfinite(float(total))


def test_pixor_intermediate_forward():
    model = build_model({"core_method": "pixor_intermediate",
                         "args": {"geometry_param": GEOM, "use_bn": True,
                                  "fusion_method": "att",
                                  "att": {"feat_dim": [128]}}})
    batch = _batch(num_agents=2)
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    assert out["cls_map"].shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(out["cls_map"])).all()


def test_pixor_cli_train_inference_roundtrip(tmp_path):
    """Anchor-free family through the CLI runner: build_all constructs a
    DenseBevSpec, the train step assigns dense label maps, and evaluate
    decodes via decode_dense_map (ref bev_postprocessor.py protocol)."""
    import os

    import yaml

    from coalign_tpu.config.yaml_utils import load_yaml
    from coalign_tpu.data import SyntheticScenes
    from coalign_tpu.data.fixtures import write_opv2v_fixture
    from coalign_tpu.tools.run import main as run_main

    lr = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]
    scenes = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                             lidar_range=lr, points_per_object=32,
                             ground_points=64, seed=3)
    root = write_opv2v_fixture(str(tmp_path / "opv2v"), scenes,
                               frames_per_scenario=2)
    hypes = os.path.join(os.path.dirname(__file__), "..", "coalign_tpu",
                         "hypes_yaml", "opv2v", "pixor_intermediate.yaml")
    base = load_yaml(hypes)
    base["root_dir"] = root
    base["validate_dir"] = root
    base["train_params"].update(batch_size=2, epoches=1, max_cav=2)
    base["noise_setting"] = {"add_noise": False}
    base["preprocess"]["cav_lidar_range"] = lr
    base["postprocess"]["gt_range"] = lr
    base["model"]["args"]["geometry_param"].update(
        L1=lr[0], L2=lr[3], W1=lr[1], W2=lr[4])
    base["model"]["args"]["lidar_range"] = lr
    cfg = str(tmp_path / "pixor.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(base, f)
    model_dir = str(tmp_path / "run")
    state, res = run_main(["train", "-y", cfg, "--model_dir", model_dir,
                           "--epochs", "1", "--eval_frames", "1"])
    assert np.isfinite(res["ap30"])
    res2 = run_main(["inference", "--model_dir", model_dir,
                     "--eval_frames", "1"])
    assert np.isfinite(res2["ap30"])
    assert np.isfinite(res2["bandwidth_mb_per_frame"])

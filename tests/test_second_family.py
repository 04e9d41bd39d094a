"""SECOND / CIA-SSD / VoxelNet families: voxelization + forward + training.

The reference validates these only by full-dataset AP (SURVEY §4); here the
dense-voxel path is unit-tested (mean voxelize oracle, backbone shapes) and
smoke-trained on the synthetic oracle scenes.
"""

import jax

from conftest import jit_apply, jit_init
import jax.numpy as jnp
import numpy as np
import pytest

from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
from coalign_tpu.models import build_model
from coalign_tpu.ops.voxels import (VoxelSpec, mean_voxelize, voxel_ids,

                                    voxel_max_broadcast_batched)

LIDAR_RANGE = [-16.0, -16.0, -3.0, 16.0, 16.0, 1.0]
VOXEL = [0.4, 0.4, 0.5]  # nz=8, ny=80, nx=80


def _batch(num_frames=1, num_agents=2):
    ds = SyntheticScenes(num_frames=num_frames, num_agents=num_agents,
                         num_objects=3, lidar_range=LIDAR_RANGE,
                         points_per_object=48, ground_points=128, seed=5)
    b = IntermediateFusionBatcher(max_cav=num_agents, max_points=512,
                                  max_objects=8, lidar_range=LIDAR_RANGE)
    return {k: jnp.asarray(v)
            for k, v in b.assemble([ds[i] for i in range(num_frames)]).items()}


def test_mean_voxelize_oracle():
    spec = VoxelSpec.from_config(LIDAR_RANGE, VOXEL)
    assert (spec.nx, spec.ny, spec.nz) == (80, 80, 8)
    pts = np.array([
        [-15.9, -15.9, -2.9, 0.5],   # voxel (0, 0, 0)
        [-15.7, -15.8, -2.8, 1.0],   # same voxel
        [0.1, 0.1, 0.1, 0.25],       # voxel (40, 40, 6)
        [99.0, 0.0, 0.0, 0.0],       # out of range
    ], dtype=np.float32)
    mask = np.array([True, True, True, True])
    grid, occ = mean_voxelize(jnp.asarray(pts), jnp.asarray(mask), spec)
    assert grid.shape == (8, 80, 80, 4)
    assert int(occ.sum()) == 2
    np.testing.assert_allclose(
        np.asarray(grid[0, 0, 0]), pts[:2].mean(0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grid[6, 40, 40]), pts[2], atol=1e-5)


def test_voxel_max_broadcast_batched():
    spec = VoxelSpec.from_config(LIDAR_RANGE, VOXEL)
    pts = np.zeros((2, 4, 4), dtype=np.float32)
    pts[0, :2, :2] = [[-15.9, -15.9], [-15.8, -15.8]]  # same voxel
    pts[0, 2, :2] = [0.1, 0.1]
    pts[1, :3, :2] = [[5.0, 5.0], [5.1, 5.1], [5.05, 5.05]]
    mask = np.ones((2, 4), dtype=bool)
    mask[0, 3] = False
    mask[1, 3] = False
    ids, valid = voxel_ids(jnp.asarray(pts), jnp.asarray(mask), spec)
    feats = jnp.asarray(np.arange(2 * 4 * 3).reshape(2, 4, 3).astype(
        np.float32))
    out = voxel_max_broadcast_batched(feats, ids, valid, spec.num_voxels)
    # frame 0: points 0,1 share a voxel -> both get max(feat0, feat1)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(out[0, 1]))
    np.testing.assert_allclose(np.asarray(out[0, 1]),
                               np.asarray(feats[0, 1]))
    # frame isolation: frame 1's shared voxel unaffected by frame 0
    np.testing.assert_allclose(np.asarray(out[1, 0]),
                               np.asarray(feats[1, 2]))
    # invalid points zeroed
    np.testing.assert_allclose(np.asarray(out[0, 3]), 0.0)


BB = {"layer_nums": [3], "layer_strides": [1], "num_filters": [128],
      "upsample_strides": [1], "num_upsample_filter": [128],
      "resnet": False}


def _args(extra=None):
    a = {"voxel_size": VOXEL, "lidar_range": LIDAR_RANGE,
         "anchor_number": 2, "base_bev_backbone": BB,
         "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                      "anchor_yaw": [0, 90]}}
    if extra:
        a.update(extra)
    return a


@pytest.mark.parametrize("core,extra,outputs", [
    ("second", None, ("cls_preds", "reg_preds")),
    ("second_intermediate", {"fusion_method": "att",
                             "att": {"feat_dim": [128]}},
     ("cls_preds", "reg_preds")),
    ("ciassd", None, ("cls_preds", "reg_preds", "iou_preds")),
    ("second_ssfa_uncertainty", None,
     ("cls_preds", "reg_preds", "iou_preds", "unc_preds")),
])
def test_second_family_forward(core, extra, outputs):
    model = build_model({"core_method": core, "args": _args(extra)})
    batch = _batch()
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    for k in outputs:
        assert k in out, (core, k, list(out))
        assert np.isfinite(np.asarray(out[k])).all(), (core, k)
    # grid 80 -> 8x down = 10
    f = 1 if "intermediate" in core else 2  # fused vs per-agent frames
    assert out["cls_preds"].shape == (f, 10, 10, 2)


@pytest.mark.parametrize("core", ["voxel_net", "voxel_net_intermediate"])
def test_voxelnet_forward(core):
    extra = ({"fusion_method": "att", "att": {"feat_dim": [128]}}
             if "intermediate" in core else None)
    model = build_model({"core_method": core, "args": _args(extra)})
    batch = _batch()
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    assert out["reg_preds"].shape[-1] == 14


def test_second_trains():
    """One jitted train step on SECOND decreases loss over a few steps."""
    from coalign_tpu.loss import build_loss
    from coalign_tpu.postprocess.anchors import make_anchor_spec
    from coalign_tpu.train import (build_optimizer, create_train_state,
                                   make_train_step)

    model = build_model({"core_method": "second", "args": _args()})
    batch = _batch(num_frames=1, num_agents=1)
    anchor_args = {"W": 80, "H": 80, "l": 3.9, "w": 1.6, "h": 1.56,
                   "r": [0, 90], "vw": 0.4, "vh": 0.4, "feature_stride": 8,
                   "cav_lidar_range": LIDAR_RANGE}
    spec = make_anchor_spec(anchor_args, {"pos_threshold": 0.3,
                                          "neg_threshold": 0.2}, "hwl")
    loss_fn = build_loss({
        "pos_cls_weight": 2.0,
        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
        "reg": {"sigma": 3.0, "weight": 2.0},
    })
    tx = build_optimizer({"lr": 3e-3, "args": {}}, None)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, spec)
    state, m0 = step(state, batch)
    for _ in range(6):
        state, m = step(state, batch)
    assert float(m["total_loss"]) < float(m0["total_loss"])


def test_voxelnet_loss_matches_reference_semantics():
    """VoxelNetLoss reproduces ref voxel_net_loss.py:30-55 (numpy oracle:
    pos/neg-split BCE normalized by counts + summed smooth-L1 / n_pos)."""
    from coalign_tpu.loss import build_loss

    rng = np.random.default_rng(11)
    B, H, W, A = 2, 6, 6, 2
    psm = rng.normal(0, 2, (B, H, W, A)).astype(np.float32)
    rm = rng.normal(0, 1, (B, H, W, A * 7)).astype(np.float32)
    pos = (rng.random((B, H, W, A)) < 0.1).astype(np.float32)
    neg = ((rng.random((B, H, W, A)) < 0.7) * (1 - pos)).astype(np.float32)
    tgt = rng.normal(0, 1, (B, H, W, A * 7)).astype(np.float32)

    loss_fn = build_loss({"core_method": "voxel_net_loss",
                          "args": {"alpha": 1.5, "beta": 1.0, "reg": 2.0}})
    total, metrics = loss_fn(
        {"cls_preds": jnp.asarray(psm), "reg_preds": jnp.asarray(rm)},
        {"pos_equal_one": jnp.asarray(pos), "neg_equal_one": jnp.asarray(neg),
         "targets": jnp.asarray(tgt)})

    p = 1.0 / (1.0 + np.exp(-psm))
    cls_pos = (-pos * np.log(p + 1e-6)).sum() / (pos.sum() + 1e-6)
    cls_neg = (-neg * np.log(1 - p + 1e-6)).sum() / (neg.sum() + 1e-6)
    diff = (rm.reshape(B, H, W, A, 7)
            - tgt.reshape(B, H, W, A, 7)) * pos[..., None]
    sm = np.where(np.abs(diff) < 1.0, 0.5 * diff ** 2, np.abs(diff) - 0.5)
    reg = sm.sum() / (pos.sum() + 1e-6)
    want = 2.0 * reg + 1.5 * cls_pos + 1.0 * cls_neg
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["reg_loss"]), reg, rtol=1e-5)


def test_voxelnet_trains_with_dedicated_loss():
    """VoxelNet + voxel_net_loss decreases loss (ties the dedicated loss
    into the train step like the yaml wiring does). Runs on a cropped
    8 m grid (40x40) to keep the stride-1 dense path cheap."""
    from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
    from coalign_tpu.loss import build_loss
    from coalign_tpu.postprocess.anchors import make_anchor_spec
    from coalign_tpu.train import (build_optimizer, create_train_state,
                                   make_train_step)

    small_range = [-8.0, -8.0, -3.0, 8.0, 8.0, 1.0]
    model = build_model({"core_method": "voxel_net",
                         "args": dict(_args(), lidar_range=small_range)})
    ds = SyntheticScenes(num_frames=1, num_agents=1, num_objects=2,
                         lidar_range=small_range, points_per_object=48,
                         ground_points=128, seed=5)
    b = IntermediateFusionBatcher(max_cav=1, max_points=512, max_objects=8,
                                  lidar_range=small_range)
    batch = {k: jnp.asarray(v) for k, v in b.assemble([ds[0]]).items()}
    # voxel_net heads emit at the full BEV grid -> anchors at stride 1
    anchor_args = {"W": 40, "H": 40, "l": 3.9, "w": 1.6, "h": 1.56,
                   "r": [0, 90], "vw": 0.4, "vh": 0.4, "feature_stride": 1,
                   "cav_lidar_range": small_range}
    spec = make_anchor_spec(anchor_args, {"pos_threshold": 0.3,
                                          "neg_threshold": 0.2}, "hwl")
    loss_fn = build_loss({"core_method": "voxel_net_loss",
                          "args": {"alpha": 1.5, "beta": 1.0, "reg": 2.0}})
    tx = build_optimizer({"lr": 3e-3, "args": {}}, None)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, spec)
    state, m0 = step(state, batch)
    for _ in range(6):
        state, m = step(state, batch)
    assert float(m["total_loss"]) < float(m0["total_loss"])


def test_second_cli_train_late_eval_roundtrip(tmp_path):
    """CLI train on the (late-fusion) SECOND config: the end-of-train eval
    must follow the config's fusion protocol (a late config decoded with
    the intermediate path crashes on per-agent pred shapes)."""
    import os

    import yaml

    from coalign_tpu.config.yaml_utils import load_yaml
    from coalign_tpu.data import SyntheticScenes
    from coalign_tpu.data.fixtures import write_opv2v_fixture
    from coalign_tpu.tools.run import main as run_main

    lr = [-8.0, -8.0, -3.0, 8.0, 8.0, 1.0]
    scenes = SyntheticScenes(num_frames=2, num_agents=2, num_objects=2,
                             lidar_range=lr, points_per_object=24,
                             ground_points=48, seed=3)
    root = write_opv2v_fixture(str(tmp_path / "opv2v"), scenes,
                               frames_per_scenario=2)
    hypes = os.path.join(os.path.dirname(__file__), "..", "coalign_tpu",
                         "hypes_yaml", "opv2v", "SECOND.yaml")
    base = load_yaml(hypes)
    base["root_dir"] = root
    base["validate_dir"] = root
    base["train_params"].update(batch_size=2, epoches=1, max_cav=2)
    base["noise_setting"] = {"add_noise": False}
    base["preprocess"]["cav_lidar_range"] = lr
    base["preprocess"]["args"]["voxel_size"] = [0.5, 0.5, 0.5]
    base["postprocess"]["gt_range"] = lr
    base["postprocess"]["anchor_args"]["cav_lidar_range"] = lr
    base["model"]["args"]["lidar_range"] = lr
    base["model"]["args"]["voxel_size"] = [0.5, 0.5, 0.5]
    cfg = str(tmp_path / "second.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(base, f)
    model_dir = str(tmp_path / "run")
    state, res = run_main(["train", "-y", cfg, "--model_dir", model_dir,
                           "--epochs", "1", "--eval_frames", "1"])
    assert np.isfinite(res["ap30"])
    res2 = run_main(["inference", "--model_dir", model_dir,
                     "--fusion_method", "late", "--eval_frames", "1"])
    assert np.isfinite(res2["ap30"])

"""Robust V2VNet + MASH fusion: forward, pose-correction math, losses."""

import jax

from conftest import jit_apply, jit_init
import jax.numpy as jnp
import numpy as np

from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
from coalign_tpu.loss import build_loss
from coalign_tpu.models import build_model
from coalign_tpu.models.fuse.robust import (global_consistency,

                                            pose3_to_tfm, tfm_to_pose3)

LIDAR_RANGE = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]

BASE_ARGS = {
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


def _batch(pos_std=0.0):
    ds = SyntheticScenes(num_frames=1, num_agents=3, num_objects=3,
                         lidar_range=LIDAR_RANGE, points_per_object=32,
                         ground_points=64, seed=4)
    b = IntermediateFusionBatcher(max_cav=3, max_points=512, max_objects=8,
                                  lidar_range=LIDAR_RANGE, pos_std=pos_std,
                                  rot_std=pos_std)
    return {k: jnp.asarray(v) for k, v in b.assemble([ds[0]]).items()}


def test_pose3_roundtrip():
    p = jnp.asarray([[1.5, -2.0, 0.7], [0.0, 3.0, -2.9]])
    back = tfm_to_pose3(pose3_to_tfm(p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-5)


def test_global_consistency_exact_measurements():
    """With exact relative measurements, the solve must reproduce them."""
    rng = np.random.default_rng(0)
    abs_pose = np.zeros((1, 4, 3), dtype=np.float32)
    abs_pose[0, 1:] = rng.normal(0, 1.0, (3, 3))
    rel = abs_pose[:, None, :, :] - abs_pose[:, :, None, :]
    w = np.ones((1, 4, 4), dtype=np.float32)
    mask = np.ones((1, 4), dtype=bool)
    out = np.asarray(global_consistency(jnp.asarray(rel), jnp.asarray(w),
                                        jnp.asarray(mask)))
    np.testing.assert_allclose(out, rel, atol=1e-4)


def test_global_consistency_denoises():
    """Averaging over redundant noisy edges must beat the raw edges."""
    rng = np.random.default_rng(1)
    abs_pose = np.zeros((1, 5, 3), dtype=np.float32)
    abs_pose[0, 1:] = rng.normal(0, 1.0, (4, 3))
    rel_true = abs_pose[:, None, :, :] - abs_pose[:, :, None, :]
    noise = rng.normal(0, 0.3, rel_true.shape).astype(np.float32)
    noise = noise - np.swapaxes(noise, 1, 2)  # keep antisymmetry
    rel_noisy = rel_true + noise
    w = np.ones((1, 5, 5), dtype=np.float32)
    mask = np.ones((1, 5), dtype=bool)
    out = np.asarray(global_consistency(jnp.asarray(rel_noisy),
                                        jnp.asarray(w), jnp.asarray(mask)))
    err_out = np.abs(out - rel_true).mean()
    err_in = np.abs(rel_noisy - rel_true).mean()
    assert err_out < err_in


def test_robust_model_forward_and_loss():
    args = dict(BASE_ARGS)
    args["robust"] = {"hidden": 32, "stage": 1, "downsample_rate": 2.0}
    model = build_model({"core_method": "point_pillar_v2vnet_robust",
                         "args": args})
    batch = _batch(pos_std=0.2)
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    assert out["pose_corr"].shape == (1, 3, 3, 3)
    assert out["agent_scores"].shape == (1, 3, 3)
    assert "pose_corr_target" in out
    assert np.isfinite(np.asarray(out["cls_preds"])).all()

    loss_fn = build_loss({
        "core_method": "point_pillar_v2v_robust_loss",
        "args": {"pos_cls_weight": 2.0,
                 "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
                 "reg": {"sigma": 3.0, "weight": 2.0},
                 "robust": {"stage": 1}}})
    from coalign_tpu.postprocess.anchors import assign_targets, \
        make_anchor_spec
    spec = make_anchor_spec(
        {"W": 64, "H": 64, "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
         "vw": 0.4, "vh": 0.4, "feature_stride": 2,
         "cav_lidar_range": LIDAR_RANGE},
        {"pos_threshold": 0.3, "neg_threshold": 0.2}, "hwl")
    labels = jax.vmap(lambda b, m: assign_targets(b, m, spec))(
        batch["gt_boxes"], batch["gt_mask"])
    total, metrics = loss_fn(out, labels)
    assert np.isfinite(float(total))
    assert "pose_loss" in metrics


def test_robust_stage_masks():
    from coalign_tpu.tools.train_robust import stage_param_labels
    args = dict(BASE_ARGS)
    args["robust"] = {"hidden": 32}
    model = build_model({"core_method": "point_pillar_v2vnet_robust",
                         "args": args})
    batch = _batch()
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    import jax.tree_util as jtu
    for stage, want_robust in [(0, "freeze"), (1, "train"), (2, "train")]:
        labels = stage_param_labels(variables["params"], stage)
        flat = jtu.tree_leaves_with_path(labels)
        robust_labels = {lab for path, lab in flat
                         if "pose_regression" in str(path)}
        other_labels = {lab for path, lab in flat
                        if "pose_regression" not in str(path)
                        and "attention" not in str(path)
                        and "alpha" not in str(path)}
        assert robust_labels == {want_robust}, (stage, robust_labels)
        assert other_labels == ({"train"} if stage != 1 else {"freeze"})


def test_mash_model_forward_and_loss():
    args = dict(BASE_ARGS)
    args["mash"] = {"coarse_downsample": 2, "query_dim": 16}
    model = build_model({"core_method": "point_pillar_mash", "args": args})
    batch = _batch(pos_std=0.4)  # MASH is pose-free: noise must not crash
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    assert out["corr_vol"].shape[1] == 3  # L agents

    loss_fn = build_loss({
        "core_method": "point_pillar_mash_loss",
        "args": {"pos_cls_weight": 2.0,
                 "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
                 "reg": {"sigma": 3.0, "weight": 2.0}}})
    from coalign_tpu.postprocess.anchors import assign_targets, \
        make_anchor_spec
    spec = make_anchor_spec(
        {"W": 64, "H": 64, "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
         "vw": 0.4, "vh": 0.4, "feature_stride": 2,
         "cav_lidar_range": LIDAR_RANGE},
        {"pos_threshold": 0.3, "neg_threshold": 0.2}, "hwl")
    labels = jax.vmap(lambda b, m: assign_targets(b, m, spec))(
        batch["gt_boxes"], batch["gt_mask"])
    total, metrics = loss_fn(out, labels)
    assert np.isfinite(float(total))
    assert "corr_entropy" in metrics

import numpy as np

from conftest import jit_apply, jit_init
import jax
import jax.numpy as jnp

from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
from coalign_tpu.loss import build_loss
from coalign_tpu.models import build_model
from coalign_tpu.posegraph import BoxAlignConfig
from coalign_tpu.postprocess.anchors import make_anchor_spec
from coalign_tpu.tools.stage1 import correct_batch_poses, make_stage1_fn
from coalign_tpu.utils.transforms import (get_pairwise_transformation,

                                          inverse_tfm, pose_to_tfm)

LIDAR_RANGE = [-16.0, -16.0, -3.0, 16.0, 16.0, 1.0]

MODEL_ARGS = {
    "voxel_size": [0.5, 0.5, 4.0],
    "lidar_range": LIDAR_RANGE,
    "anchor_number": 2,
    "pillar_vfe": {"use_norm": True, "with_distance": False,
                   "use_absolute_xyz": True, "num_filters": [16]},
    "point_pillar_scatter": {"num_features": 16},
    "base_bev_backbone": {
        "layer_nums": [2, 2], "layer_strides": [2, 2],
        "num_filters": [16, 32], "upsample_strides": [1, 2],
        "num_upsample_filter": [16, 16],
    },
    "dir_args": {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]},
}
ANCHOR_ARGS = {"W": 64, "H": 64, "l": 4.2, "w": 1.8, "h": 1.6, "r": [0, 90],
               "vw": 0.5, "vh": 0.5, "feature_stride": 2,
               "cav_lidar_range": LIDAR_RANGE}
POSTPROCESS = {
    "anchor_args": ANCHOR_ARGS,
    "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                    "score_threshold": 0.25},
    "order": "hwl", "max_num": 100, "nms_thresh": 0.15,
    "gt_range": LIDAR_RANGE,
    "dir_args": {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]},
}


def test_uncertainty_model_and_loss(rng):
    model = build_model({"core_method": "point_pillar_uncertainty",
                         "args": MODEL_ARGS})
    dataset = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                              lidar_range=LIDAR_RANGE, agent_spread=4.0,
                              object_spread=0.5)
    batcher = IntermediateFusionBatcher(max_cav=2, max_points=2000,
                                        max_objects=16,
                                        lidar_range=LIDAR_RANGE)
    batch = batcher.assemble([dataset[0], dataset[1]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    assert out["unc_preds"].shape == (4, 32, 32, 6)  # B*L, H/2, W/2, 3*A

    loss_fn = build_loss({
        "core_method": "point_pillar_uncertainty_loss",
        "args": {
            "pos_cls_weight": 2.0,
            "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
            "reg": {"sigma": 3.0, "weight": 2.0},
            "uncertainty": {"dim": 3, "weight": 1.0, "angle_weight": 1.0,
                            "xy_loss_type": "l2",
                            "angle_loss_type": "von-mise",
                            "lambda_V": 0.001, "s0": 1.0,
                            "limit_period": True},
        },
    })
    b, h, w, _ = out["cls_preds"].shape
    targets = {
        "pos_equal_one": jnp.zeros((b, h, w, 2)).at[:, 3, 3, 0].set(1.0),
        "neg_equal_one": jnp.ones((b, h, w, 2)).at[:, 3, 3, 0].set(0.0),
        "targets": jnp.zeros((b, h, w, 14)),
    }
    total, metrics = loss_fn(out, targets)
    assert np.isfinite(float(total))
    assert "unc_loss" in metrics and np.isfinite(float(metrics["unc_loss"]))


def test_stage1_fn_shapes(rng):
    model = build_model({"core_method": "point_pillar_uncertainty",
                         "args": MODEL_ARGS})
    spec = make_anchor_spec(ANCHOR_ARGS, POSTPROCESS["target_args"], "hwl")
    dataset = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                              lidar_range=LIDAR_RANGE, agent_spread=4.0,
                              object_spread=0.5)
    batcher = IntermediateFusionBatcher(max_cav=2, max_points=2000,
                                        max_objects=16,
                                        lidar_range=LIDAR_RANGE)
    batch = batcher.assemble([dataset[0], dataset[1]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    stage1 = make_stage1_fn(model, spec.anchors, POSTPROCESS, max_boxes=8)
    dets = stage1(variables, batch)
    assert dets["box_poses"].shape == (2, 2, 8, 3)
    assert dets["box_mask"].shape == (2, 2, 8)
    assert dets["uncertainty"].shape == (2, 2, 8, 3)


def test_correct_batch_poses_improves_pairwise(rng):
    """Feed oracle stage-1 detections: pose correction must recover the
    clean pairwise transforms from noisy ones."""
    l, k = 3, 10
    dataset = SyntheticScenes(num_frames=4, num_agents=l, num_objects=k,
                              lidar_range=[-40, -40, -3, 40, 40, 1],
                              agent_spread=10.0)
    batcher = IntermediateFusionBatcher(max_cav=l, max_points=4000,
                                        max_objects=16,
                                        lidar_range=[-40, -40, -3, 40, 40, 1],
                                        pos_std=0.4, rot_std=2.0)
    batch = batcher.assemble([dataset[i] for i in range(4)])

    # oracle stage-1 boxes: world gt projected into each agent's CLEAN frame
    box_poses = np.zeros((4, l, k, 3), dtype=np.float32)
    box_mask = np.zeros((4, l, k), dtype=bool)
    for bi in range(4):
        frame = dataset[bi]
        gt = frame["objects"]["boxes"]
        for a in range(l):
            t_aw = np.asarray(inverse_tfm(pose_to_tfm(
                frame["agents"][a]["pose"])))
            for j in range(min(k, len(gt))):
                xy1 = t_aw @ np.array([gt[j, 0], gt[j, 1], gt[j, 2], 1.0])
                yaw_a = gt[j, 6] - np.deg2rad(frame["agents"][a]["pose"][4])
                box_poses[bi, a, j] = [xy1[0], xy1[1], yaw_a]
                box_mask[bi, a, j] = True
    unc = np.full((4, l, k, 3), -3.0, dtype=np.float32)

    jbatch = {key: jnp.asarray(v) for key, v in batch.items()}
    corrected = correct_batch_poses(
        jbatch, {"box_poses": jnp.asarray(box_poses),
                 "box_mask": jnp.asarray(box_mask),
                 "uncertainty": jnp.asarray(unc)},
        BoxAlignConfig(abandon_hard_cases=False))

    clean_pair = np.asarray(get_pairwise_transformation(
        batch["lidar_pose_clean"], batch["agent_mask"]))
    noisy_err = np.abs(batch["pairwise_t_matrix"][..., :2, 3]
                       - clean_pair[..., :2, 3]).max()
    corr_err = np.abs(np.asarray(corrected["pairwise_t_matrix"])[..., :2, 3]
                      - clean_pair[..., :2, 3]).max()
    assert noisy_err > 0.3
    assert corr_err < noisy_err * 0.3, (noisy_err, corr_err)


def test_stage1_content_arrays_truncate_long_uncertainty():
    """Json dumped with a larger max_boxes than it is loaded with must
    truncate, not crash (advisor round-1 finding: reshape before slice)."""
    import numpy as np

    from coalign_tpu.tools.stage1 import stage1_content_to_arrays

    n = 48  # dumped with max_boxes=48
    content = {"0": [{
        "box_poses": np.random.default_rng(0).normal(size=(n, 3)).tolist(),
        "uncertainty": np.random.default_rng(1).normal(size=(n, 3)).tolist(),
    }]}
    out = stage1_content_to_arrays(content, [0], max_cav=2, max_boxes=24)
    assert out["box_poses"].shape == (1, 2, 24, 3)
    assert out["uncertainty"].shape == (1, 2, 24, 3)
    assert bool(np.asarray(out["box_mask"])[0, 0].all())
    np.testing.assert_allclose(
        np.asarray(out["uncertainty"])[0, 0],
        np.asarray(content["0"][0]["uncertainty"], np.float32)[:24],
        rtol=1e-6)

"""FPV-RCNN two-stage detector: RoI ops oracles, matcher, forward, loss."""

import jax

from conftest import jit_apply, jit_init
import jax.numpy as jnp
import numpy as np

from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
from coalign_tpu.models import build_model
from coalign_tpu.models.matcher import match_and_fuse
from coalign_tpu.ops.roi import (farthest_point_sample,

                                 points_in_rotated_boxes, roi_grid_points,
                                 roi_grid_pool)

LIDAR_RANGE = [-16.0, -16.0, -3.0, 16.0, 16.0, 1.0]
VOXEL = [0.4, 0.4, 0.5]


def test_points_in_rotated_boxes_oracle():
    boxes = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 4.0, np.pi / 2]])
    # yaw 90deg: length (4) now spans y, width (2) spans x
    pts = jnp.asarray([[0.0, 1.9, 0.0],   # inside (|v|=1.9 < l/2=2)
                       [1.9, 0.0, 0.0],   # outside (u along width/2=1)
                       [0.9, 0.0, 0.0],   # inside
                       [0.0, 0.0, 1.2]])  # outside in z (h/2=1)
    m = np.asarray(points_in_rotated_boxes(pts, boxes))[0]
    assert m.tolist() == [True, False, True, False]


def test_roi_grid_points_stay_inside():
    boxes = jnp.asarray([[2.0, -1.0, 0.0, 1.5, 1.8, 4.2, 0.7]])
    pts = np.asarray(roi_grid_points(boxes, 6))[0]
    pts3 = np.concatenate([pts, np.zeros((len(pts), 1))], -1)
    inside = np.asarray(points_in_rotated_boxes(
        jnp.asarray(pts3), boxes))[0]
    assert inside.all()


def test_roi_grid_pool_reads_bev():
    h = w = 80
    feat = np.zeros((h, w, 2), dtype=np.float32)
    feat[:, :, 0] = np.arange(w)[None, :]  # channel 0 = column index
    box = jnp.asarray([[0.0, 0.0, 0.0, 1.5, 2.0, 4.0, 0.0]])
    pooled = np.asarray(roi_grid_pool(jnp.asarray(feat), box, LIDAR_RANGE,
                                      VOXEL, 1, grid_size=4))
    # box at origin -> col ~ (0+16)/0.4 = 40
    assert abs(pooled[0, :, 0].mean() - 39.5) < 1.5


def test_farthest_point_sample_spreads():
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.normal(0, 0.1, (50, 3)),
        rng.normal(10, 0.1, (50, 3)),
        rng.normal(-10, 0.1, (50, 3))]).astype(np.float32)
    mask = np.ones(150, dtype=bool)
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts),
                                           jnp.asarray(mask), 3))
    clusters = {int(pts[i, 0] // 5) for i in idx}
    assert len(clusters) == 3  # one sample from each cluster


def test_match_and_fuse_clusters_across_agents():
    # two agents see the same two objects with small offsets
    boxes = np.zeros((6, 7), dtype=np.float32)
    boxes[0] = [5.0, 5.0, 0, 1.5, 2.0, 4.0, 0.1]
    boxes[1] = [5.2, 5.1, 0, 1.5, 2.0, 4.0, 0.12]   # same object, agent 2
    boxes[2] = [-5.0, -5.0, 0, 1.5, 2.0, 4.0, -0.5]
    boxes[3] = [-5.1, -4.9, 0, 1.5, 2.0, 4.0, -0.48]
    scores = np.array([0.9, 0.7, 0.8, 0.6, 0.0, 0.0], dtype=np.float32)
    valid = np.array([1, 1, 1, 1, 0, 0], dtype=bool)
    out = match_and_fuse(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(valid), 0.1, max_keep=4)
    m = np.asarray(out["mask"])
    fb = np.asarray(out["boxes"])[m]
    assert len(fb) == 2
    # fused centers sit between the member boxes
    d0 = np.linalg.norm(fb[:, :2] - [5.1, 5.05], axis=1).min()
    d1 = np.linalg.norm(fb[:, :2] - [-5.05, -4.95], axis=1).min()
    assert d0 < 0.1 and d1 < 0.1


def _batch(num_agents=2):
    ds = SyntheticScenes(num_frames=1, num_agents=num_agents, num_objects=3,
                         lidar_range=LIDAR_RANGE, points_per_object=48,
                         ground_points=128, seed=5)
    b = IntermediateFusionBatcher(max_cav=num_agents, max_points=512,
                                  max_objects=8, lidar_range=LIDAR_RANGE)
    return {k: jnp.asarray(v) for k, v in b.assemble([ds[0]]).items()}


def test_fpvrcnn_forward_and_loss():
    args = {
        "voxel_size": VOXEL, "lidar_range": LIDAR_RANGE, "anchor_number": 2,
        "anchor_args": {"W": 80, "H": 80, "l": 3.9, "w": 1.6, "h": 1.56,
                        "r": [0, 90], "vw": 0.4, "vh": 0.4,
                        "feature_stride": 8,
                        "cav_lidar_range": LIDAR_RANGE},
        "stage1_postprocess": {"score_threshold": 0.1, "nms_thresh": 0.15,
                               "max_boxes": 8},
        "max_rois": 8, "roi_grid_size": 4, "roi_hidden": 64,
        "ssfa": {"feature_num": 64},
    }
    model = build_model({"core_method": "fpvrcnn", "args": args})
    batch = _batch()
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    assert out["rois"].shape == (1, 8, 7)
    assert out["boxes_refined"].shape == (1, 8, 7)
    assert out["cls_preds_single"].shape[0] == 2
    assert np.isfinite(np.asarray(out["boxes_refined"])).all()

    from coalign_tpu.loss import build_loss
    loss_fn = build_loss({
        "core_method": "fpvrcnn_loss",
        "args": {"pos_cls_weight": 2.0,
                 "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
                 "reg": {"sigma": 3.0, "weight": 2.0},
                 "stage2": {"stage": 2}}})
    labels = {"gt_boxes": batch["gt_boxes"], "gt_mask": batch["gt_mask"]}
    total, metrics = loss_fn(out, labels)
    assert np.isfinite(float(total))
    assert "stage2_cls" in metrics


def test_fpvrcnn_vsa_keypoint_stage2():
    """Keypoint stage 2 (ref vsa.py + roi_head.py): FPS keypoints,
    ball-query features, CPM merge across agents, RoI ball-query pooling —
    the full reference architecture, forward + loss finite."""
    args = {
        "voxel_size": VOXEL, "lidar_range": LIDAR_RANGE, "anchor_number": 2,
        "anchor_args": {"W": 80, "H": 80, "l": 3.9, "w": 1.6, "h": 1.56,
                        "r": [0, 90], "vw": 0.4, "vh": 0.4,
                        "feature_stride": 8,
                        "cav_lidar_range": LIDAR_RANGE},
        "stage1_postprocess": {"score_threshold": 0.1, "nms_thresh": 0.15,
                               "max_boxes": 8},
        "max_rois": 8, "roi_hidden": 64,
        "ssfa": {"feature_num": 64},
        "vsa": {
            "enlarge_selection_boxes": True,
            "num_keypoints": 64,
            "num_out_features": 16,
            "features_source": ["bev", "raw_points"],
            "sa_layer": {"raw_points": {"mlps": [[8, 8], [8, 8]],
                                        "pool_radius": [0.4, 0.8],
                                        "n_sample": [8, 8]}},
        },
        "roi_head": {"roi_grid_pool": {"grid_size": 4,
                                       "mlps": [[16, 16], [16, 16]],
                                       "pool_radius": [0.8, 1.6],
                                       "n_sample": [8, 8]}},
    }
    model = build_model({"core_method": "fpvrcnn", "args": args})
    batch = _batch()
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    assert out["rois"].shape == (1, 8, 7)
    assert out["boxes_refined"].shape == (1, 8, 7)
    assert np.isfinite(np.asarray(out["boxes_refined"])).all()
    assert np.isfinite(np.asarray(out["roi_cls"])).all()

    from coalign_tpu.loss import build_loss
    loss_fn = build_loss({
        "core_method": "fpvrcnn_loss",
        "args": {"pos_cls_weight": 2.0,
                 "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
                 "reg": {"sigma": 3.0, "weight": 2.0},
                 "stage2": {"stage": 2}}})
    labels = {"gt_boxes": batch["gt_boxes"], "gt_mask": batch["gt_mask"]}
    total, _ = loss_fn(out, labels)
    assert np.isfinite(float(total))
    # gradients flow end-to-end through the keypoint path
    def loss_of(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"])
        t, _ = loss_fn(o, labels)
        return t
    grads = jax.jit(jax.grad(loss_of))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    gnorm = sum(float(np.abs(np.asarray(leaf)).sum()) for leaf in leaves)
    assert gnorm > 0


def test_fpvrcnn_cli_train_inference_roundtrip(tmp_path):
    """Full two-stage workflow through the CLI: per-agent stage-1 labels
    (supervise_single path in make_train_step) + the RoI-refined decode in
    evaluate (post_process_refined_frame) — neither is reachable from the
    module-level tests above."""
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
                         "hypes_yaml", "opv2v", "fpvrcnn.yaml")
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
    cfg = str(tmp_path / "fpvrcnn.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(base, f)
    model_dir = str(tmp_path / "run")
    state, res = run_main(["train", "-y", cfg, "--model_dir", model_dir,
                           "--epochs", "1", "--eval_frames", "1"])
    assert np.isfinite(res["ap30"])
    res2 = run_main(["inference", "--model_dir", model_dir,
                     "--eval_frames", "1"])
    assert np.isfinite(res2["ap30"])

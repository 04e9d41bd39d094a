"""Golden parity at PUBLISHED scale: one 200x704 / L=5 flagship frame.

Every other golden fixture runs at 64x64/2-agent toy scale; the round-2
bf16-coordinate bug class (BEV pixel coordinates > 256 losing mantissa
bits) only manifests at wide grids, so this anchors the full-scale regime:
the reference's complete forward (point_pillar_baseline_multiscale.py:93-135
at pointpillar_coalign.yaml shapes) + post_process chain
(voxel_postprocessor.py:243-402) recorded once offline
(generate_fixtures.gen_fullscale), replayed here through our jitted
pipeline with the imported checkpoint. Gates activation parity on the
head maps AND box-set identity after decode + NMS.
"""

import os

from conftest import jit_init

import jax
import numpy as np

import jax.numpy as jnp

from coalign_tpu.inference import make_infer_fn
from coalign_tpu.models import build_model
from coalign_tpu.postprocess.anchors import generate_anchor_box
from coalign_tpu.utils.iou import rotated_iou_corners

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

FULL_ARGS = {
    "voxel_size": [0.4, 0.4, 4.0],
    "lidar_range": [-140.8, -40.0, -3.0, 140.8, 40.0, 1.0],
    "anchor_number": 2,
    "pillar_vfe": {"use_norm": True, "with_distance": False,
                   "use_absolute_xyz": True, "num_filters": [64],
                   "pad_parity": True},
    "point_pillar_scatter": {"num_features": 64},
    "base_bev_backbone": {"layer_nums": [3, 5, 8], "layer_strides": [2, 2, 2],
                          "num_filters": [64, 128, 256],
                          "upsample_strides": [1, 2, 4],
                          "num_upsample_filter": [128, 128, 128],
                          "resnet": True},
    "fusion_method": "att",
    "att": {"feat_dim": [64, 128, 256]},
    "shrink_header": {"kernal_size": [3], "stride": [1], "padding": [1],
                      "dim": [256], "input_dim": 384},
    "dir_args": {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]},
}

ANCHOR_ARGS = {"W": 704, "H": 200, "l": 3.9, "w": 1.6, "h": 1.56,
               "r": [0, 90], "num": 2, "feature_stride": 2,
               "vw": 0.4, "vh": 0.4, "vd": 4.0,
               "cav_lidar_range": FULL_ARGS["lidar_range"]}


def test_fullscale_golden_parity():
    from coalign_tpu.utils.ckpt_import import load_reference_checkpoint

    io = np.load(os.path.join(GOLDEN, "fullscale_io.npz"))
    l = io["pairwise"].shape[1]
    n = max(len(io[f"points_{a}"]) for a in range(l))
    points = np.zeros((1, l, n, 4), np.float32)
    pmask = np.zeros((1, l, n), bool)
    for a in range(l):
        pts = io[f"points_{a}"]
        points[0, a, :len(pts)] = pts
        pmask[0, a, :len(pts)] = True
    batch = {"points": jnp.asarray(points),
             "point_mask": jnp.asarray(pmask),
             "agent_mask": jnp.ones((1, l), bool),
             "pairwise_t_matrix": jnp.asarray(io["pairwise"]),
             "transformation_matrix": jnp.eye(4)[None]}

    model = build_model({"core_method": "point_pillar_baseline_multiscale",
                         "args": FULL_ARGS})
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    variables = load_reference_checkpoint(
        os.path.join(GOLDEN, "fullscale_multiscale.pth"), variables)

    # 1) activation parity on the raw head maps (NHWC here vs NCHW ref)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    for key in ("cls_preds", "reg_preds", "dir_preds"):
        got = np.asarray(out[key][0]).transpose(2, 0, 1)
        want = io[key][0]
        err = np.max(np.abs(got - want))
        assert err < 2e-3, f"{key} max err {err:.2e} at full scale"

    # 2) box-set identity through decode + dir fix + NMS + range mask
    cfg = {"target_args": {"score_threshold": float(io["score_threshold"])},
           "nms_thresh": float(io["nms_thresh"]),
           "gt_range": FULL_ARGS["lidar_range"],
           "dir_args": FULL_ARGS["dir_args"],
           "order": "hwl", "max_num": 100}
    anchors = generate_anchor_box(ANCHOR_ARGS, order="hwl")
    infer = make_infer_fn(model, anchors, cfg)
    dets = jax.tree_util.tree_map(np.asarray, infer(variables, batch))
    keep = dets["mask"][0]
    ours_c, ours_s = dets["corners3d"][0][keep], dets["scores"][0][keep]
    ref_c, ref_s = io["pred_corners"], io["pred_scores"]
    assert len(ours_c) == len(ref_c), (
        f"box count {len(ours_c)} vs reference {len(ref_c)}")
    iou = rotated_iou_corners(ref_c[:, :4, :2].astype(np.float32),
                              ours_c[:, :4, :2].astype(np.float32), xp=np)
    taken = np.zeros(len(ours_c), bool)
    for i in range(len(ref_c)):
        masked = np.where(taken, -1.0, iou[i])
        j = int(np.argmax(masked))
        taken[j] = True
        assert masked[j] > 0.95, f"ref box {i}: best IoU {masked[j]:.3f}"
        assert abs(ref_s[i] - ours_s[j]) < 1e-3, (
            f"ref box {i}: score diff {abs(ref_s[i] - ours_s[j]):.2e}")

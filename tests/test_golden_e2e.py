"""END-TO-END golden AP parity against the reference's full inference chain.

The north-star gate: tests/golden/e2e_ap_io.npz records the reference
pipeline's COMPLETE points -> boxes -> AP replay (spconv-equivalent
voxelize -> flagship CoAlign forward with the recorded checkpoint ->
voxel_postprocessor.post_process -> eval_utils AP; see
generate_fixtures.gen_e2e_ap, ref opencood/tools/inference_utils.py:122,
voxel_postprocessor.py:243-402, eval_utils.py:45-145). This test feeds the
SAME raw points + the SAME imported checkpoint through our jitted
pipeline (make_infer_fn: forward + decode + dir fix + NMS + range mask in
one program) and gates:

  * box-set identity per frame (same count, 1:1 BEV IoU > 0.95 greedy
    match, scores within 1e-3);
  * |dAP| <= 0.5 pt at IoU 0.3 / 0.5 / 0.7.

Any decode/NMS/eval convention drift now trips here, not in a paper table.
"""

import os

from conftest import jit_init

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.inference import make_infer_fn
from coalign_tpu.models import build_model
from coalign_tpu.postprocess.anchors import generate_anchor_box
from coalign_tpu.utils import eval_utils as E
from coalign_tpu.utils.ckpt_import import load_reference_checkpoint
from coalign_tpu.utils.iou import rotated_iou_corners

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

TINY_ARGS = {
    "voxel_size": [0.4, 0.4, 4.0],
    "lidar_range": [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0],
    "anchor_number": 2,
    "pillar_vfe": {"use_norm": True, "with_distance": False,
                   "use_absolute_xyz": True, "num_filters": [64],
                   "pad_parity": True},
    "point_pillar_scatter": {"num_features": 64},
    "base_bev_backbone": {"layer_nums": [2, 2], "layer_strides": [2, 2],
                          "num_filters": [32, 64], "upsample_strides": [1, 2],
                          "num_upsample_filter": [64, 64], "resnet": True},
    "shrink_header": {"kernal_size": [3], "stride": [1], "padding": [1],
                      "dim": [64], "input_dim": 128},
    "dir_args": {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]},
    "fusion_method": "att",
    "att": {"feat_dim": [32, 64]},
}

ANCHOR_ARGS = {"W": 64, "H": 64, "l": 3.9, "w": 1.6, "h": 1.56,
               "r": [0, 90], "num": 2, "feature_stride": 2,
               "vw": 0.4, "vh": 0.4, "vd": 4.0,
               "cav_lidar_range": TINY_ARGS["lidar_range"]}


def _match_box_sets(ours_c, ours_s, ref_c, ref_s):
    """Greedy 1:1 match; returns list of (iou, ds) per reference box."""
    assert len(ours_c) == len(ref_c), (
        f"box count mismatch: ours {len(ours_c)} vs reference {len(ref_c)}")
    iou = rotated_iou_corners(ref_c[:, :4, :2].astype(np.float32),
                              ours_c[:, :4, :2].astype(np.float32), xp=np)
    taken = np.zeros(len(ours_c), bool)
    pairs = []
    for i in range(len(ref_c)):
        masked = np.where(taken, -1.0, iou[i])
        j = int(np.argmax(masked))
        taken[j] = True
        pairs.append((float(masked[j]), abs(float(ref_s[i] - ours_s[j]))))
    return pairs


def test_e2e_ap_parity_with_reference_pipeline():
    io = np.load(os.path.join(GOLDEN, "e2e_ap_io.npz"))
    n_frames = int(io["num_frames"])
    cfg = {
        "target_args": {"score_threshold": float(io["score_threshold"])},
        "nms_thresh": float(io["nms_thresh"]),
        "gt_range": TINY_ARGS["lidar_range"],
        "dir_args": TINY_ARGS["dir_args"],
        "order": "hwl", "max_num": 100,
    }
    anchors = generate_anchor_box(ANCHOR_ARGS, order="hwl")
    model = build_model({"core_method": "point_pillar_baseline_multiscale",
                         "args": TINY_ARGS})

    def frame_batch(i):
        n = 512
        points = np.zeros((1, 2, n, 4), np.float32)
        pmask = np.zeros((1, 2, n), bool)
        for a, key in enumerate((f"ego_points_{i}", f"cav_points_{i}")):
            pts = io[key]
            points[0, a, :len(pts)] = pts
            pmask[0, a, :len(pts)] = True
        return {"points": jnp.asarray(points),
                "point_mask": jnp.asarray(pmask),
                "agent_mask": jnp.ones((1, 2), bool),
                "pairwise_t_matrix": jnp.asarray(io[f"pairwise_{i}"]),
                "transformation_matrix": jnp.eye(4)[None]}

    batch0 = frame_batch(0)
    variables = jit_init(model, jax.random.PRNGKey(0), batch0, train=False)
    variables = load_reference_checkpoint(
        os.path.join(GOLDEN, "coalign_multiscale.pth"), variables)
    infer = make_infer_fn(model, anchors, cfg)

    stat = E.new_result_stat()
    for i in range(n_frames):
        dets = jax.tree_util.tree_map(np.asarray,
                                      infer(variables, frame_batch(i)))
        keep = dets["mask"][0]
        ours_c = dets["corners3d"][0][keep]
        ours_s = dets["scores"][0][keep]
        ref_c = io[f"pred_corners_{i}"]
        ref_s = io[f"pred_scores_{i}"]

        pairs = _match_box_sets(ours_c, ours_s, ref_c, ref_s)
        for iou, ds in pairs:
            assert iou > 0.95, f"frame {i}: unmatched box (best IoU {iou})"
            assert ds < 1e-3, f"frame {i}: score drift {ds}"

        gt_c = io[f"gt_corners_{i}"]
        for t in (0.3, 0.5, 0.7):
            E.accumulate_tp_fp(ours_c, ours_s, gt_c, stat, t)

    res = E.eval_final_results(stat)
    for key, t in (("ap30", 30), ("ap50", 50), ("ap70", 70)):
        ref_ap = float(io[f"ap{t}"])
        assert abs(res[key] - ref_ap) <= 0.005, (
            f"{key}: ours {res[key]:.4f} vs reference {ref_ap:.4f}")

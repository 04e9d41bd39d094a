"""Stage-2 ablation: VSA keypoint pooling vs BEV grid pooling (FPV-RCNN).

Trains the same tiny FPV-RCNN twice on the synthetic oracle scenes — once
with the reference-architecture keypoint stage 2 (models/vsa.py +
ops/pointnet2.py), once with the BEV-grid stage 2 — and reports stage-1
vs refined AP for both. Documents the VERDICT round-1 ask: show the two
stage-2 designs are interchangeable at matched budgets.

Run: python examples/vsa_ablation.py   (CPU ok; ~10 min)
"""

import json
import time

import numpy as np

LIDAR_RANGE = [-16.0, -16.0, -3.0, 16.0, 16.0, 1.0]
VOXEL = [0.4, 0.4, 0.5]

BASE_ARGS = {
    "voxel_size": VOXEL, "lidar_range": LIDAR_RANGE, "anchor_number": 2,
    "anchor_args": {"W": 80, "H": 80, "l": 3.9, "w": 1.6, "h": 1.56,
                    "r": [0, 90], "vw": 0.4, "vh": 0.4,
                    "feature_stride": 8, "cav_lidar_range": LIDAR_RANGE},
    "stage1_postprocess": {"score_threshold": 0.15, "nms_thresh": 0.15,
                           "max_boxes": 12},
    "max_rois": 12, "roi_hidden": 64, "ssfa": {"feature_num": 64},
}
VSA_EXTRA = {
    "vsa": {"enlarge_selection_boxes": True, "num_keypoints": 256,
            "num_out_features": 16,
            "features_source": ["bev", "raw_points"],
            "sa_layer": {"raw_points": {"mlps": [[8, 8], [8, 8]],
                                        "pool_radius": [0.4, 0.8],
                                        "n_sample": [8, 8]}}},
    "roi_head": {"roi_grid_pool": {"grid_size": 4,
                                   "mlps": [[16, 16], [16, 16]],
                                   "pool_radius": [0.8, 1.6],
                                   "n_sample": [8, 8]}},
}


def run_variant(name, args, steps=250):
    import jax
    import jax.numpy as jnp

    from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
    from coalign_tpu.loss import build_loss
    from coalign_tpu.models import build_model
    from coalign_tpu.train import build_optimizer, create_train_state
    from coalign_tpu.utils import box_utils as B
    from coalign_tpu.utils import eval_utils as E

    ds = SyntheticScenes(num_frames=4, num_agents=2, num_objects=3,
                         lidar_range=LIDAR_RANGE, points_per_object=96,
                         ground_points=256, object_spread=0.55, seed=5)
    batcher = IntermediateFusionBatcher(max_cav=2, max_points=1024,
                                        max_objects=8,
                                        lidar_range=LIDAR_RANGE)
    batch = {k: jnp.asarray(v)
             for k, v in batcher.assemble([ds[i] for i in range(4)]).items()}
    model = build_model({"core_method": "fpvrcnn", "args": args})
    loss_fn = build_loss({
        "core_method": "fpvrcnn_loss",
        "args": {"pos_cls_weight": 2.0,
                 "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
                 "reg": {"sigma": 3.0, "weight": 2.0},
                 "stage2": {"stage": 2}}})
    tx = build_optimizer({"lr": 2e-3, "args": {"eps": 1e-10}}, None)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    labels = {"gt_boxes": batch["gt_boxes"], "gt_mask": batch["gt_mask"]}

    @jax.jit
    def step(state, batch):
        def loss_of(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"])
            total, metrics = loss_fn(out, labels)
            return total, (metrics, mutated["batch_stats"])
        grads, (metrics, stats) = jax.grad(loss_of, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads)
        return state.replace(batch_stats=stats), metrics

    t0 = time.time()
    for i in range(steps):
        state, metrics = step(state, batch)
    train_s = time.time() - t0

    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats}, batch, train=False)

    def ap_of(corners_scores):
        stat = E.new_result_stat()
        for bi in range(batch["gt_boxes"].shape[0]):
            det_c, det_s = corners_scores(bi)
            gt = np.asarray(batch["gt_boxes"][bi])[
                np.asarray(batch["gt_mask"][bi])]
            gt_c = np.asarray(B.boxes_to_corners_3d(gt, "hwl"))
            E.accumulate_tp_fp(det_c, det_s, gt_c, stat, 0.5)
        return E.eval_final_results(stat)["ap50"]

    def refined(bi):
        keep = np.asarray(out["roi_mask"][bi]) > 0
        boxes = np.asarray(out["boxes_refined"][bi])[keep]
        scores = np.asarray(out["scores_refined"][bi])[keep]
        return np.asarray(B.boxes_to_corners_3d(boxes, "hwl")), scores

    def stage1(bi):
        keep = np.asarray(out["roi_mask"][bi]) > 0
        boxes = np.asarray(out["rois"][bi])[keep]
        scores = np.asarray(out["roi_scores"][bi])[keep]
        return np.asarray(B.boxes_to_corners_3d(boxes, "hwl")), scores

    res = {"variant": name, "steps": steps,
           "train_s": round(train_s, 1),
           "loss_final": round(float(metrics["total_loss"]), 3),
           "ap50_stage1": round(float(ap_of(stage1)), 3),
           "ap50_refined": round(float(ap_of(refined)), 3)}
    print(json.dumps(res))
    return res


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    bev = run_variant("bev_grid", {**BASE_ARGS, "roi_grid_size": 4})
    vsa = run_variant("vsa_keypoints", {**BASE_ARGS, **VSA_EXTRA})
    print(json.dumps({"ablation": [bev, vsa]}))


if __name__ == "__main__":
    main()

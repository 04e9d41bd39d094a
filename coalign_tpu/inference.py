"""Inference / evaluation loop: jitted forward + post-process, AP accumulation.

TPU-first rework of opencood/tools/inference.py:40-227 +
inference_utils.inference_intermediate_fusion: the model forward AND the
full post-processing (decode -> dir fix -> NMS -> range mask) run as one
jitted program per batch; only the final fixed-size (max_keep) box tensors
come back to the host for AP accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.postprocess.decode import post_process_frame
from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils import eval_utils as E


def _map_frames(fn, *args):
    """Apply a per-frame fn over the leading batch dim.

    Small batches UNROLL (a static python loop) instead of vmap: the
    vmapped decode's batched gathers/sorts measure ~6% slower e2e on a
    v5e at B=4 (97.1 vs 91.3 ms, OPV2V scale) — with the unroll, batch
    scaling is flat to B=8, i.e. the chip is genuinely saturated at B=1.
    Large batches keep vmap to bound program size.
    """
    n = args[0].shape[0]
    if n > 8:
        return jax.vmap(fn)(*args)
    frames = [fn(*(a[i] for a in args)) for i in range(n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *frames)


def make_infer_fn(model, anchors, postprocess_cfg: dict):
    """Returns a jitted (variables, batch) -> per-frame detections fn.

    ``anchors`` is the (H, W, A, 7) anchor grid, or a DenseBevSpec for the
    anchor-free PIXOR family (decoded via decode_dense_map).
    """
    from coalign_tpu.postprocess.dense_bev import (DenseBevSpec,
                                                   decode_dense_map)

    score_thr = float(postprocess_cfg["target_args"]["score_threshold"])
    nms_thr = float(postprocess_cfg["nms_thresh"])
    gt_range = tuple(postprocess_cfg["gt_range"])
    dir_args = postprocess_cfg.get("dir_args", {})
    dir_offset = float(dir_args.get("dir_offset", 0.7853))
    num_bins = int(dir_args.get("num_bins", 2))

    if isinstance(anchors, DenseBevSpec):
        dense_spec = anchors

        @jax.jit
        def infer_dense(variables, batch):
            out = model.apply(variables, batch, train=False)

            def per_frame(cls_m, reg_m, tfm):
                det = decode_dense_map(cls_m, reg_m, dense_spec,
                                       score_threshold=score_thr,
                                       nms_threshold=nms_thr)
                boxes = B.project_boxes7_by_tfm(det["boxes"], tfm, "hwl")
                corners = B.boxes_to_corners_3d(boxes, "hwl")
                keep = det["valid"]
                return {"corners3d": corners * keep[:, None, None],
                        "boxes7": boxes * keep[:, None],
                        "scores": jnp.where(keep, det["scores"], 0.0),
                        "mask": keep}

            return _map_frames(per_frame, out["cls_map"], out["reg_map"],
                               batch["transformation_matrix"])

        return infer_dense

    anchors = jnp.asarray(anchors)

    @jax.jit
    def infer(variables, batch):
        out = model.apply(variables, batch, train=False)

        if "cls_preds" not in out and "boxes_refined" in out:
            # two-stage families (fpvrcnn/fvoxelrcnn) emit RoI-refined
            # boxes, not anchor maps (ref fpvrcnn_postprocessor.py:21-246)
            from coalign_tpu.postprocess.decode import (
                post_process_refined_frame)

            def per_frame2(b7, cls, rm, tfm):
                return post_process_refined_frame(
                    b7, cls, rm, tfm, score_threshold=score_thr,
                    nms_threshold=nms_thr, gt_range=gt_range)

            return _map_frames(
                per_frame2, out["boxes_refined"], out["roi_cls"],
                out["roi_mask"], batch["transformation_matrix"])

        def per_frame(cls_p, reg_p, dir_p, tfm):
            return post_process_frame(
                cls_p, reg_p, anchors, tfm, dir_preds=dir_p,
                score_threshold=score_thr, nms_threshold=nms_thr,
                gt_range=gt_range, dir_offset=dir_offset, num_bins=num_bins)

        dir_preds = out.get("dir_preds")
        if dir_preds is None:
            dir_preds = jnp.zeros(out["cls_preds"].shape[:-1]
                                  + (out["cls_preds"].shape[-1] * 2,))
        dets = _map_frames(
            per_frame, out["cls_preds"], out["reg_preds"], dir_preds,
            batch["transformation_matrix"])
        if "comm_rate" in out:  # where2comm bandwidth accounting
            dets["comm_rate"] = out["comm_rate"]
        return dets

    return infer


def make_late_infer_fn(model, anchors, postprocess_cfg: dict,
                       mode: str = "late"):
    """Late / no-fusion inference: the single-agent model runs once per
    agent, per-agent boxes are projected to ego via ``transformation_matrix``
    and joint NMS merges them (ref inference_utils.py:17
    inference_late_fusion / :97 inference_no_fusion).

    mode: 'late' (all agents) | 'no' (ego only) | 'no_w_uncertainty'.
    """
    from coalign_tpu.utils.nms import nms_rotated

    score_thr = float(postprocess_cfg["target_args"]["score_threshold"])
    nms_thr = float(postprocess_cfg["nms_thresh"])
    gt_range = tuple(postprocess_cfg["gt_range"])
    dir_args = postprocess_cfg.get("dir_args", {})
    dir_offset = float(dir_args.get("dir_offset", 0.7853))
    num_bins = int(dir_args.get("num_bins", 2))
    anchors = jnp.asarray(anchors)
    ego_only = mode.startswith("no")

    @jax.jit
    def infer(variables, batch):
        b, l = batch["agent_mask"].shape
        out = model.apply(variables, batch, train=False)

        def per_frame(cls_p, reg_p, dir_p, unc_p, tfm):
            return post_process_frame(
                cls_p, reg_p, anchors, tfm, dir_preds=dir_p, unc_preds=unc_p,
                score_threshold=score_thr, nms_threshold=nms_thr,
                gt_range=gt_range, dir_offset=dir_offset, num_bins=num_bins)

        dir_preds = out.get("dir_preds")
        if dir_preds is None:
            dir_preds = jnp.zeros(out["cls_preds"].shape[:-1]
                                  + (out["cls_preds"].shape[-1] * num_bins,))
        unc_preds = out.get("unc_preds")
        if unc_preds is None or "uncertainty" not in mode:
            unc_preds = jnp.zeros(out["cls_preds"].shape[:-1]
                                  + (out["cls_preds"].shape[-1] * 3,))
        tfm = batch["transformation_matrix"]
        if tfm.ndim == 3:  # (B, 4, 4) -> broadcast over agents
            tfm = jnp.broadcast_to(tfm[:, None], (b, l, 4, 4))
        dets = jax.vmap(per_frame)(
            out["cls_preds"], out["reg_preds"], dir_preds, unc_preds,
            tfm.reshape(b * l, 4, 4))
        # regroup agents: (B, L*K, ...) then joint NMS in ego frame
        k = dets["scores"].shape[-1]

        def regroup(x):
            return x.reshape((b, l * k) + x.shape[2:])

        valid = dets["mask"] & batch["agent_mask"].reshape(b * l)[:, None]
        if ego_only:
            ego = (jnp.arange(b * l) % l == 0)[:, None]
            valid = valid & ego
        corners = regroup(dets["corners3d"])
        scores = regroup(jnp.where(valid, dets["scores"], 0.0))
        vmask = regroup(valid)

        def joint(cor, sc, vm):
            order, keep = nms_rotated(cor[:, :4, :2], sc, vm, nms_thr)
            return {"corners3d": cor[order] * keep[:, None, None],
                    "scores": jnp.where(keep, sc[order], 0.0),
                    "mask": keep}

        return jax.vmap(joint)(corners, scores, vmask)

    return infer


def dump_detections_npy(dets: dict, batch: dict, out_dir: str, idx: int,
                        cav_box=None, lidar_agent_record=None):
    """Persist one batch's detections + gt for offline visualization
    (ref inference_utils.py:176 save npy files). For heterogeneous runs
    the per-CAV marker boxes + lidar-agent record ride along (ref
    tools/inference.py:195 attaches cav_box_np/lidar_agent_record)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    if cav_box is not None:
        np.save(os.path.join(out_dir, f"{idx:05d}_cav_box.npy"),
                np.asarray(cav_box))
        np.save(os.path.join(out_dir, f"{idx:05d}_lidar_agent.npy"),
                np.asarray(lidar_agent_record))
    np.save(os.path.join(out_dir, f"{idx:05d}_pred_corners.npy"),
            np.asarray(dets["corners3d"]))
    np.save(os.path.join(out_dir, f"{idx:05d}_pred_scores.npy"),
            np.asarray(dets["scores"]))
    np.save(os.path.join(out_dir, f"{idx:05d}_pred_mask.npy"),
            np.asarray(dets["mask"]))
    np.save(os.path.join(out_dir, f"{idx:05d}_gt_boxes.npy"),
            np.asarray(batch["gt_boxes"]))
    np.save(os.path.join(out_dir, f"{idx:05d}_gt_mask.npy"),
            np.asarray(batch["gt_mask"]))
    return out_dir


def evaluate(model, variables, batcher, dataset, anchors, postprocess_cfg,
             batch_size: int = 1, max_frames: int | None = None,
             fusion_method: str = "intermediate", npy_dir: str = None,
             vis_dir: str = None, vis_interval: int = 40,
             lidar_range=None, batch_hook=None, left_hand: bool = False,
             heter_selector=None):
    """Run the eval protocol, returns {'ap30','ap50','ap70'} (+ counts).

    fusion_method dispatch mirrors ref tools/inference.py:40-227:
    'intermediate' / 'early' decode the fused output; 'late', 'no',
    'no_w_uncertainty' run per-agent + joint NMS.

    batch_hook(batch, frame_ids) -> batch runs before inference — the
    offline CoAlign box_align correction hook (ref
    intermediate_fusion_dataset.py:301-328 rewrites lidar_pose per item
    from the precalc json before pairwise transforms).
    """
    if fusion_method in ("late", "no", "no_w_uncertainty", "single"):
        infer = make_late_infer_fn(
            model, anchors, postprocess_cfg,
            "no" if fusion_method == "single" else fusion_method)
    else:
        infer = make_infer_fn(model, anchors, postprocess_cfg)
    from coalign_tpu.data.prefetch import prefetch

    from coalign_tpu.utils.bandwidth import (frame_comm_bytes,
                                             summarize_bandwidth)

    stat = E.new_result_stat()
    frames = 0
    comm_bytes = 0.0
    # keep batches host-side (gt matching below is numpy) but assemble the
    # next frames while the device runs this one
    for bidx, batch in enumerate(prefetch(
            batcher.batches(dataset, batch_size, shuffle=False,
                            drop_last=False), size=2, to_device=False)):
        # tree_map, not a flat dict comprehension: camera batches nest
        # image_inputs
        if batch_hook is not None:
            rows = int(np.shape(batch["gt_boxes"])[0])
            batch = batch_hook(batch, list(range(
                bidx * batch_size, bidx * batch_size + rows)))
        dets = infer(variables, jax.tree.map(jnp.asarray, batch))
        dets = jax.tree_util.tree_map(np.asarray, dets)
        comm_bytes += frame_comm_bytes(
            fusion_method, batch, model=model,
            max_num=int(postprocess_cfg.get("max_num", 100)),
            comm_rate=dets.pop("comm_rate", None))
        if npy_dir:
            cav_box = record = None
            if heter_selector is not None:
                # per-CAV marker boxes in the ego frame + per-agent
                # modality record (ref inference_utils.py:266 get_cav_box,
                # attached when the dataset is heterogeneous)
                from coalign_tpu.utils.heter import get_cav_box
                amask = np.asarray(batch["agent_mask"][0])
                cav_box, record = get_cav_box(
                    np.asarray(batch["lidar_pose"][0]), amask,
                    heter_selector.select(int(amask.sum())))
            dump_detections_npy(dets, batch, npy_dir, bidx,
                                cav_box=cav_box,
                                lidar_agent_record=record)
        if vis_dir and bidx % max(vis_interval // batch_size, 1) == 0:
            import os

            from coalign_tpu.visualization import visualize

            os.makedirs(vis_dir, exist_ok=True)
            gt0 = batch["gt_boxes"][0][batch["gt_mask"][0]]
            gtc = np.asarray(B.boxes_to_corners_3d(gt0, "hwl"))
            pts = (batch["points"][0, 0][batch["point_mask"][0, 0]]
                   if "points" in batch else np.zeros((0, 3)))
            visualize(dets["corners3d"][0][dets["mask"][0]], gtc, pts,
                      lidar_range or postprocess_cfg["gt_range"],
                      os.path.join(vis_dir, f"bev_{bidx:05d}.png"),
                      method="bev", left_hand=left_hand)
        for bi in range(batch["gt_boxes"].shape[0]):
            keep = dets["mask"][bi]
            det_corners = dets["corners3d"][bi][keep]
            det_scores = dets["scores"][bi][keep]
            gt = batch["gt_boxes"][bi][batch["gt_mask"][bi]]
            gt_corners = np.asarray(B.boxes_to_corners_3d(gt, "hwl"))
            for t in (0.3, 0.5, 0.7):
                E.accumulate_tp_fp(det_corners, det_scores, gt_corners,
                                   stat, t)
            frames += 1
        if max_frames and frames >= max_frames:
            break
    result = E.eval_final_results(stat)
    result["frames"] = frames
    result.update(summarize_bandwidth(comm_bytes, frames))
    return result

"""Dense BEV (PIXOR) label generation and decoding, fully vectorized.

TPU-first rework of ref opencood/data_utils/post_processor/
bev_postprocessor.py: the reference builds label maps with per-box python
loops + point-in-polygon tests on the host; here membership of every output
pixel in every (padded) gt box is one broadcast test — rotate pixel centers
into each box frame and bounds-check — so label gen runs on device inside
the train step, like postprocess/anchors.assign_targets does for the
anchor-based models.

Label map contract (ref bev_postprocessor.py:34-205): (H, W, 7) per frame,
channel 0 = occupancy cls target, channels 1:7 = [cos yaw, sin yaw, dx, dy,
log w, log l] regression targets normalized by target_mean/std, where
(dx, dy) is the offset from the pixel center to the box center in meters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.ops.bev_raster import BevSpec
from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils.nms import nms_rotated

# ref bev_postprocessor.py:24-29
TARGET_MEAN = np.array([0.008, 0.001, 0.202, 0.2, 0.43, 1.368],
                       dtype=np.float32)
TARGET_STD = np.array([0.866, 0.5, 0.954, 0.668, 0.09, 0.111],
                      dtype=np.float32)


class DenseBevSpec(NamedTuple):
    bev: BevSpec
    target_mean: np.ndarray = TARGET_MEAN
    target_std: np.ndarray = TARGET_STD
    box_z: float = -1.0   # fixed z center / height for lifting 2D -> 3D
    box_h: float = 1.56


def _pixel_centers(spec: DenseBevSpec):
    """(H, W, 2) metric (x, y) centers of the downsampled label grid."""
    b = spec.bev
    step = b.res * b.downsample_rate
    h, w, _ = b.label_shape
    xs = b.L1 + (jnp.arange(h) + 0.5) * step
    ys = b.W1 + (jnp.arange(w) + 0.5) * step
    return jnp.stack(jnp.meshgrid(xs, ys, indexing="ij"), axis=-1)


def assign_dense_targets(gt_boxes, gt_mask, spec: DenseBevSpec):
    """Padded gt (M, 7 hwl) -> (H, W, 7) normalized label map. ONE frame.

    A pixel is positive if its center lies inside any gt box footprint;
    overlaps resolve to the *first* valid box (reference order-dependence).
    """
    centers = _pixel_centers(spec)                       # (H, W, 2)
    x, y = gt_boxes[:, 0], gt_boxes[:, 1]
    h_, w_, l_ = gt_boxes[:, 3], gt_boxes[:, 4], gt_boxes[:, 5]
    yaw = gt_boxes[:, 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)

    dx = centers[..., 0][..., None] - x                  # (H, W, M)
    dy = centers[..., 1][..., None] - y
    # rotate into box frame
    u = dx * c + dy * s
    v = -dx * s + dy * c
    inside = ((jnp.abs(u) <= l_ / 2) & (jnp.abs(v) <= w_ / 2)
              & gt_mask & (w_ > 0) & (l_ > 0))           # (H, W, M)

    any_pos = inside.any(-1)
    first = jnp.argmax(inside, axis=-1)                  # (H, W)

    tgt = jnp.stack([c, s, x, y, jnp.log(jnp.maximum(w_, 1e-3)),
                     jnp.log(jnp.maximum(l_, 1e-3))], axis=-1)  # (M, 6)
    reg = tgt[first]                                     # (H, W, 6)
    reg = reg.at[..., 2].add(-centers[..., 0])
    reg = reg.at[..., 3].add(-centers[..., 1])
    reg = (reg - jnp.asarray(spec.target_mean)) / jnp.asarray(
        spec.target_std)
    reg = reg * any_pos[..., None]
    del h_
    return jnp.concatenate([any_pos[..., None].astype(reg.dtype), reg],
                           axis=-1)


def decode_dense_map(cls_map, reg_map, spec: DenseBevSpec,
                     score_threshold=0.25, nms_threshold=0.15,
                     max_keep=100, pre_top_k=512):
    """(H, W, 1)+(H, W, 6) prediction maps -> fixed-size detections.

    sigmoid -> threshold -> denormalize -> per-pixel box decode -> rotated
    NMS; lifts 2D boxes to 7-dof hwl with the spec's fixed z/h
    (ref bev_postprocessor.py:221-300). ONE frame.
    """
    scores = jax.nn.sigmoid(cls_map[..., 0])
    reg = reg_map * jnp.asarray(spec.target_std) + jnp.asarray(
        spec.target_mean)
    centers = _pixel_centers(spec)
    yaw = jnp.arctan2(reg[..., 1], reg[..., 0])
    bx = reg[..., 2] + centers[..., 0]
    by = reg[..., 3] + centers[..., 1]
    bw = jnp.exp(reg[..., 4])
    bl = jnp.exp(reg[..., 5])

    flat = lambda a: a.reshape(-1)
    boxes = jnp.stack(
        [flat(bx), flat(by), jnp.full_like(flat(bx), spec.box_z),
         jnp.full_like(flat(bx), spec.box_h), flat(bw), flat(bl),
         flat(yaw)], axis=-1)                            # (P, 7) hwl
    sc = flat(scores)
    valid = sc >= score_threshold

    k = min(pre_top_k, sc.shape[0])
    top_sc, top_idx = jax.lax.top_k(jnp.where(valid, sc, -1.0), k)
    top_boxes = boxes[top_idx]
    top_valid = top_sc > 0

    corners = B.boxes_to_corners_3d(top_boxes, "hwl")
    order, keep_mask = nms_rotated(corners[:, :4, :2], top_sc, top_valid,
                                   nms_threshold, max_keep=max_keep)
    m = min(max_keep, k)
    return {"boxes": top_boxes[order][:m], "scores": top_sc[order][:m],
            "valid": keep_mask[:m]}

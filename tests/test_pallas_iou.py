"""Pallas rotated-IoU kernel: parity with the XLA path (interpret mode on
CPU; the compiled kernel is exercised on the real chip by bench/verify)."""

import jax.numpy as jnp
import numpy as np

from coalign_tpu.ops.pallas_iou import (rotated_iou_pallas,
                                        sh_intersection_area_soa)
from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils.iou import rotated_iou_corners


def _random_corners(n, seed=0):
    rng = np.random.default_rng(seed)
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0] = rng.uniform(-30, 30, n)
    boxes[:, 1] = rng.uniform(-30, 30, n)
    boxes[:, 3:6] = [1.5, 1.9, 4.4]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return np.asarray(B.boxes_to_corners_3d(boxes, "hwl"))[:, :4, :2]


def test_soa_matches_reference_math():
    c1 = _random_corners(40, 1)
    c2 = _random_corners(24, 2)
    q1 = jnp.asarray(np.broadcast_to(
        c1[:, None], (40, 24, 4, 2)).transpose(2, 0, 1, 3))
    q2 = jnp.asarray(np.broadcast_to(
        c2[None, :], (40, 24, 4, 2)).transpose(2, 0, 1, 3))
    inter = np.asarray(sh_intersection_area_soa(
        q1[..., 0], q1[..., 1], q2[..., 0], q2[..., 1]))
    ref = np.asarray(rotated_iou_corners(c1, c2))
    # back out reference intersections
    a1 = 0.5 * np.abs(np.sum(
        c1[:, :, 0] * np.roll(c1[:, :, 1], -1, 1)
        - np.roll(c1[:, :, 0], -1, 1) * c1[:, :, 1], axis=1))
    a2 = 0.5 * np.abs(np.sum(
        c2[:, :, 0] * np.roll(c2[:, :, 1], -1, 1)
        - np.roll(c2[:, :, 0], -1, 1) * c2[:, :, 1], axis=1))
    ref_inter = ref * (a1[:, None] + a2[None, :]) / (1 + ref)
    np.testing.assert_allclose(inter, ref_inter, atol=5e-3)


def test_pallas_kernel_parity_interpret():
    c1 = _random_corners(40, 3)
    c2 = _random_corners(150, 4)
    got = np.asarray(rotated_iou_pallas(jnp.asarray(c1), jnp.asarray(c2),
                                        interpret=True))
    want = np.asarray(rotated_iou_corners(c1, c2))
    assert got.shape == (40, 150)
    np.testing.assert_allclose(got, want, atol=1e-3)
    # self-IoU diagonal is exactly 1
    self_iou = np.asarray(rotated_iou_pallas(
        jnp.asarray(c1), jnp.asarray(c1), interpret=True))
    np.testing.assert_allclose(np.diag(self_iou), 1.0, atol=1e-4)

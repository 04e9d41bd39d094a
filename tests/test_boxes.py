import numpy as np

from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils.transforms import pose_to_tfm


def _rand_boxes(rng, n, order="hwl"):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0] = rng.uniform(-60, 60, n)
    boxes[:, 1] = rng.uniform(-30, 30, n)
    boxes[:, 2] = rng.uniform(-2, 0.5, n)
    if order == "hwl":
        boxes[:, 3] = rng.uniform(1.2, 2.2, n)   # h
        boxes[:, 4] = rng.uniform(1.4, 2.2, n)   # w
        boxes[:, 5] = rng.uniform(3.0, 5.0, n)   # l
    else:
        boxes[:, 3] = rng.uniform(3.0, 5.0, n)
        boxes[:, 4] = rng.uniform(1.4, 2.2, n)
        boxes[:, 5] = rng.uniform(1.2, 2.2, n)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_corner_center_roundtrip(rng):
    for order in ("hwl", "lwh"):
        boxes = _rand_boxes(rng, 20, order)
        corners = np.asarray(B.boxes_to_corners_3d(boxes, order))
        assert corners.shape == (20, 8, 3)
        back = np.asarray(B.corner_to_center(corners, order))
        # yaw is identifiable only mod pi wrt box geometry; compare sin/cos x2
        np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-4)
        np.testing.assert_allclose(np.cos(2 * back[:, 6]),
                                   np.cos(2 * boxes[:, 6]), atol=1e-4)


def test_corner_template_axis_convention():
    # An hwl box with yaw=0: length along x, width along y, height along z.
    box = np.array([[0, 0, 0, 2.0, 1.0, 4.0, 0.0]])  # h=2, w=1, l=4
    c = np.asarray(B.boxes_to_corners_3d(box, "hwl"))[0]
    assert np.isclose(c[:, 0].max(), 2.0) and np.isclose(c[:, 0].min(), -2.0)
    assert np.isclose(c[:, 1].max(), 0.5) and np.isclose(c[:, 1].min(), -0.5)
    assert np.isclose(c[:, 2].max(), 1.0) and np.isclose(c[:, 2].min(), -1.0)
    # bottom face first four corners
    assert np.allclose(c[:4, 2], -1.0)


def test_project_box3d(rng):
    boxes = _rand_boxes(rng, 5)
    tfm = np.asarray(pose_to_tfm(np.array([10.0, -4.0, 0.5, 0, 30.0, 0])))
    corners = B.boxes_to_corners_3d(boxes, "hwl")
    proj = np.asarray(B.project_box3d(corners, tfm))
    want = (tfm[:3, :3] @ np.asarray(corners).reshape(-1, 3).T).T + tfm[:3, 3]
    np.testing.assert_allclose(proj.reshape(-1, 3), want, atol=1e-4)


def test_range_masks():
    boxes = np.array([
        [0, 0, 0, 1.5, 1.6, 3.9, 0.3],       # inside
        [500, 0, 0, 1.5, 1.6, 3.9, 0.0],     # way outside x
        [140.0, 0, 0, 1.5, 1.6, 3.9, 0.0],   # straddles boundary -> kept
    ], dtype=np.float32)
    mask = np.asarray(B.mask_boxes_outside_range(
        boxes, [-140.8, -40, -3, 140.8, 40, 1], "hwl"))
    assert mask.tolist() == [True, False, True]


def test_sanity_masks(rng):
    # keep all corners strictly inside z in [-3, 1]: the filters follow the
    # reference's STRICT conventions (ref box_utils.py:840/:872 — axis-
    # aligned xy extents <= 6, min/max corner z in range, not mean z)
    boxes = _rand_boxes(rng, 10)
    boxes[:, 2] = rng.uniform(-1.5, -0.3, len(boxes))
    corners = B.boxes_to_corners_3d(boxes, "hwl")
    assert np.asarray(B.remove_large_pred_bbx(corners)).all()
    assert np.asarray(B.remove_bbx_abnormal_z(corners)).all()
    huge = np.array([[0, 0, 0, 1.5, 8.0, 9.0, 0.0]])
    c = B.boxes_to_corners_3d(huge, "hwl")
    assert not np.asarray(B.remove_large_pred_bbx(c)).any()
    # a large box rotated 45 deg: every edge < 6 but the axis-aligned
    # x-extent is (5.9 + 2.7) / sqrt(2) = 6.08 > 6 -> rejected (reference
    # measures the corners' axis-aligned bounding box, not the edges)
    rot45 = np.array([[0, 0, 0, 1.5, 2.7, 5.9, np.pi / 4]])
    c45 = B.boxes_to_corners_3d(rot45, "hwl")
    assert not np.asarray(B.remove_large_pred_bbx(c45)).any()
    # mean z in range but one corner face above z=1 -> rejected under the
    # strict min/max convention (old mean-z semantics would keep it)
    tall = np.array([[0, 0, 0.5, 2.2, 1.6, 3.9, 0.0]])
    ct = B.boxes_to_corners_3d(tall, "hwl")
    assert not np.asarray(B.remove_bbx_abnormal_z(ct)).any()

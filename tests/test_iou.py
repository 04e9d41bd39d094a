import numpy as np
import pytest

from coalign_tpu.utils import iou as I
from coalign_tpu.utils import box_utils as B


def _box_corners(cx, cy, l, w, yaw):
    box = np.array([[cx, cy, 0.0, 1.5, w, l, yaw]], dtype=np.float32)
    return np.asarray(B.boxes_to_corners2d(box, "hwl"))[0]


def _mc_iou(c1, c2, n=400_000, seed=0):
    """Monte-Carlo IoU oracle over the union bounding box."""
    rng = np.random.default_rng(seed)
    allc = np.concatenate([c1, c2], axis=0)
    lo, hi = allc.min(0) - 0.1, allc.max(0) + 0.1
    pts = rng.uniform(lo, hi, size=(n, 2))

    def inside(c, p):
        a, b = c, np.roll(c, -1, axis=0)
        e = b - a
        cross = e[None, :, 0] * (p[:, None, 1] - a[None, :, 1]) - \
                e[None, :, 1] * (p[:, None, 0] - a[None, :, 0])
        return np.all(cross >= 0, axis=1) | np.all(cross <= 0, axis=1)

    in1, in2 = inside(c1, pts), inside(c2, pts)
    union = np.count_nonzero(in1 | in2)
    if union == 0:
        return 0.0
    return np.count_nonzero(in1 & in2) / union


def test_standup_iou_basic():
    b1 = np.array([[0, 0, 2, 2]], dtype=np.float32)
    b2 = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], dtype=np.float32)
    got = np.asarray(I.standup_iou(b1, b2))
    np.testing.assert_allclose(got[0], [1 / 7, 1.0, 0.0], atol=1e-6)


def test_standup_iou_plus_one_offset():
    # reproduces the reference Cython bbox_overlaps (+1 convention)
    b = np.array([[0, 0, 1, 1]], dtype=np.float32)
    got = float(np.asarray(I.standup_iou(b, b, offset=1.0))[0, 0])
    assert np.isclose(got, 1.0)
    b2 = np.array([[1, 0, 2, 1]], dtype=np.float32)
    got = float(np.asarray(I.standup_iou(b, b2, offset=1.0))[0, 0])
    # iw = min(1,2)-max(0,1)+1 = 1, area each (1+1)*(1+1)=4 -> 2/(4+4-2)
    assert np.isclose(got, 2 / 6)


def test_rotated_iou_exact_cases():
    a = _box_corners(0, 0, 4, 2, 0.0)
    # identical
    assert np.isclose(float(I.rotated_iou_aligned(a[None], a[None])[0]), 1.0,
                      atol=1e-5)
    # disjoint
    b = _box_corners(10, 10, 4, 2, 0.7)
    assert np.isclose(float(I.rotated_iou_aligned(a[None], b[None])[0]), 0.0)
    # axis-aligned half overlap: shift by l/2 along x
    c = _box_corners(2, 0, 4, 2, 0.0)
    got = float(I.rotated_iou_aligned(a[None], c[None])[0])
    assert np.isclose(got, (4.0) / (8 + 8 - 4), atol=1e-5)
    # 90-degree rotated square on same center -> identical footprint
    sq = _box_corners(0, 0, 2, 2, 0.0)
    sq90 = _box_corners(0, 0, 2, 2, np.pi / 2)
    assert np.isclose(float(I.rotated_iou_aligned(sq[None], sq90[None])[0]),
                      1.0, atol=1e-4)
    # 45-degree rotated square: intersection is a regular octagon
    sq45 = _box_corners(0, 0, 2, 2, np.pi / 4)
    inter = 4 * (2 * np.sqrt(2) - 2)  # octagon area for unit half-width 1
    want = inter / (4 + 4 - inter)
    got = float(I.rotated_iou_aligned(sq[None], sq45[None])[0])
    assert np.isclose(got, want, atol=1e-4)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_rotated_iou_vs_monte_carlo(seed):
    rng = np.random.default_rng(seed)
    n = 12
    c1 = np.stack([
        _box_corners(rng.uniform(-3, 3), rng.uniform(-3, 3),
                     rng.uniform(2, 5), rng.uniform(1, 2.5),
                     rng.uniform(-np.pi, np.pi)) for _ in range(n)])
    c2 = np.stack([
        _box_corners(rng.uniform(-3, 3), rng.uniform(-3, 3),
                     rng.uniform(2, 5), rng.uniform(1, 2.5),
                     rng.uniform(-np.pi, np.pi)) for _ in range(n)])
    got = np.asarray(I.rotated_iou_aligned(c1, c2))
    want = np.array([_mc_iou(c1[i], c2[i], seed=seed) for i in range(n)])
    np.testing.assert_allclose(got, want, atol=8e-3)


def test_rotated_iou_matrix_consistency(rng):
    c = np.stack([_box_corners(rng.uniform(-3, 3), rng.uniform(-3, 3),
                               rng.uniform(2, 5), rng.uniform(1, 2.5),
                               rng.uniform(-np.pi, np.pi)) for _ in range(6)])
    mat = np.asarray(I.rotated_iou_corners(c, c))
    assert mat.shape == (6, 6)
    np.testing.assert_allclose(np.diag(mat), 1.0, atol=1e-5)
    np.testing.assert_allclose(mat, mat.T, atol=1e-5)


def test_aligned_boxes_iou3d():
    b1 = np.array([[0, 0, 0, 2.0, 2.0, 4.0, 0.0]], dtype=np.float32)  # hwl
    b2 = np.array([[0, 0, 1.0, 2.0, 2.0, 4.0, 0.0]], dtype=np.float32)
    # identical footprint, z shifted by h/2 -> z overlap 1 of 2
    got = float(np.asarray(I.aligned_boxes_iou3d(b1, b2, "hwl"))[0])
    inter = 8 * 1.0
    union = 16 + 16 - inter
    assert np.isclose(got, inter / union, atol=1e-5)

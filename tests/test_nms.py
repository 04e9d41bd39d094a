import numpy as np

from coalign_tpu.utils import box_utils as B
from coalign_tpu.utils import nms as N
from coalign_tpu.utils.iou import rotated_iou_corners


def _greedy_nms_oracle(corners, scores, thresh):
    """Reference greedy NMS (semantics of ref box_utils.py:693)."""
    iou = np.asarray(rotated_iou_corners(corners, corners))
    ixs = np.argsort(-scores).tolist()
    pick = []
    while ixs:
        i = ixs.pop(0)
        pick.append(i)
        ixs = [j for j in ixs if iou[i, j] <= thresh]
    return pick


def _rand_corners(rng, n):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0] = rng.uniform(-20, 20, n)
    boxes[:, 1] = rng.uniform(-10, 10, n)
    boxes[:, 3:6] = [1.5, 1.8, 4.2]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return np.asarray(B.boxes_to_corners2d(boxes, "hwl"))


def test_nms_matches_oracle(rng):
    n = 40
    corners = _rand_corners(rng, n)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    order, keep_mask = N.nms_rotated(corners, scores, valid, 0.15)
    got = np.asarray(order)[np.asarray(keep_mask)].tolist()
    want = _greedy_nms_oracle(corners, scores, 0.15)
    assert got == want


def test_nms_respects_valid_mask(rng):
    n = 10
    corners = _rand_corners(rng, n)
    scores = np.linspace(1.0, 0.1, n).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[::2] = False
    order, keep_mask = N.nms_rotated(corners, scores, valid, 0.15)
    kept = set(np.asarray(order)[np.asarray(keep_mask)].tolist())
    assert all(valid[i] for i in kept)


def test_nms_max_keep(rng):
    n = 30
    corners = _rand_corners(rng, n)
    scores = rng.uniform(size=n).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    _, keep_mask = N.nms_rotated(corners, scores, valid, 0.99, max_keep=5)
    assert int(np.asarray(keep_mask).sum()) <= 5


def test_nms_fixpoint_equals_greedy_dense_stress(rng):
    """The overlap-matrix fixpoint NMS must equal sequential greedy on
    DENSE scenes with long suppression chains (many rounds to converge)."""
    for trial in range(6):
        n = 120
        boxes = np.zeros((n, 7), dtype=np.float32)
        # heavy overlap: clusters of boxes along a line, chained
        boxes[:, 0] = rng.uniform(-6, 6, n)
        boxes[:, 1] = rng.uniform(-3, 3, n)
        boxes[:, 3:6] = [1.5, 1.8, 4.2]
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
        corners = np.asarray(B.boxes_to_corners2d(boxes, "hwl"))
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        valid = rng.uniform(size=n) > 0.1
        order, keep_mask = N.nms_rotated(corners, scores, valid, 0.15)
        got = np.asarray(order)[np.asarray(keep_mask)].tolist()
        iou = np.asarray(rotated_iou_corners(corners, corners))
        ixs = [i for i in np.argsort(-scores) if valid[i]]
        want = []
        while ixs:
            i = ixs.pop(0)
            want.append(i)
            ixs = [j for j in ixs if iou[i, j] <= 0.15]
        assert got == want, f"trial {trial}"

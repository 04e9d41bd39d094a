import numpy as np
import jax
import jax.numpy as jnp

from coalign_tpu.postprocess import anchors as A
from coalign_tpu.postprocess import decode as D


ANCHOR_ARGS = {
    "W": 32, "H": 32, "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
    "vw": 0.4, "vh": 0.4, "feature_stride": 2,
    "cav_lidar_range": [-6.4, -6.4, -3, 6.4, 6.4, 1],
}
TARGET_ARGS = {"pos_threshold": 0.6, "neg_threshold": 0.45,
               "score_threshold": 0.2}


def test_anchor_grid_shape_and_layout():
    anchors = A.generate_anchor_box(ANCHOR_ARGS, "hwl")
    assert anchors.shape == (16, 16, 2, 7)
    # centers span the configured range, z = -1, yaw in {0, pi/2}
    assert np.isclose(anchors[0, 0, 0, 0], -6.0)
    assert np.isclose(anchors[0, -1, 0, 0], 6.0)
    assert np.isclose(anchors[0, 0, 0, 1], -6.0)
    assert np.all(anchors[..., 2] == -1.0)
    np.testing.assert_allclose(anchors[..., 0, 6], 0.0)
    np.testing.assert_allclose(anchors[..., 1, 6], np.pi / 2, atol=1e-6)
    # hwl order: h=1.56, w=1.6, l=3.9
    np.testing.assert_allclose(anchors[..., 3], 1.56)
    np.testing.assert_allclose(anchors[..., 4], 1.6)
    np.testing.assert_allclose(anchors[..., 5], 3.9)


def test_assign_targets_basic():
    spec = A.make_anchor_spec(ANCHOR_ARGS, TARGET_ARGS, "hwl")
    gt = np.zeros((10, 7), dtype=np.float32)
    gt[0] = [0.0, 0.0, -1.0, 1.56, 1.6, 3.9, 0.0]  # sits exactly on an anchor
    gt_mask = np.zeros(10, dtype=bool)
    gt_mask[0] = True
    out = A.assign_targets(jnp.asarray(gt), jnp.asarray(gt_mask), spec)
    pos = np.asarray(out["pos_equal_one"])
    neg = np.asarray(out["neg_equal_one"])
    t = np.asarray(out["targets"]).reshape(16, 16, 2, 7)
    assert pos.sum() >= 1
    # positives cluster near the gt center cell
    ys, xs, aa = np.nonzero(pos)
    assert np.all(np.abs(ys - 7.5) < 3) and np.all(np.abs(xs - 7.5) < 3)
    # yaw-0 anchors should match a yaw-0 gt (not the 90-degree ones)
    assert (aa == 0).all()
    # no anchor is both pos and neg
    assert np.all(pos + neg <= 1)
    # the best anchor's targets decode back to the gt box
    k = np.argmax(pos.reshape(-1))
    anchors_flat = spec.anchors.reshape(-1, 7)
    diag = spec.diag
    dec_x = t.reshape(-1, 7)[k, 0] * diag[k] + anchors_flat[k, 0]
    dec_l = np.exp(t.reshape(-1, 7)[k, 5]) * anchors_flat[k, 5]
    assert np.isclose(dec_x, 0.0, atol=1e-5)
    assert np.isclose(dec_l, 3.9, atol=1e-5)


def test_assign_targets_empty_gt():
    spec = A.make_anchor_spec(ANCHOR_ARGS, TARGET_ARGS, "hwl")
    gt = np.zeros((10, 7), dtype=np.float32)
    gt_mask = np.zeros(10, dtype=bool)
    out = A.assign_targets(jnp.asarray(gt), jnp.asarray(gt_mask), spec)
    assert np.asarray(out["pos_equal_one"]).sum() == 0
    assert np.asarray(out["neg_equal_one"]).all()


def test_encode_decode_roundtrip(rng):
    """decode(encode(gt)) == gt at positive anchors — the reference's own
    smoke test (ref debug_utils.py:27 test_bev_post_processing)."""
    spec = A.make_anchor_spec(ANCHOR_ARGS, TARGET_ARGS, "hwl")
    gt = np.zeros((10, 7), dtype=np.float32)
    n_gt = 4
    gt[:n_gt, 0] = rng.uniform(-5, 5, n_gt)
    gt[:n_gt, 1] = rng.uniform(-5, 5, n_gt)
    gt[:n_gt, 2] = rng.uniform(-1.5, -0.5, n_gt)
    gt[:n_gt, 3] = 1.56
    gt[:n_gt, 4] = 1.6
    gt[:n_gt, 5] = 3.9
    gt[:n_gt, 6] = rng.uniform(-0.3, 0.3, n_gt)
    gt_mask = np.arange(10) < n_gt
    out = A.assign_targets(jnp.asarray(gt), jnp.asarray(gt_mask), spec)

    decoded = np.asarray(D.delta_to_boxes3d(
        out["targets"], jnp.asarray(spec.anchors)))  # (K, 7)
    pos = np.asarray(out["pos_equal_one"]).reshape(-1) > 0
    dec_pos = decoded[pos]
    # every decoded positive must match one of the gt boxes
    for box in dec_pos:
        d = np.abs(gt[:n_gt] - box[None]).max(axis=1)
        assert d.min() < 1e-3, f"decoded {box} matches no gt"


def test_post_process_frame_finds_planted_box(rng):
    spec = A.make_anchor_spec(ANCHOR_ARGS, TARGET_ARGS, "hwl")
    gt = np.zeros((10, 7), dtype=np.float32)
    gt[0] = [1.2, -0.8, -1.0, 1.56, 1.6, 3.9, 0.2]
    gt_mask = np.arange(10) < 1
    labels = A.assign_targets(jnp.asarray(gt), jnp.asarray(gt_mask), spec)
    # build logit maps: +10 where pos, -10 elsewhere
    pos = labels["pos_equal_one"]
    cls_logits = jnp.where(pos > 0, 10.0, -10.0)
    reg = labels["targets"]
    out = D.post_process_frame(
        cls_logits, reg, jnp.asarray(spec.anchors), jnp.eye(4),
        score_threshold=0.2, nms_threshold=0.15,
        gt_range=(-6.4, -6.4, -3, 6.4, 6.4, 1), prefilter_k=64, max_keep=8)
    mask = np.asarray(out["mask"])
    assert mask.sum() == 1  # NMS collapses all positives onto one box
    box = np.asarray(out["boxes7"])[0]
    np.testing.assert_allclose(box, gt[0], atol=1e-3)

"""Golden-parity fixtures pinning the three subtle torch conventions
(VERDICT round-1 item 4): F.affine_grid/grid_sample(align_corners=False),
normalize_pairwise_tfm, and anchor generation + delta_to_boxes3d decode.

The fixtures record what the reference torch code actually produced
(tests/golden/generate_fixtures.py); any convention drift in our
implementations fails at the 1e-5 level.
"""

import os

import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_warp_affine_matches_torch_grid_sample():
    """ref torch_transformation_utils.py:322 warp_affine ==
    F.affine_grid + F.grid_sample with align_corners=False."""
    from coalign_tpu.ops.warp import warp_affine

    io = np.load(os.path.join(GOLDEN, "grid_sample_io.npz"))
    x = io["x"]          # (3, 4, 10, 14) NCHW
    theta = io["theta"]  # (3, 2, 3) normalized affine
    want = io["out"]
    for b in range(x.shape[0]):
        src = jnp.asarray(x[b].transpose(1, 2, 0))  # HWC
        got = np.asarray(warp_affine(src, jnp.asarray(theta[b])))
        np.testing.assert_allclose(got.transpose(2, 0, 1), want[b],
                                   atol=1e-5, err_msg=f"batch {b}")


def test_normalize_pairwise_tfm_matches_reference():
    """ref transformation_utils.py:69 normalize_pairwise_tfm."""
    from coalign_tpu.utils.transforms import normalize_pairwise_tfm

    io = np.load(os.path.join(GOLDEN, "pairwise_tfm_io.npz"))
    got = np.asarray(normalize_pairwise_tfm(
        jnp.asarray(io["mats"]), int(io["H"]), int(io["W"]),
        float(io["ds"])))
    np.testing.assert_allclose(got, io["out"], atol=1e-5)


def test_anchor_grid_matches_reference():
    """ref voxel_postprocessor.py generate_anchor_box (hwl order)."""
    from coalign_tpu.postprocess.anchors import generate_anchor_box

    io = np.load(os.path.join(GOLDEN, "anchors_decode_io.npz"))
    anchors = generate_anchor_box({
        "W": 64, "H": 64, "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
        "vw": 0.4, "vh": 0.4, "feature_stride": 2,
        "cav_lidar_range": [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0],
    }, order="hwl")
    np.testing.assert_allclose(anchors, io["anchors"], atol=1e-5)


def test_delta_decode_matches_reference():
    """ref voxel_postprocessor.py:404 delta_to_boxes3d bit-parity."""
    from coalign_tpu.postprocess.decode import delta_to_boxes3d

    io = np.load(os.path.join(GOLDEN, "anchors_decode_io.npz"))
    deltas_nhwc = jnp.asarray(io["deltas"].transpose(0, 2, 3, 1))
    got = np.asarray(delta_to_boxes3d(deltas_nhwc, jnp.asarray(io["anchors"])))
    np.testing.assert_allclose(got, io["boxes"], atol=1e-5)

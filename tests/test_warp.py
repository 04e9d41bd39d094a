import numpy as np
import pytest

from coalign_tpu.ops import warp as W
from coalign_tpu.utils import transforms as T


def test_identity_warp(rng):
    src = rng.normal(size=(20, 44, 3)).astype(np.float32)
    aff = np.eye(2, 3, dtype=np.float32)
    out = np.asarray(W.warp_affine(src, aff))
    np.testing.assert_allclose(out, src, atol=1e-5)


def test_translation_warp_one_pixel():
    # affine with tx = 2/W shifts sampling one source pixel right:
    # out[i, j] = src[i, j+1]
    h, w = 8, 16
    src = np.arange(h * w, dtype=np.float32).reshape(h, w, 1)
    aff = np.eye(2, 3, dtype=np.float32)
    aff[0, 2] = 2.0 / w
    out = np.asarray(W.warp_affine(src, aff))[..., 0]
    np.testing.assert_allclose(out[:, :-1], src[:, 1:, 0], atol=1e-4)
    np.testing.assert_allclose(out[:, -1], 0.0, atol=1e-6)  # zero padding


def test_matches_torch_grid_sample(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    h, w, c = 24, 48, 4
    src = rng.normal(size=(1, c, h, w)).astype(np.float32)
    theta = np.array([[[0.9, -0.2, 0.1], [0.15, 1.1, -0.3]]], dtype=np.float32)
    grid = F.affine_grid(torch.from_numpy(theta), [1, c, h, w],
                         align_corners=False)
    want = F.grid_sample(torch.from_numpy(src), grid,
                         align_corners=False).numpy()[0]  # (C, H, W)
    got = np.asarray(W.warp_affine(src[0].transpose(1, 2, 0), theta[0]))
    np.testing.assert_allclose(got.transpose(2, 0, 1), want, atol=1e-4)


def test_physical_warp_roundtrip(rng):
    """A feature warped agent->ego lands where the pairwise transform says."""
    h, w, ratio = 100, 352, 0.4
    # agent j sits 20m ahead (+x) of ego, same heading
    poses = np.array([[0, 0, 0, 0, 0, 0], [20.0, 0, 0, 0, 0, 0]],
                     dtype=np.float32)
    mask = np.ones(2, dtype=bool)
    pair = T.get_pairwise_transformation(poses, mask)
    aff = np.asarray(T.normalize_pairwise_tfm(pair, h, w, ratio))
    # put a blob at agent j's origin (pixel center of grid)
    src = np.zeros((2, h, w, 1), dtype=np.float32)
    src[1, h // 2, w // 2, 0] = 1.0
    out = np.asarray(W.warp_agents_to_ego(
        src[None], aff[None, 0], mask[None]))[0]  # affines = row ego->j
    # ego sees the blob 20m ahead -> +x is +50 pixels along W
    jy, jx = np.unravel_index(np.argmax(out[1, ..., 0]), (h, w))
    assert abs(jx - (w // 2 + int(20 / ratio))) <= 1
    assert abs(jy - h // 2) <= 1
    # masked agent -> zeros
    out_masked = np.asarray(W.warp_agents_to_ego(
        src[None], aff[None, 0], np.array([[True, False]])))[0]
    assert np.all(out_masked[1] == 0)


def test_warp_bf16_wide_grid_coordinate_precision():
    """Sampling coords must be f32 even for bf16 maps: bf16 only resolves
    integers to 256, which would quantize x-coords on wide BEV grids
    (W=352/704) by 2 pixels. Identity warp of a bf16 map must reproduce
    the map exactly across the FULL width."""
    import jax.numpy as jnp

    h, w, c = 8, 352, 8
    rng = np.random.default_rng(0)
    src32 = rng.normal(size=(h, w, c)).astype(np.float32)
    src16 = jnp.asarray(src32).astype(jnp.bfloat16)
    # translation by ~1/3 pixel: every output is a genuine 2-tap blend
    aff = jnp.asarray(np.array([[1.0, 0, 2.0 * 0.34 / w],
                                [0, 1.0, 0]], np.float32))
    out16 = np.asarray(W.warp_affine(src16, aff).astype(jnp.float32))
    out32 = np.asarray(W.warp_affine(jnp.asarray(src32), aff))
    # with bf16 coords the x >= 256 half samples pixels off by up to 2,
    # an O(1) feature error; with f32 coords only bf16 value rounding
    # remains (~1e-2)
    assert np.abs(out16 - out32)[:, 256:].max() < 0.05


def test_bilinear_gather_quad_matches_paired():
    """The (rejected-for-TPU) quad-packed gather must stay numerically
    identical to the production paired-channel gather."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    h, w, c = 12, 20, 8
    src = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-2, w + 2, (h, w)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-2, h + 2, (h, w)).astype(np.float32))
    a = np.asarray(W._bilinear_gather(src, fx, fy))
    b = np.asarray(W._bilinear_gather_quad(src, fx, fy))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

"""Camera image transforms: post_rot/post_trans must exactly encode the
pixel mapping (get_geometry inverts them), + hdf5 packing roundtrip."""

import numpy as np
from PIL import Image

from coalign_tpu.data.camera_batch import CameraAugmentor, img_transform


def _probe_image(w0=64, h0=48):
    """Image whose value encodes the pixel position."""
    arr = np.zeros((h0, w0, 3), dtype=np.uint8)
    arr[..., 0] = np.arange(w0)[None, :] * 2          # x * 2
    arr[..., 1] = np.arange(h0)[:, None] * 2          # y * 2
    return Image.fromarray(arr)


def test_img_transform_mapping():
    img = _probe_image()
    for resize, crop, flip in [(1.0, (8, 4), False), (1.5, (10, 6), False),
                               (1.0, (0, 0), True), (1.25, (5, 3), True)]:
        arr, pr, pt = img_transform(img, resize, crop, flip, (32, 40))
        # pick an original pixel, map it forward, check the value matches
        for ox, oy in [(20, 12), (30, 20)]:
            p = pr[:2, :2] @ np.array([ox, oy]) + pt[:2]
            ax, ay = int(round(p[0])), int(round(p[1]))
            if not (0 <= ax < 40 and 0 <= ay < 32):
                continue
            got_x = arr[ay, ax, 0] * 255 / 2
            got_y = arr[ay, ax, 1] * 255 / 2
            assert abs(got_x - ox) <= max(2, resize), (resize, crop, flip)
            assert abs(got_y - oy) <= max(2, resize)


def test_augmentor_respects_bounds():
    aug = CameraAugmentor((32, 40), resize_lim=(0.5, 1.2), rand_flip=True,
                          seed=3)
    img = _probe_image()
    for _ in range(10):
        resize, crop, flip = aug.sample(64, 48)
        arr, pr, pt = img_transform(img, resize, crop, flip, (32, 40))
        assert arr.shape == (32, 40, 3)
        # resize never drops below what covers the crop window
        assert 64 * resize >= 40 - 1e-6 and 48 * resize >= 32 - 1e-6


def test_img2hdf5_roundtrip(tmp_path):
    from coalign_tpu.tools.img2hdf5 import pack_frame, read_frame_hdf5

    cav = tmp_path / "cav"
    cav.mkdir()
    rng = np.random.default_rng(0)
    imgs = []
    for i in range(4):
        a = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        Image.fromarray(a).save(str(cav / f"000068_camera{i}.png"))
        imgs.append(a)
    out = pack_frame(str(cav), "000068")
    assert out and out.endswith("_imgs.hdf5")
    back = read_frame_hdf5(str(cav), "000068")
    assert len(back) == 4
    for a, b in zip(imgs, back):
        np.testing.assert_array_equal(a, b)

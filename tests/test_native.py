"""Native C++ data plane: build, PCD parse parity, mask/pad, transforms."""

import numpy as np
import pytest

from coalign_tpu import native
from coalign_tpu.data.pcd_io import read_pcd, write_pcd

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_parse_pcd_matches_numpy_reader(tmp_path, rng):
    pts = rng.normal(size=(500, 4)).astype(np.float32)
    for binary in (True, False):
        p = str(tmp_path / f"n_{binary}.pcd")
        write_pcd(p, pts, binary=binary)
        ours = native.parse_pcd(p)
        ref = read_pcd(p)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_mask_pad_points(rng):
    pts = rng.uniform(-50, 50, (2000, 4)).astype(np.float32)
    lr = [-20, -20, -60, 20, 20, 60]
    out, mask = native.mask_pad_points(pts, lr, max_out=4096)
    k = mask.sum()
    assert k > 0
    got = out[mask]
    assert (got[:, 0] >= -20).all() and (got[:, 0] < 20).all()
    assert (got[:, 1] >= -20).all() and (got[:, 1] < 20).all()
    expect = ((pts[:, 0] >= -20) & (pts[:, 0] < 20)
              & (pts[:, 1] >= -20) & (pts[:, 1] < 20)).sum()
    assert k == expect  # no subsampling needed at this capacity
    assert not mask[k:].any()


def test_mask_pad_subsamples_to_capacity(rng):
    pts = rng.uniform(-10, 10, (5000, 4)).astype(np.float32)
    lr = [-20, -20, -60, 20, 20, 60]
    out, mask = native.mask_pad_points(pts, lr, max_out=1000)
    assert 900 <= mask.sum() <= 1000


def test_mask_pad_ego_mask(rng):
    pts = np.array([[0.1, 0.1, 0, 0], [5, 5, 0, 0]], dtype=np.float32)
    out, mask = native.mask_pad_points(pts, [-20, -20, -3, 20, 20, 3],
                                       max_out=10, ego_x_radius=1.95,
                                       ego_y_radius=1.1)
    assert mask.sum() == 1
    np.testing.assert_allclose(out[0], [5, 5, 0, 0])


def test_transform_points_matches_numpy(rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    from coalign_tpu.utils.transforms import pose_to_tfm
    t = np.asarray(pose_to_tfm(np.array([1.0, -2.0, 0.5, 5.0, 30.0, -3.0])),
                   dtype=np.float32)
    ours = native.transform_points(pts, t)
    xyz1 = np.concatenate([pts[:, :3], np.ones((100, 1))], -1)
    ref = (xyz1 @ t.T)[:, :3]
    np.testing.assert_allclose(ours[:, :3], ref, atol=1e-4)
    np.testing.assert_allclose(ours[:, 3], pts[:, 3])


def test_parse_pcd_batch_parallel(tmp_path, rng):
    """Threaded batch parse matches per-file parses (DataLoader-worker
    role, ref tools/train.py:42 num_workers=4)."""
    paths = []
    wants = []
    for i in range(7):
        pts = rng.normal(size=(100 + 37 * i, 4)).astype(np.float32)
        p = str(tmp_path / f"b{i}.pcd")
        write_pcd(p, pts, binary=i % 2 == 0)
        paths.append(p)
        wants.append(read_pcd(p))
    got = native.parse_pcd_batch(paths, max_points=2048, n_threads=3)
    assert len(got) == 7
    for g, w in zip(got, wants):
        np.testing.assert_allclose(g, w, atol=1e-4)


def test_parse_pcd_batch_raises_on_missing(tmp_path, rng):
    pts = rng.normal(size=(10, 4)).astype(np.float32)
    p = str(tmp_path / "ok.pcd")
    write_pcd(p, pts, binary=True)
    with pytest.raises(IOError):
        native.parse_pcd_batch([p, str(tmp_path / "missing.pcd")])

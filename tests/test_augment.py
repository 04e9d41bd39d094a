"""World augmentations: consistency of points / poses / gt under
flip + rotation + scaling."""

import numpy as np
import pytest

from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
from coalign_tpu.data.augment import WorldAugmentor

LIDAR_RANGE = (-40, -40, -3, 40, 40, 1)


def _points_near_boxes(batch):
    """For each frame: how many ego-frame points fall inside gt
    footprints — invariant under consistent world augmentation."""
    import jax.numpy as jnp

    from coalign_tpu.ops.roi import points_in_rotated_boxes
    from coalign_tpu.utils.transforms import pose_to_tfm, inverse_tfm

    counts = []
    for bi in range(batch["points"].shape[0]):
        # ego points are already in ego frame (slot 0)
        pts = batch["points"][bi, 0][batch["point_mask"][bi, 0]]
        gt = batch["gt_boxes"][bi][batch["gt_mask"][bi]]
        if len(gt) == 0:
            counts.append(0)
            continue
        g = gt.copy()
        g[:, 3] = 10.0  # ignore z extent
        # synthetic points lie exactly ON box surfaces; dilate footprints
        # so float roundtrip noise (~1e-6) can't flip membership
        g[:, 4:6] *= 1.05
        m = np.asarray(points_in_rotated_boxes(jnp.asarray(pts[:, :3]),
                                               jnp.asarray(g)))
        counts.append(int(m.any(axis=0).sum()))
    return counts


@pytest.mark.parametrize("flip,rot,scale", [
    (True, 0.0, 1.0),
    (False, 0.6, 1.0),
    (False, 0.0, 1.04),
    (True, -0.4, 0.97),
])
def test_augment_preserves_point_box_alignment(flip, rot, scale):
    ds = SyntheticScenes(num_frames=2, num_agents=3, num_objects=5,
                         lidar_range=LIDAR_RANGE, points_per_object=64,
                         ground_points=64, seed=11)
    plain = IntermediateFusionBatcher(max_cav=3, max_points=2048,
                                      max_objects=16,
                                      lidar_range=LIDAR_RANGE)
    base_counts = _points_near_boxes(plain.assemble([ds[0], ds[1]]))

    aug_frames = [WorldAugmentor.apply(ds[i], flip, rot, scale)
                  for i in range(2)]
    aug_counts = _points_near_boxes(plain.assemble(aug_frames))
    # box-surface points stay on their (augmented) boxes
    for b, a in zip(base_counts, aug_counts):
        assert a >= 0.9 * b, (base_counts, aug_counts)


def test_augmentor_samples_and_is_deterministic():
    cfg = [{"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
           {"NAME": "random_world_rotation",
            "WORLD_ROT_ANGLE": [-0.78, 0.78]},
           {"NAME": "random_world_scaling",
            "WORLD_SCALE_RANGE": [0.95, 1.05]}]
    a1, a2 = WorldAugmentor(cfg, seed=5), WorldAugmentor(cfg, seed=5)
    s1 = [a1.sample() for _ in range(10)]
    s2 = [a2.sample() for _ in range(10)]
    assert s1 == s2
    flips = {s[0] for s in s1}
    assert flips == {True, False}
    assert any(abs(s[1]) > 0.05 for s in s1)
    assert any(abs(s[2] - 1.0) > 0.005 for s in s1)


def test_identity_augment_is_noop():
    ds = SyntheticScenes(num_frames=1, num_agents=2, num_objects=3,
                         lidar_range=LIDAR_RANGE, points_per_object=16,
                         ground_points=16, seed=1)
    frame = ds[0]
    out = WorldAugmentor.apply(frame, False, 0.0, 1.0)
    assert out is frame

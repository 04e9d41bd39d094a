import numpy as np
import jax.numpy as jnp

from coalign_tpu.utils import transforms as T


def _x_to_world_np(pose):
    """Independent numpy oracle of the CARLA pose->matrix convention
    (semantics of ref opencood/utils/transformation_utils.py:263)."""
    x, y, z, roll, yaw, pitch = pose
    c_y, s_y = np.cos(np.radians(yaw)), np.sin(np.radians(yaw))
    c_r, s_r = np.cos(np.radians(roll)), np.sin(np.radians(roll))
    c_p, s_p = np.cos(np.radians(pitch)), np.sin(np.radians(pitch))
    m = np.identity(4)
    m[0, 3], m[1, 3], m[2, 3] = x, y, z
    m[0, 0] = c_p * c_y
    m[0, 1] = c_y * s_p * s_r - s_y * c_r
    m[0, 2] = -c_y * s_p * c_r - s_y * s_r
    m[1, 0] = s_y * c_p
    m[1, 1] = s_y * s_p * s_r + c_y * c_r
    m[1, 2] = -s_y * s_p * c_r + c_y * s_r
    m[2, 0] = s_p
    m[2, 1] = -c_p * s_r
    m[2, 2] = c_p * c_r
    return m


def test_pose_to_tfm_matches_oracle(rng):
    poses = rng.uniform(-50, 50, size=(16, 6))
    poses[:, 3:] = rng.uniform(-60, 60, size=(16, 3))
    got = np.asarray(T.pose_to_tfm(poses))
    want = np.stack([_x_to_world_np(p) for p in poses])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pose_tfm_roundtrip(rng):
    poses = rng.uniform(-50, 50, size=(32, 6))
    poses[:, 3:] = rng.uniform(-80, 80, size=(32, 3))
    back = np.asarray(T.tfm_to_pose(T.pose_to_tfm(poses)))
    np.testing.assert_allclose(back, poses, atol=1e-4)


def test_pose3dof():
    pose = np.array([[1.0, 2.0, 90.0]])
    m = np.asarray(T.pose_to_tfm(pose))[0]
    pt = m @ np.array([1.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(pt[:3], [1.0, 3.0, 0.0], atol=1e-6)


def test_inverse_tfm(rng):
    poses = rng.uniform(-10, 10, size=(8, 6))
    m = T.pose_to_tfm(poses)
    prod = np.asarray(m @ T.inverse_tfm(m))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape),
                               atol=1e-5)


def test_pairwise_transform_consistency(rng):
    # T_j<-i applied to a point in frame i must equal going i->world->j
    poses = rng.uniform(-30, 30, size=(2, 5, 6))
    poses[..., 3:] = rng.uniform(-40, 40, size=(2, 5, 3))
    mask = np.array([[True, True, True, False, False],
                     [True, True, False, False, False]])
    pair = np.asarray(T.get_pairwise_transformation(poses, mask))
    assert pair.shape == (2, 5, 5, 4, 4)
    t_w = np.asarray(T.pose_to_tfm(poses))
    for b in range(2):
        n = mask[b].sum()
        for i in range(n):
            for j in range(n):
                want = np.linalg.solve(t_w[b, j], t_w[b, i])
                np.testing.assert_allclose(pair[b, i, j], want, atol=1e-4)
    # masked entries are identity
    np.testing.assert_allclose(pair[0, 4, 0], np.eye(4), atol=1e-6)


def test_normalize_pairwise_tfm_identity():
    # identity transform -> identity affine
    eye = np.eye(4)[None]
    aff = np.asarray(T.normalize_pairwise_tfm(eye, 100, 352, 0.4))[0]
    np.testing.assert_allclose(aff, np.eye(2, 3), atol=1e-6)


def test_normalize_pairwise_tfm_translation():
    # pure +x translation of W*ratio/2 meters -> tx = +1 in normalized coords
    H, W, ratio = 100, 352, 0.4
    m = np.eye(4)
    m[0, 3] = W * ratio / 2
    aff = np.asarray(T.normalize_pairwise_tfm(m[None], H, W, ratio))[0]
    assert np.isclose(aff[0, 2], 1.0)
    assert np.isclose(aff[1, 2], 0.0)


def test_project_points(rng):
    pts = rng.uniform(-5, 5, size=(10, 4)).astype(np.float32)
    pose = np.array([3.0, -2.0, 1.0, 0.0, 45.0, 0.0])
    m = np.asarray(T.pose_to_tfm(pose))
    got = np.asarray(T.project_points(pts, m))
    want_xyz = (m[:3, :3] @ pts[:, :3].T).T + m[:3, 3]
    np.testing.assert_allclose(got[:, :3], want_xyz, atol=1e-5)
    np.testing.assert_allclose(got[:, 3], pts[:, 3])

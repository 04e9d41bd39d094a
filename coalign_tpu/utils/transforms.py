"""Pose <-> SE(3) transforms and pairwise agent transforms.

TPU-first rework of opencood/utils/transformation_utils.py. All functions are
pure, fixed-shape, vmap/jit friendly and operate on padded agent tensors
``(..., L, ...)`` instead of python lists keyed by cav id.

DUAL-DISPATCH (utils/common.array_namespace): numpy inputs compute in pure
numpy — the host data plane (readers/batchers) calls these per frame, and
dispatching tiny jnp ops from dataloader threads round-trips the remote TPU
at ~0.2 s/op on the axon stack. jax arrays/tracers compute in jnp with
Precision.HIGHEST matmuls (TPU default bf16 matmul is catastrophic for
metric world coordinates).

Conventions (identical to the reference so that reference configs/datasets
drive this stack unchanged):
  * A 6-DoF pose is ``[x, y, z, roll, yaw, pitch]`` in degrees, CARLA axes
    (ref transformation_utils.py:263 x_to_world).
  * A 3-DoF pose is ``[x, y, yaw]`` (yaw degrees).
  * ``pairwise_t_matrix[i, j]`` is T_j<-i, mapping agent-i coordinates into
    agent-j's frame (ref transformation_utils.py:22 get_pairwise_transformation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.utils.common import array_namespace

# Geometry matmuls must stay full f32: TPU default matmul precision is bf16,
# which is catastrophic for metric world coordinates (100s of meters).
_HI = jax.lax.Precision.HIGHEST


def _matmul(xp, a, b):
    if xp is np:
        return np.matmul(a, b)
    return jnp.matmul(a, b, precision=_HI)


def pose_to_tfm(pose):
    """Batched pose -> 4x4 homogeneous transform (T_world<-x).

    pose: (..., 6) [x,y,z,roll,yaw,pitch] degrees or (..., 3) [x,y,yaw].
    Returns (..., 4, 4).

    Matches ref transformation_utils.py:93 (pose_to_tfm) / :263 (x_to_world):
    R = Rz(yaw) @ Ry(pitch') @ Rx(roll') with CARLA's sign conventions.
    """
    xp = array_namespace(pose)
    pose = xp.asarray(pose)
    dof = pose.shape[-1]

    if dof == 3:
        x, y, yaw = pose[..., 0], pose[..., 1], xp.deg2rad(pose[..., 2])
        c, s = xp.cos(yaw), xp.sin(yaw)
        zero = xp.zeros_like(x)
        one = xp.ones_like(x)
        rows = [
            xp.stack([c, -s, zero, x], axis=-1),
            xp.stack([s, c, zero, y], axis=-1),
            xp.stack([zero, zero, one, zero], axis=-1),
            xp.stack([zero, zero, zero, one], axis=-1),
        ]
        return xp.stack(rows, axis=-2)

    assert dof == 6, f"pose must be (...,3) or (...,6), got {pose.shape}"
    x, y, z = pose[..., 0], pose[..., 1], pose[..., 2]
    roll = xp.deg2rad(pose[..., 3])
    yaw = xp.deg2rad(pose[..., 4])
    pitch = xp.deg2rad(pose[..., 5])
    c_y, s_y = xp.cos(yaw), xp.sin(yaw)
    c_r, s_r = xp.cos(roll), xp.sin(roll)
    c_p, s_p = xp.cos(pitch), xp.sin(pitch)
    zero = xp.zeros_like(x)
    one = xp.ones_like(x)
    # CARLA rotation composition (ref x_to_world, transformation_utils.py:288-304)
    rows = [
        xp.stack([c_p * c_y, c_y * s_p * s_r - s_y * c_r,
                  -c_y * s_p * c_r - s_y * s_r, x], axis=-1),
        xp.stack([s_y * c_p, s_y * s_p * s_r + c_y * c_r,
                  -s_y * s_p * c_r + c_y * s_r, y], axis=-1),
        xp.stack([s_p, -c_p * s_r, c_p * c_r, z], axis=-1),
        xp.stack([zero, zero, zero, one], axis=-1),
    ]
    return xp.stack(rows, axis=-2)


def tfm_to_pose(tfm):
    """Batched 4x4 transform -> [x,y,z,roll,yaw,pitch] degrees.

    Inverse of :func:`pose_to_tfm` (ref transformation_utils.py:166/223).
    tfm: (..., 4, 4) -> (..., 6).
    """
    xp = array_namespace(tfm)
    tfm = xp.asarray(tfm)
    yaw = xp.rad2deg(xp.arctan2(tfm[..., 1, 0], tfm[..., 0, 0]))
    roll = xp.rad2deg(xp.arctan2(-tfm[..., 2, 1], tfm[..., 2, 2]))
    pitch = xp.rad2deg(
        xp.arctan2(tfm[..., 2, 0],
                   xp.sqrt(tfm[..., 2, 1] ** 2 + tfm[..., 2, 2] ** 2)))
    return xp.stack(
        [tfm[..., 0, 3], tfm[..., 1, 3], tfm[..., 2, 3], roll, yaw, pitch],
        axis=-1)


def inverse_tfm(tfm):
    """Closed-form inverse of rigid 4x4 transforms (..., 4, 4)."""
    xp = array_namespace(tfm)
    tfm = xp.asarray(tfm)
    rot_t = xp.swapaxes(tfm[..., :3, :3], -1, -2)
    trans = -_matmul(xp, rot_t, tfm[..., :3, 3:4])
    top = xp.concatenate([rot_t, trans], axis=-1)
    bottom = xp.broadcast_to(
        xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=tfm.dtype),
        top.shape[:-2] + (1, 4))
    return xp.concatenate([top, bottom], axis=-2)


def x1_to_x2_tfm(pose1, pose2):
    """T_2<-1 from two poses (ref transformation_utils.py x1_to_x2)."""
    xp = array_namespace(pose1, pose2)
    t_w1 = pose_to_tfm(pose1)
    t_w2 = pose_to_tfm(pose2)
    return _matmul(xp, inverse_tfm(t_w2), t_w1)


def get_pairwise_transformation(lidar_poses, agent_mask):
    """Pairwise T_j<-i for all agent pairs of each sample.

    lidar_poses: (L, 6) or (B, L, 6) padded agent poses (degrees).
    agent_mask:  (L,) or (B, L) bool — padded rows get identity transforms.
    Returns (L, L, 4, 4) / (B, L, L, 4, 4) with ``out[i, j] = T_j<-i``.

    Replaces the python double loop of ref transformation_utils.py:22-67 with
    one batched solve-free composition (inverse(T_wj) @ T_wi).
    """
    xp = array_namespace(lidar_poses, agent_mask)
    poses = xp.asarray(lidar_poses)
    squeeze = poses.ndim == 2
    if squeeze:
        poses = poses[None]
        agent_mask = xp.asarray(agent_mask)[None]
    t_wx = pose_to_tfm(poses)  # (B, L, 4, 4)
    t_xw = inverse_tfm(t_wx)
    # out[b, i, j] = t_xw[b, j] @ t_wx[b, i]
    if xp is np:
        out = np.einsum("bjxy,biyz->bijxz", t_xw, t_wx)
    else:
        out = jnp.einsum("bjxy,biyz->bijxz", t_xw, t_wx, precision=_HI)
    valid = (xp.asarray(agent_mask)[:, :, None] &
             xp.asarray(agent_mask)[:, None, :])  # (B, L, L)
    eye = xp.broadcast_to(xp.eye(4, dtype=out.dtype), out.shape)
    out = xp.where(valid[..., None, None], out, eye)
    return out[0] if squeeze else out


def normalize_pairwise_tfm(pairwise_t_matrix, H: int, W: int,
                           discrete_ratio: float, downsample_rate: float = 1.0):
    """4x4 metric transforms -> 2x3 normalized affines for BEV grid warping.

    Matches ref transformation_utils.py:69-91 (normalize_pairwise_tfm),
    producing the matrix consumed by an ``align_corners=False`` affine grid
    over a (H, W) feature map whose pixel size is
    ``discrete_ratio * downsample_rate`` meters.

    pairwise_t_matrix: (..., 4, 4) -> (..., 2, 3).
    """
    xp = array_namespace(pairwise_t_matrix)
    t = xp.asarray(pairwise_t_matrix)
    a00 = t[..., 0, 0]
    a01 = t[..., 0, 1] * H / W
    a02 = t[..., 0, 3] / (downsample_rate * discrete_ratio * W) * 2
    a10 = t[..., 1, 0] * W / H
    a11 = t[..., 1, 1]
    a12 = t[..., 1, 3] / (downsample_rate * discrete_ratio * H) * 2
    row0 = xp.stack([a00, a01, a02], axis=-1)
    row1 = xp.stack([a10, a11, a12], axis=-1)
    return xp.stack([row0, row1], axis=-2)


def project_points(points, tfm):
    """Apply a 4x4 transform to xyz points, keeping extra channels.

    points: (..., N, 3+C); tfm: (..., 4, 4) -> same shape as points.
    Ref: opencood/utils/box_utils.py:319 project_points_by_matrix_torch.
    """
    xp = array_namespace(points, tfm)
    points = xp.asarray(points)
    tfm = xp.asarray(tfm)
    xyz = points[..., :3]
    rot = tfm[..., :3, :3]
    trans = tfm[..., :3, 3]
    if xp is np:
        new_xyz = np.einsum("...ij,...nj->...ni", rot, xyz) + trans[..., None, :]
    else:
        new_xyz = (jnp.einsum("...ij,...nj->...ni", rot, xyz, precision=_HI)
                   + trans[..., None, :])
    return xp.concatenate([new_xyz, points[..., 3:]], axis=-1)

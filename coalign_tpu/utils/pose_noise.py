"""Pose-error (localization noise) injection — the domain-level fault model.

TPU-first rework of opencood/utils/pose_utils.py: batched, jax.random based
(deterministic per key), operating on padded agent pose tensors.

Noise perturbs (x, y) in meters and yaw in degrees, leaving z/roll/pitch
clean, exactly like ref pose_utils.py:43 (generate_noise) /
:77 (generate_noise_laplace) / :108 (generate_noise_torch, von Mises yaw).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_pose_noise(key, shape, pos_std, rot_std, pos_mean=0.0,
                        rot_mean=0.0, kind: str = "gaussian"):
    """Sample pose noise [dx, dy, 0, 0, dyaw, 0] for ``shape`` agents.

    shape: leading batch shape, e.g. ``(B, L)``. Returns (..., 6).
    kind: 'gaussian' | 'laplace' | 'von_mises' (von Mises affects yaw only,
    with concentration (180 / (pi * rot_std))**2, ref pose_utils.py:134).
    """
    k_pos, k_rot = jax.random.split(key)
    if kind == "gaussian":
        xy = pos_mean + pos_std * jax.random.normal(k_pos, shape + (2,))
        yaw = rot_mean + rot_std * jax.random.normal(k_rot, shape + (1,))
    elif kind == "laplace":
        xy = jax.random.laplace(k_pos, shape + (2,)) * pos_std + pos_mean
        yaw = jax.random.laplace(k_rot, shape + (1,)) * rot_std + rot_mean
    elif kind == "von_mises":
        xy = pos_mean + pos_std * jax.random.normal(k_pos, shape + (2,))
        concentration = (180.0 / (jnp.pi * rot_std)) ** 2
        # sample von Mises in radians then convert to degrees of yaw error
        vm = _sample_von_mises(k_rot, shape + (1,), concentration)
        yaw = jnp.rad2deg(vm) + rot_mean
    else:
        raise ValueError(f"unknown noise kind {kind!r}")
    zeros = jnp.zeros(shape + (1,), dtype=xy.dtype)
    return jnp.concatenate([xy, zeros, zeros, yaw, zeros], axis=-1)


def add_pose_noise(key, lidar_pose, agent_mask=None, pos_std=0.2, rot_std=0.2,
                   pos_mean=0.0, rot_mean=0.0, kind: str = "gaussian"):
    """Return noisy poses; caller keeps the input as ``lidar_pose_clean``.

    lidar_pose: (..., 6). Every agent (including ego) is perturbed, matching
    ref pose_utils.py:10 add_noise_data_dict which loops over all cavs.
    """
    if pos_std == 0.0 and rot_std == 0.0:
        return lidar_pose
    noise = generate_pose_noise(key, jnp.asarray(lidar_pose).shape[:-1],
                                pos_std, rot_std, pos_mean, rot_mean, kind)
    noisy = jnp.asarray(lidar_pose) + noise
    if agent_mask is not None:
        noisy = jnp.where(jnp.asarray(agent_mask)[..., None], noisy,
                          jnp.asarray(lidar_pose))
    return noisy


def _sample_von_mises(key, shape, concentration):
    """Best-of-N wrapped-normal approximation of a von Mises sample.

    For the large concentrations used here (rot_std <= a few degrees,
    kappa >> 1) the von Mises distribution is extremely well approximated by
    a wrapped normal with sigma = 1/sqrt(kappa), which is what the robust-
    V2VNet noise model effectively needs.
    """
    sigma = jax.lax.rsqrt(jnp.asarray(concentration, dtype=jnp.float32))
    raw = sigma * jax.random.normal(key, shape)
    return jnp.mod(raw + jnp.pi, 2 * jnp.pi) - jnp.pi

"""Small shared numeric helpers (ref: opencood/utils/common_utils.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def limit_period(val, offset: float = 0.5, period: float = 2 * np.pi):
    """Wrap ``val`` into ``[-offset*period, (1-offset)*period)``.

    Matches opencood/utils/common_utils.py:70 (limit_period).
    Works on jnp or np arrays.
    """
    xp = jnp if isinstance(val, jnp.ndarray) else np
    return val - xp.floor(val / period + offset) * period


def rotate_points_along_z(points, angle):
    """Rotate batched points around +z.

    points: (B, N, 3[+C]) — xyz in the first 3 channels, extra channels kept.
    angle:  (B,) radians, counter-clockwise around z.

    Matches opencood/utils/common_utils.py:105 (rotate_points_along_z).
    """
    points = jnp.asarray(points)
    angle = jnp.asarray(angle)
    cosa = jnp.cos(angle)[..., None]
    sina = jnp.sin(angle)[..., None]
    x = points[..., :, 0]
    y = points[..., :, 1]
    # elementwise rotation (full f32 on TPU — a matmul here would run at the
    # default bf16 MXU precision and corrupt metric coordinates)
    new_x = x * cosa - y * sina
    new_y = x * sina + y * cosa
    xyz = jnp.stack([new_x, new_y, points[..., :, 2]], axis=-1)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)

"""Small shared numeric helpers (ref: opencood/utils/common_utils.py).

Geometry helpers here and in transforms.py/box_utils.py are DUAL-DISPATCH:
numpy inputs compute in numpy (host data plane — dispatching tiny jnp ops
from dataloader threads round-trips the remote TPU at ~0.2 s/op on the
axon stack), jax arrays/tracers compute in jnp (jit paths unchanged).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def array_namespace(*arrays):
    """numpy for host data (numpy/list inputs), jnp for jax arrays/tracers."""
    for a in arrays:
        if isinstance(a, (jax.Array, jax.core.Tracer)):
            return jnp
    return np


def limit_period(val, offset: float = 0.5, period: float = 2 * np.pi):
    """Wrap ``val`` into ``[-offset*period, (1-offset)*period)``.

    Matches opencood/utils/common_utils.py:70 (limit_period).
    Works on jnp or np arrays.
    """
    xp = array_namespace(val)
    return val - xp.floor(val / period + offset) * period


def rotate_points_along_z(points, angle):
    """Rotate batched points around +z.

    points: (B, N, 3[+C]) — xyz in the first 3 channels, extra channels kept.
    angle:  (B,) radians, counter-clockwise around z.

    Matches opencood/utils/common_utils.py:105 (rotate_points_along_z).
    """
    xp = array_namespace(points, angle)
    points = xp.asarray(points)
    angle = xp.asarray(angle)
    cosa = xp.cos(angle)[..., None]
    sina = xp.sin(angle)[..., None]
    x = points[..., :, 0]
    y = points[..., :, 1]
    # elementwise rotation (full f32 on TPU — a matmul here would run at the
    # default bf16 MXU precision and corrupt metric coordinates)
    new_x = x * cosa - y * sina
    new_y = x * sina + y * cosa
    xyz = xp.stack([new_x, new_y, points[..., :, 2]], axis=-1)
    return xp.concatenate([xyz, points[..., 3:]], axis=-1)

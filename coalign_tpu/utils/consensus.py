"""Grid-search 2D registration consensus (robust fusion experiments).

TPU-first rework of ref opencood/utils/max_consensus.py: the reference
python-loops over a (dx, dy, dyaw) grid scoring point-set overlap; here the
whole grid is ONE vectorized scoring pass — every candidate transform is
applied to the source keypoints at once and scored by soft nearest-neighbor
consensus against the target set.
"""

from __future__ import annotations

import jax.numpy as jnp


def max_consensus_align(src, src_mask, dst, dst_mask,
                        xy_span=2.0, xy_steps=9, yaw_span_deg=4.0,
                        yaw_steps=9, radius=0.5):
    """Find the (dx, dy, dyaw) grid candidate maximizing point consensus.

    src, dst: (N, 2) / (M, 2) BEV keypoints with bool masks.
    Returns (best (3,) [dx, dy, yaw_rad], score scalar).
    """
    dx = jnp.linspace(-xy_span, xy_span, xy_steps)
    dy = jnp.linspace(-xy_span, xy_span, xy_steps)
    dyaw = jnp.deg2rad(jnp.linspace(-yaw_span_deg, yaw_span_deg, yaw_steps))
    gx, gy, gyaw = jnp.meshgrid(dx, dy, dyaw, indexing="ij")
    cand = jnp.stack([gx.reshape(-1), gy.reshape(-1), gyaw.reshape(-1)],
                     axis=-1)                                   # (C, 3)

    c, s = jnp.cos(cand[:, 2]), jnp.sin(cand[:, 2])
    rx = src[None, :, 0] * c[:, None] - src[None, :, 1] * s[:, None]
    ry = src[None, :, 0] * s[:, None] + src[None, :, 1] * c[:, None]
    moved = jnp.stack([rx + cand[:, 0:1], ry + cand[:, 1:2]], -1)  # (C,N,2)

    d2 = jnp.sum(
        (moved[:, :, None, :] - dst[None, None, :, :]) ** 2, -1)  # (C,N,M)
    d2 = jnp.where(dst_mask[None, None, :], d2, jnp.inf)
    nearest = jnp.min(d2, axis=-1)
    hits = (nearest < radius ** 2) & src_mask[None, :]
    scores = hits.sum(-1)
    best = jnp.argmax(scores)
    return cand[best], scores[best]

"""Lift-Splat-Shoot camera-to-BEV geometry + pooling, fixed-shape.

TPU-first rework of ref opencood/models/lift_splat_shoot.py:65-171 and
opencood/utils/camera_utils.py:137-244: the frustum is a static numpy
constant, camera geometry is one batched einsum chain, and the voxel
pooling (the reference's sorted-cumsum "QuickCumsum" trick, a GPU
workaround for scatter-add) is a plain masked segment_sum over flat BEV
cell ids — scatter-add is exactly what segment_sum lowers to on TPU, and
it differentiates for free.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def depth_discretization(dmin, dmax, nbins, mode="LID"):
    """Depth bin centers (ref camera_utils.py:187)."""
    if mode == "UD":
        size = (dmax - dmin) / nbins
        return dmin + size * np.arange(nbins)
    if mode == "LID":
        size = 2 * (dmax - dmin) / (nbins * (1 + nbins))
        return dmin + size * (np.arange(nbins)
                              * np.arange(1, 1 + nbins)) / 2
    raise NotImplementedError(mode)


def bin_depths(depth_map, mode, dmin, dmax, nbins):
    """Metric depth -> bin index (for depth supervision targets;
    ref camera_utils.py:137-170). Out-of-range -> nbins (ignore)."""
    if mode == "UD":
        size = (dmax - dmin) / nbins
        idx = (depth_map - dmin) / size
    elif mode == "LID":
        size = 2 * (dmax - dmin) / (nbins * (1 + nbins))
        idx = -0.5 + 0.5 * jnp.sqrt(1 + 8 * (depth_map - dmin) / size)
    elif mode == "SID":
        idx = nbins * (jnp.log(1 + depth_map) - math.log(1 + dmin)) / (
            math.log(1 + dmax) - math.log(1 + dmin))
    else:
        raise NotImplementedError(mode)
    idx = jnp.floor(idx)
    bad = (idx < 0) | (idx >= nbins) | ~jnp.isfinite(idx)
    return jnp.where(bad, nbins, idx).astype(jnp.int32)


class LSSSpec(NamedTuple):
    """Static LSS geometry from the yaml ``grid_conf`` / ``data_aug_conf``."""

    xbound: tuple   # (min, max, step)
    ybound: tuple
    zbound: tuple
    ddiscr: tuple   # (dmin, dmax, nbins)
    mode: str
    final_dim: tuple  # (H, W) network input image size
    downsample: int   # image feature stride

    @classmethod
    def from_config(cls, grid_conf: dict, data_aug_conf: dict,
                    downsample: int = 8):
        return cls(tuple(grid_conf["xbound"]), tuple(grid_conf["ybound"]),
                   tuple(grid_conf["zbound"]), tuple(grid_conf["ddiscr"]),
                   grid_conf.get("mode", "LID"),
                   tuple(data_aug_conf["final_dim"]), downsample)

    @property
    def nx(self):
        return int(round((self.xbound[1] - self.xbound[0]) / self.xbound[2]))

    @property
    def ny(self):
        return int(round((self.ybound[1] - self.ybound[0]) / self.ybound[2]))

    @property
    def nz(self):
        return int(round((self.zbound[1] - self.zbound[0]) / self.zbound[2]))

    @property
    def depth_bins(self):
        return int(self.ddiscr[2])

    @property
    def feat_hw(self):
        return (self.final_dim[0] // self.downsample,
                self.final_dim[1] // self.downsample)

    def frustum(self) -> np.ndarray:
        """(D, fH, fW, 3) static (u, v, depth) pixel grid in ORIGINAL image
        coordinates (ref create_frustum lift_splat_shoot.py:65)."""
        ogh, ogw = self.final_dim
        fh, fw = self.feat_hw
        ds = depth_discretization(*self.ddiscr, self.mode)
        d = np.broadcast_to(ds[:, None, None], (len(ds), fh, fw))
        xs = np.broadcast_to(np.linspace(0, ogw - 1, fw)[None, None, :],
                             d.shape)
        ys = np.broadcast_to(np.linspace(0, ogh - 1, fh)[None, :, None],
                             d.shape)
        return np.stack([xs, ys, d], axis=-1).astype(np.float32)


def get_geometry(frustum, rots, trans, intrins, post_rots, post_trans):
    """Frustum pixel grid -> 3D points in the agent (lidar) frame.

    frustum: (D, fH, fW, 3); rots/intrins/post_rots: (N, 3, 3);
    trans/post_trans: (N, 3) for N cameras of ONE agent frame.
    Returns (N, D, fH, fW, 3). Ref get_geometry lift_splat_shoot.py:80.
    """
    hi = jax.lax.Precision.HIGHEST
    pts = frustum[None] - post_trans[:, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots)
    pts = jnp.einsum("nij,ndhwj->ndhwi", inv_post, pts, precision=hi)
    # (u, v, d) -> (du, dv, d)
    pts = jnp.concatenate(
        [pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)
    combine = jnp.einsum("nij,njk->nik", rots, jnp.linalg.inv(intrins),
                         precision=hi)
    pts = jnp.einsum("nij,ndhwj->ndhwi", combine, pts, precision=hi)
    return pts + trans[:, None, None, None, :]


def voxel_pool(geom, feats, spec: LSSSpec):
    """Splat per-pixel per-depth features onto the BEV grid.

    geom:  (N, D, fH, fW, 3) lidar-frame points.
    feats: (N, D, fH, fW, C) depth-weighted camera features.
    Returns (ny, nx, nz*C) dense BEV (rows = y, cols = x, matching the
    pillar-scatter convention; ref voxel_pooling lift_splat_shoot.py:116,
    note the 2022.10.7 y/x griddify fix).
    ONE agent frame; vmap over agents.
    """
    c = feats.shape[-1]
    ix = jnp.floor((geom[..., 0] - spec.xbound[0])
                   / spec.xbound[2]).astype(jnp.int32)
    iy = jnp.floor((geom[..., 1] - spec.ybound[0])
                   / spec.ybound[2]).astype(jnp.int32)
    iz = jnp.floor((geom[..., 2] - spec.zbound[0])
                   / spec.zbound[2]).astype(jnp.int32)
    valid = ((ix >= 0) & (ix < spec.nx) & (iy >= 0) & (iy < spec.ny)
             & (iz >= 0) & (iz < spec.nz))
    n_cells = spec.nz * spec.ny * spec.nx
    ids = jnp.where(valid, (iz * spec.ny + iy) * spec.nx + ix, n_cells)
    flat_feats = (feats * valid[..., None]).reshape(-1, c)
    pooled = jax.ops.segment_sum(flat_feats, ids.reshape(-1),
                                 num_segments=n_cells + 1)[:-1]
    pooled = pooled.reshape(spec.nz, spec.ny, spec.nx, c)
    # collapse z into channels (ref final.unbind(dim=2) concat)
    return jnp.transpose(pooled, (1, 2, 0, 3)).reshape(
        spec.ny, spec.nx, spec.nz * c)

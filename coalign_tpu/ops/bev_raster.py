"""On-device BEV occupancy rasterization (PIXOR input representation).

TPU-first rework of ref opencood/data_utils/pre_processor/bev_preprocessor.py
:16-107: the reference loops over points on the host in python; here the
(H, W, nz) occupancy bitmap + mean-intensity channel are segment reductions
over flat cell ids, jit/vmap friendly, so rasterization fuses into the same
program as the network.

Geometry convention matches the reference: rows = x axis (L1..L2),
cols = y axis (W1..W2), channels = z slabs (H1..H2) + 1 intensity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BevSpec(NamedTuple):
    """Static PIXOR grid geometry (ref ``geometry_param``)."""

    L1: float
    L2: float
    W1: float
    W2: float
    H1: float
    H2: float
    res: float
    downsample_rate: int = 4

    @classmethod
    def from_config(cls, g: dict):
        return cls(g["L1"], g["L2"], g["W1"], g["W2"], g["H1"], g["H2"],
                   g["res"], g.get("downsample_rate", 4))

    @property
    def nx(self):  # rows (x axis)
        return int(round((self.L2 - self.L1) / self.res))

    @property
    def ny(self):  # cols (y axis)
        return int(round((self.W2 - self.W1) / self.res))

    @property
    def nz(self):
        return int(round((self.H2 - self.H1) / self.res))

    @property
    def input_shape(self):
        return (self.nx, self.ny, self.nz + 1)

    @property
    def label_shape(self):
        return (self.nx // self.downsample_rate,
                self.ny // self.downsample_rate, 7)


def rasterize_bev(points, mask, spec: BevSpec):
    """Points (N, 4) -> (nx, ny, nz+1) occupancy grid + mean intensity.

    ONE frame; vmap for batches. Matches ref bev_preprocessor.preprocess.
    """
    x, y, z, inten = (points[:, 0], points[:, 1], points[:, 2], points[:, 3])
    ix = jnp.floor((x - spec.L1) / spec.res).astype(jnp.int32)
    iy = jnp.floor((y - spec.W1) / spec.res).astype(jnp.int32)
    iz = jnp.floor((z - spec.H1) / spec.res).astype(jnp.int32)
    valid = (mask
             & (ix >= 0) & (ix < spec.nx)
             & (iy >= 0) & (iy < spec.ny)
             & (iz >= 0) & (iz < spec.nz))
    n_cell3 = spec.nx * spec.ny * spec.nz
    ids3 = jnp.where(valid, (ix * spec.ny + iy) * spec.nz + iz, n_cell3)
    occ = jax.ops.segment_max(
        valid.astype(points.dtype), ids3, num_segments=n_cell3 + 1)[:-1]
    # segment_max fills empty segments with -inf; empty cells are 0
    occ = jnp.maximum(occ, 0.0).reshape(spec.nx, spec.ny, spec.nz)

    n_cell2 = spec.nx * spec.ny
    ids2 = jnp.where(valid, ix * spec.ny + iy, n_cell2)
    ssum = jax.ops.segment_sum(
        inten * valid.astype(points.dtype), ids2, num_segments=n_cell2 + 1)
    cnt = jax.ops.segment_sum(
        valid.astype(points.dtype), ids2, num_segments=n_cell2 + 1)
    mean_i = (ssum / jnp.maximum(cnt, 1.0))[:-1].reshape(spec.nx, spec.ny)
    return jnp.concatenate([occ, mean_i[..., None]], axis=-1)

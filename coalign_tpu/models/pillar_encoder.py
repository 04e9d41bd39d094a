"""PillarVFE + dense-BEV scatter as one fused flax module.

Replaces the reference triple (SpVoxelPreprocessor -> PillarVFE ->
PointPillarScatter; ref sp_voxel_preprocessor.py:22, pillar_vfe.py:56,
point_pillar_scatter.py:5). Works directly on padded raw point clouds — see
coalign_tpu/ops/pillars.py for the kernel-level rationale.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from coalign_tpu.models.layers import MaskedBatchNorm, compute_dtype
from coalign_tpu.ops import pillars as P


class PillarEncoder(nn.Module):
    """points (F, N, 4) + mask (F, N) -> dense BEV (F, ny, nx, C).

    F = flattened (batch * agents) frames. Matches PillarVFE semantics:
    10-channel decoration, per-point Linear(+BN)+ReLU, max over pillar.
    Multi-layer PFN (num_filters longer than 1) follows the reference's
    half-width + max-concat scheme (ref pillar_vfe.py:10-53 PFNLayer).
    """

    spec: P.PillarSpec
    num_filters: Sequence[int] = (64,)
    use_norm: bool = True
    with_distance: bool = False
    use_absolute_xyz: bool = True

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        f, n, _ = points.shape
        ids, valid = jax.vmap(lambda p, m: P.pillar_ids(p, m, self.spec))(
            points, mask)
        # ONE co-sort by pillar id so every downstream segment op skips its
        # internal sort (indices_are_sorted) — the encoder hot spot
        points, ids, valid = jax.vmap(P.sort_points_by_pillar)(
            points, ids, valid)
        feats = jax.vmap(lambda p, i, v: P.decorate_points_sorted(
            p, i, v, self.spec))(points, ids, valid)
        if not self.use_absolute_xyz:
            feats = feats[..., 3:]
        if self.with_distance:
            dist = jnp.linalg.norm(points[..., :3], axis=-1, keepdims=True)
            feats = jnp.concatenate([feats, dist], axis=-1)

        num_seg = self.spec.ny * self.spec.nx + 1
        x = feats
        for i, out_ch in enumerate(self.num_filters):
            last = i == len(self.num_filters) - 1
            units = out_ch if last else out_ch // 2
            x = nn.Dense(units, use_bias=not self.use_norm,
                         dtype=compute_dtype())(x)
            if self.use_norm:
                x = MaskedBatchNorm()(x, mask=valid, train=train)
            x = nn.relu(x) * valid[..., None]
            if not last:
                # per-pillar max gathered back + concat (PFNLayer:46-52)
                def seg_max(xi, idi):
                    return jax.ops.segment_max(xi, idi, num_segments=num_seg,
                                               indices_are_sorted=True)
                pmax = jax.vmap(seg_max)(x, ids)
                pmax = jnp.where(jnp.isneginf(pmax), 0.0, pmax)
                gathered = jnp.take_along_axis(
                    pmax, ids[..., None], axis=1)
                x = jnp.concatenate([x, gathered], axis=-1)

        bev = jax.vmap(lambda xi, i, v: P.scatter_max_bev(
            xi, i, v, self.spec, indices_are_sorted=True))(x, ids, valid)
        return bev

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
    pad_parity: bool = False

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
        # pad_parity tracks what the reference computes for its zeroed
        # pad slots: PillarVFE zeroes decorated pad rows (pillar_vfe.py
        # forward tail ``features *= mask``) but still runs them through
        # Linear+BN+ReLU and INCLUDES them in the per-pillar max — so each
        # non-empty, non-full pillar's max has an extra relu(BN(W·0))
        # participant. Required for imported reference checkpoints to
        # reproduce reference activations (utils/ckpt_import.py); exact in
        # eval mode (running stats), while train mode keeps this package's
        # masked batch statistics.
        z = jnp.zeros((1, 1) + feats.shape[2:]) if self.pad_parity else None
        for i, out_ch in enumerate(self.num_filters):
            last = i == len(self.num_filters) - 1
            units = out_ch if last else out_ch // 2
            dense = nn.Dense(units, use_bias=not self.use_norm,
                             dtype=compute_dtype())
            norm = MaskedBatchNorm() if self.use_norm else None
            x = dense(x)
            if norm is not None:
                x = norm(x, mask=valid, train=train)
            x = nn.relu(x) * valid[..., None]
            if z is not None:
                z = dense(z)
                if norm is not None:
                    # always the running-stats path: the pad track must not
                    # pollute (or double-write) the batch statistics
                    z = norm(z, train=False)
                z = nn.relu(z)

            def seg_max(xi, idi):
                return jax.ops.segment_max(xi, idi, num_segments=num_seg,
                                           indices_are_sorted=True)

            if not last:
                # per-pillar max gathered back + concat (PFNLayer:46-52)
                pmax = jax.vmap(seg_max)(x, ids)
                pmax = jnp.where(jnp.isneginf(pmax), 0.0, pmax)
                if z is not None:
                    pmax = jnp.maximum(pmax, z)
                gathered = jnp.take_along_axis(
                    pmax, ids[..., None], axis=1)
                x = jnp.concatenate([x, gathered], axis=-1)
                if z is not None:
                    # pad rows concat their own features with the pillar
                    # max -> per-pillar track from here on
                    z = jnp.concatenate(
                        [jnp.broadcast_to(z, pmax.shape), pmax], axis=-1)

        # NOTE raced alternative (2026-08, v5e, OPV2V scale): the
        # sentinel-free scatter (P.scatter_max_bev_nosentinel, saves the
        # canvas slice+retile) ties at B=1 (47.9 vs 47.6 fps) but is 2.3x
        # SLOWER at B=4 (217 vs 97 ms) in both vmapped and flat-id forms —
        # the 140800-row (1100x128 exact) canvas tiling appears to hit a
        # pathological XLA layout at F=20. Keep the sentinel form.
        # custom-VJP scatter: identical forward; the hand-written backward
        # does 2 canvas gathers instead of autodiff's 4 + extra scatter
        # (~9 ms of the 82 ms OPV2V train step, device-traced 2026-08-20).
        # RACED (r5): the batch-aware flat-global-index call (no vmap,
        # scatter_max_bev_cvjp batched path) shrinks the backward gather
        # but adds layout copies around the flat reshape — B=4 train
        # measured 20.2 vs 20.8 fps, B=1 14.09 vs 13.93 (v5e 2026-08-20).
        # The vmapped form stays; the batched impl remains available.
        # RACED AGAIN (r5, no-sentinel batched global-id form): B=1 infer
        # 48.9 (+0.9%) but B=4 infer 20.4 and B=4 train 11.9 — the same
        # pathological XLA canvas layout at F=20 the r4 nosentinel race
        # hit. The vmapped per-frame sentinel form stays.
        bev = jax.vmap(lambda xi, i, v: P.scatter_max_bev_cvjp(
            xi, i, v, self.spec))(x, ids, valid)
        if z is not None:
            counts = jax.vmap(lambda i, v: P.pillar_count_bev(
                i, v, self.spec))(ids, valid)
            zmap = jnp.broadcast_to(
                z, (f, num_seg, z.shape[-1]))[:, :-1, :].reshape(bev.shape)
            bev = jnp.where(counts[..., None] > 0,
                            jnp.maximum(bev, zmap), bev)
        return bev

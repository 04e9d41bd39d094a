"""Masked ball query + grouping (pointnet2) as fixed-shape TPU ops.

Replaces the reference's CUDA pointnet2 stack (ref opencood/pcdet_utils/
pointnet2/pointnet2_stack/{pointnet2_utils.py,pointnet2_modules.py}) used
by VSA keypoint feature extraction (ref opencood/models/sub_modules/
vsa.py:45) and RoI grid pooling.

Design notes (TPU-first):
  * The CUDA ball query walks support points serially and keeps the FIRST
    ``nsample`` within the radius. Here the (K, N) squared-distance matrix
    is built from one (K, 3) x (3, N) matmul (MXU) chunked over queries,
    and ``nsample`` NEAREST in-radius points are selected with top_k —
    deterministic and never worse than first-found.
  * Everything is padded/masked: invalid supports get +inf distance,
    queries with no in-radius support produce an all-False group mask.
  * Grouping returns (K, nsample, 3 + C) tensors — recentred xyz
    concatenated with gathered features (use_xyz=True semantics) — which
    one big Dense+BN+ReLU + max then reduces (StackSAModuleMSG).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from coalign_tpu.models.layers import MaskedBatchNorm


def masked_ball_query(new_xyz, new_mask, xyz, mask, radius: float,
                      nsample: int, chunk: int = 512):
    """Fixed-shape ball query.

    new_xyz: (K, 3) query centers; new_mask (K,) bool
    xyz:     (N, 3) support points; mask (N,) bool
    Returns idx (K, nsample) int32 into xyz, valid (K, nsample) bool.
    """
    k = new_xyz.shape[0]
    n = xyz.shape[0]
    nsample = min(nsample, n)
    sq_support = jnp.sum(xyz * xyz, axis=-1)          # (N,)
    inf = jnp.float32(jnp.inf)

    def one_chunk(q):
        # (C, N) squared distances via the matmul identity
        d2 = (jnp.sum(q * q, axis=-1)[:, None] + sq_support[None, :]
              - 2.0 * q @ xyz.T)
        d2 = jnp.where(mask[None, :], d2, inf)
        neg, idx = jax.lax.top_k(-d2, nsample)        # nearest nsample
        valid = (-neg) <= radius * radius
        return idx.astype(jnp.int32), valid

    pad = (-k) % chunk
    q = jnp.pad(new_xyz.astype(jnp.float32), ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, 3)
    idx, valid = jax.lax.map(one_chunk, q)
    idx = idx.reshape(-1, nsample)[:k]
    valid = valid.reshape(-1, nsample)[:k] & new_mask[:, None]
    return idx, valid


def group_points(new_xyz, xyz, feats, idx, valid):
    """Gather + recentre groups.

    new_xyz (K, 3); xyz (N, 3); feats (N, C) or None; idx/valid (K, S).
    Returns (K, S, 3 [+ C]) with invalid rows zeroed.
    """
    grouped_xyz = xyz[idx] - new_xyz[:, None, :]       # (K, S, 3)
    parts = [grouped_xyz]
    if feats is not None:
        parts.append(feats[idx])
    out = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    return out * valid[..., None]


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (ref pointnet2_modules.py
    StackSAModuleMSG): per radius branch, ball query -> group -> shared
    MLP (Dense+BN+ReLU stack) -> max over samples; branches concat.

    Batch-first: the pure gather ops are vmapped over frames while the
    Dense/BN params stay shared (one MXU matmul over all frames)."""

    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # hidden widths per branch

    @nn.compact
    def __call__(self, new_xyz, new_mask, xyz, mask, feats=None,
                 train: bool = False):
        """new_xyz (F, K, 3) + mask (F, K); xyz (F, N, 3) + mask (F, N);
        feats (F, N, C) | None.
        Returns (F, K, sum(mlps[-1])) pooled features (masked zero)."""
        outs = []
        for radius, nsample, widths in zip(self.radii, self.nsamples,
                                           self.mlps):
            idx, valid = jax.vmap(
                lambda q, qm, s, sm: masked_ball_query(
                    q, qm, s, sm, radius, nsample))(
                new_xyz, new_mask, xyz, mask)
            if feats is None:
                g = jax.vmap(
                    lambda q, s, i, v: group_points(q, s, None, i, v))(
                    new_xyz, xyz, idx, valid)
            else:
                g = jax.vmap(group_points)(new_xyz, xyz, feats, idx, valid)
            for w in widths:                           # (F, K, S, ch)
                g = nn.Dense(w, use_bias=False)(g)
                g = MaskedBatchNorm()(g, mask=valid, train=train)
                g = nn.relu(g) * valid[..., None]
            outs.append(jnp.max(g, axis=2))            # (F, K, w)
        out = jnp.concatenate(outs, axis=-1)
        return out * new_mask[..., None]

"""Robust V2VNet: learned pose correction + global consistency + agent
attention (ref opencood/models/sub_modules/v2v_robust_module.py,
opencood/models/point_pillar_v2vnet_robust.py:21).

TPU-first redesign notes:
  * The reference runs python double loops over (batch, ego) and a t-dist
    weighted EM (``WeightedEM:227``) with per-sample dynamic graphs. Here
    every stage is batched over the full padded (B, L, L) pair grid:
    one conv-net call scores/corrects ALL pairs at once.
  * The global-consistency step becomes a masked weighted least-squares
    over the agent graph — solve for absolute (x, y, yaw) per agent from
    the corrected relative measurements with the ego pinned, a tiny dense
    ``jnp.linalg.solve`` per sample (the small-angle Gauss-Newton step the
    EM converges to).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from coalign_tpu.models.layers import ConvBNReLU
from coalign_tpu.ops.warp import warp_affine
from coalign_tpu.utils.transforms import normalize_pairwise_tfm


def _pairwise_warp(features, affines):
    """Warp every agent j into every agent i's frame.

    features (B, L, H, W, C); affines (B, L, L, 2, 3) with [b, i, j] taking
    j's map into i's frame. Returns (B, L, L, H, W, C)."""
    b, l, h, w, c = features.shape
    feat_rep = jnp.broadcast_to(features[:, None], (b, l, l, h, w, c))
    flat = feat_rep.reshape(b * l * l, h, w, c)
    aff = affines.reshape(b * l * l, 2, 3)
    return jax.vmap(warp_affine)(flat, aff).reshape(b, l, l, h, w, c)


class PairNet(nn.Module):
    """Shared conv trunk on (warped_j, ego_i) concat pairs -> vector."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.hidden, 3, 2, 1)(x, train=train)
        x = ConvBNReLU(self.hidden, 3, 2, 1)(x, train=train)
        x = ConvBNReLU(self.hidden, 3, 2, 1)(x, train=train)
        x = x.mean(axis=(1, 2))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.out,
                        kernel_init=nn.initializers.zeros)(x)


def pose3_to_tfm(p):
    """(..., 3) [x, y, yaw(rad)] -> (..., 4, 4)."""
    x, y, yaw = p[..., 0], p[..., 1], p[..., 2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero, one = jnp.zeros_like(x), jnp.ones_like(x)
    rows = [jnp.stack([c, -s, zero, x], -1),
            jnp.stack([s, c, zero, y], -1),
            jnp.stack([zero, zero, one, zero], -1),
            jnp.stack([zero, zero, zero, one], -1)]
    return jnp.stack(rows, -2)


def tfm_to_pose3(t):
    """(..., 4, 4) -> (..., 3) [x, y, yaw(rad)]."""
    return jnp.stack([t[..., 0, 3], t[..., 1, 3],
                      jnp.arctan2(t[..., 1, 0], t[..., 0, 0])], -1)


def global_consistency(rel_pose, weights, agent_mask):
    """Weighted least-squares absolute poses from relative measurements.

    rel_pose (B, L, L, 3): measurement of (pose_j expressed in i) ~ p_j - p_i
    under small-angle composition; weights (B, L, L); ego (slot 0) pinned.
    Returns consistent pairwise rel poses (B, L, L, 3). Replaces the
    reference's WeightedEM (v2v_robust_module.py:227) with its fixed point.
    """
    b, l = agent_mask.shape
    pair_m = (agent_mask[:, :, None] & agent_mask[:, None, :]).astype(
        rel_pose.dtype)
    w = weights * pair_m
    # unknowns: p_1..p_{L-1} (p_0 = 0). For each measurement (i, j):
    # p_j - p_i = m_ij, weight w_ij. Normal equations per dof share A.
    eye = jnp.eye(l, dtype=rel_pose.dtype)
    deg = w.sum(1) + w.sum(2)                      # (B, L)
    lap = jnp.vectorize(jnp.diag, signature="(l)->(l,l)")(deg) - w - \
        jnp.swapaxes(w, 1, 2)
    rhs = jnp.einsum("bij,bijd->bjd", w, rel_pose) - \
        jnp.einsum("bij,bijd->bid", w, rel_pose)
    # pin ego + padded agents
    pin = ~agent_mask | (jnp.arange(l) == 0)[None]
    lap = jnp.where(pin[:, :, None], eye[None], lap)
    rhs = jnp.where(pin[:, :, None], 0.0, rhs)
    abs_pose = jnp.linalg.solve(lap, rhs)          # (B, L, 3)
    return abs_pose[:, None, :, :] - abs_pose[:, :, None, :]


class RobustFusion(nn.Module):
    """Pose regression -> global consistency -> attention-weighted fusion.

    Operates at full pairwise granularity like the reference's 3 modules.
    Returns (fused (B, H, W, C), aux dict with pose_corr / scores /
    corrected affines for the robust loss)."""

    feature_dim: int
    hidden: int = 128
    downsample_rate: float = 2.0
    discrete_ratio: float = 0.4
    use_consistency: bool = True

    @nn.compact
    def __call__(self, features, pairwise_t_matrix, agent_mask,
                 train: bool = False):
        b, l, h, w, c = features.shape
        affines = normalize_pairwise_tfm(
            pairwise_t_matrix, h, w, self.discrete_ratio,
            self.downsample_rate)
        warped = _pairwise_warp(features, affines)      # (B,L,L,H,W,C)
        ego_rep = jnp.broadcast_to(features[:, :, None],
                                   warped.shape)
        pairs = jnp.concatenate([warped, ego_rep], axis=-1)
        flat = pairs.reshape(b * l * l, h, w, 2 * c)

        pose_corr = PairNet(self.hidden, 3, name="pose_regression")(
            flat, train=train).reshape(b, l, l, 3)
        score = PairNet(self.hidden, 1, name="attention")(
            flat, train=train).reshape(b, l, l)
        score = jax.nn.sigmoid(score)

        # corrected relative transforms: T_new = T(pose_corr) @ T_old
        t_new = pose3_to_tfm(pose_corr) @ pairwise_t_matrix

        if self.use_consistency:
            rel = tfm_to_pose3(t_new)
            rel_cons = global_consistency(rel, score, agent_mask)
            t_new = pose3_to_tfm(rel_cons)

        alpha = self.param("alpha", nn.initializers.constant(0.15), (1,))
        pair_m = (agent_mask[:, :, None] & agent_mask[:, None, :])
        score = jnp.where(pair_m, score, 0.0)
        weight = score / (score.sum(2, keepdims=True) + alpha + 1e-4)

        # fuse on the ego row with corrected warps
        aff_new = normalize_pairwise_tfm(
            t_new, h, w, self.discrete_ratio, self.downsample_rate)
        ego_warped = _pairwise_warp(features, aff_new)[:, 0]  # (B,L,H,W,C)
        fused = jnp.einsum("bl,blhwc->bhwc", weight[:, 0], ego_warped)

        aux = {"pose_corr": pose_corr, "agent_scores": score,
               "pairwise_t_corrected": t_new}
        return fused, aux

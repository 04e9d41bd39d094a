"""Deformable-attention fusion (pure XLA, no CUDA extension).

TPU-first rework of ref opencood/models/sub_modules/ms_deform_attn.py +
functions/ms_deform_attn_func.py:18: the reference imports an external
compiled MultiScaleDeformableAttention CUDA op; deformable sampling is just
bilinear interpolation at learned offsets, which is a batched gather
(ops/warp._bilinear_gather). Each ego pixel attends to K learned sample
points per (warped) agent map with learned per-point weights.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from coalign_tpu.ops.warp import _bilinear_gather, warp_agents_to_ego


class DeformableFusion(nn.Module):
    """features (B, L, H, W, C) + affines + agent_mask -> (B, H, W, C)."""

    feature_dim: int
    num_points: int = 4

    @nn.compact
    def __call__(self, features, affines, agent_mask, train: bool = False):
        warped = warp_agents_to_ego(features, affines[:, 0], agent_mask)
        b, l, h, w, c = warped.shape
        q = warped[:, 0]  # ego query map (B, H, W, C)
        k = self.num_points

        # per (pixel, agent, sample): 2 offsets + 1 weight logit
        head = nn.Dense(l * k * 3,
                        kernel_init=nn.initializers.zeros)(q)
        head = head.reshape(b, h, w, l, k, 3)
        offsets = jnp.tanh(head[..., :2]) * 4.0   # bounded pixel offsets
        logits = head[..., 2]                     # (B, H, W, L, K)

        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        fy = ys[None, :, :, None, None] + offsets[..., 1]
        fx = xs[None, :, :, None, None] + offsets[..., 0]

        # per (b, l) agent map: gather K samples per pixel
        fx_bl = jnp.moveaxis(fx, 3, 1)  # (B, L, H, W, K)
        fy_bl = jnp.moveaxis(fy, 3, 1)
        # ONE flat batch dim (nested-vmap gathers are pathological on TPU,
        # see ops/warp.py warp_agents_to_ego)
        c = warped.shape[-1]
        sampled = jax.vmap(_bilinear_gather)(
            warped.reshape(b * l, h, w, c),
            fx_bl.reshape(b * l, h, w, k),
            fy_bl.reshape(b * l, h, w, k))
        sampled = sampled.reshape(b, l, h, w, k, c)

        logits = jnp.where(agent_mask[:, None, None, :, None],
                           logits, -jnp.inf)
        attn = jax.nn.softmax(logits.reshape(b, h, w, l * k), axis=-1)
        attn = attn.reshape(b, h, w, l, k)
        fused = jnp.einsum("bhwlk,blhwkc->bhwc", attn, sampled)
        return fused + q  # residual keeps early training stable
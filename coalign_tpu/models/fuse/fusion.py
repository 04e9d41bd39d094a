"""Intermediate BEV fusion zoo — batched, masked, warp-then-reduce.

TPU-first rework of opencood/models/fuse_modules/fusion_in_one.py. The
reference regroups a flattened (sum(n_cav), C, H, W) tensor with record_len
and loops python-side per sample; here every fusion is one batched op on
padded (B, L, H, W, C) tensors with an agent mask:

  1. warp every agent's map into the ego frame (ops/warp.py)
  2. masked reduction over the agent axis L

MaxFusion == F-Cooper (ref fusion_in_one.py:47); AttFusion == Self-Att /
CoAlign per-scale fusion (ref :91) — per-pixel scaled-dot-product attention
across agents, computed only for the ego query (the reference computes full
LxL attention and keeps row 0).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from coalign_tpu.ops.warp import warp_agents_to_ego


class MaxFusion(nn.Module):
    """Elementwise max over agents (F-Cooper)."""

    @nn.compact
    def __call__(self, features, affines, agent_mask, train: bool = False):
        """features (B, L, H, W, C); affines (B, L, L, 2, 3) normalized
        pairwise matrix ([b, i, j] samples j's map into frame i);
        agent_mask (B, L) -> fused (B, H, W, C)."""
        warped = warp_agents_to_ego(features, affines[:, 0], agent_mask)
        neg = jnp.finfo(features.dtype).min
        masked = jnp.where(agent_mask[..., None, None, None], warped, neg)
        out = jnp.max(masked, axis=1)
        # ego (l=0) is always valid, but guard fully-masked batches anyway
        return jnp.where(jnp.any(agent_mask, axis=1)[:, None, None, None],
                         out, 0.0)


class MeanFusion(nn.Module):
    """Masked average over warped agents (ref mean_fuse.py:20)."""

    @nn.compact
    def __call__(self, features, affines, agent_mask, train: bool = False):
        warped = warp_agents_to_ego(features, affines[:, 0], agent_mask)
        m = agent_mask[..., None, None, None].astype(features.dtype)
        return (warped * m).sum(1) / jnp.maximum(m.sum(1), 1.0)


class AttFusion(nn.Module):
    """Per-pixel cross-agent scaled-dot-product attention, ego query.

    Equivalent to ref fusion_in_one.py:91-136 + att_fuse.py
    ScaledDotProductAttention with the ego row selected.
    """

    feature_dim: int

    @nn.compact
    def __call__(self, features, affines, agent_mask, train: bool = False):
        """affines: full (B, L, L, 2, 3) pairwise matrix; ego row used."""
        x = warp_agents_to_ego(features, affines[:, 0], agent_mask)
        c = x.shape[-1]
        q = x[:, 0]  # ego query (B, H, W, C)
        # scores (B, L, H, W) = <q, k_j> / sqrt(C) per pixel
        scores = jnp.einsum("bhwc,blhwc->blhw", q, x) / np.sqrt(c)
        scores = jnp.where(agent_mask[:, :, None, None], scores, -jnp.inf)
        att = jnp.exp(scores - jnp.max(scores, axis=1, keepdims=True))
        att = jnp.where(agent_mask[:, :, None, None], att, 0.0)
        att = att / jnp.maximum(jnp.sum(att, axis=1, keepdims=True), 1e-9)
        return jnp.einsum("blhw,blhwc->bhwc", att, x)


def _v2vnet(args, dim):
    from coalign_tpu.models.fuse.graph_fusion import V2VNetFusion
    sub = args.get("v2vnet", args.get("v2v_fusion", {}))
    # yaml forms: 3 | [3] | [[3, 3]] (ref conv_gru kernel_size nesting)
    ks = sub.get("conv_gru", {}).get("kernel_size", 3)
    while isinstance(ks, (list, tuple)):
        ks = ks[0]
    return V2VNetFusion(
        in_channels=sub.get("in_channels", dim),
        num_iteration=sub.get("num_iteration", 2),
        agg_operator=sub.get("agg_operator", "avg"),
        gru_flag=sub.get("gru_flag", True),
        kernel_size=int(ks),
    )


def _disconet(args, dim):
    from coalign_tpu.models.fuse.graph_fusion import DiscoFusion
    return DiscoFusion(dim)


def _when2comm(args, dim):
    from coalign_tpu.models.fuse.graph_fusion import When2commFusion
    sub = args.get("when2comm", {})
    return When2commFusion(
        in_channels=sub.get("in_channels", dim),
        query_size=sub.get("query_size", 32),
        key_size=sub.get("key_size", 256),
    )


def _v2xvit(args, dim):
    from coalign_tpu.models.fuse.v2xvit import V2XViTFusion
    return V2XViTFusion.from_yaml(args["v2xvit"], dim)


def _deform(args, dim):
    from coalign_tpu.models.fuse.deform import DeformableFusion
    return DeformableFusion(
        feature_dim=dim,
        num_points=args.get("deform", {}).get("num_points", 4))


_FUSIONS = {
    "max": lambda args, dim: MaxFusion(),
    "mean": lambda args, dim: MeanFusion(),
    "att": lambda args, dim: AttFusion(dim),
    "deform": _deform,
    "disconet": _disconet,
    "v2vnet": _v2vnet,
    "when2comm": _when2comm,
    "v2xvit": _v2xvit,
}


def build_fusion(method: str, args: dict, feature_dim: int):
    """Build a fusion module by yaml name (``fusion_method``)."""
    if method not in _FUSIONS:
        raise KeyError(f"unknown fusion {method!r}; have {sorted(_FUSIONS)}")
    return _FUSIONS[method](args, feature_dim)


def register_fusion(name: str, factory):
    _FUSIONS[name] = factory

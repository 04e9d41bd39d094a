"""V2X-ViT fusion: heterogeneous multi-agent transformer with pyramid
window attention.

TPU-first rework of ref opencood/models/sub_modules/v2xvit_basic.py
(V2XTransformer:183, V2XTEncoder:125), hmsa.py (HGTCavAttention:7,
CavAttention in base_transformer.py:32), mswin.py (BaseWindowAttention:19,
PyramidWindowAttention:85) and split_attn.py (SplitAttn:30).

Differences from the reference (all TPU-motivated, semantics preserved):
  * per-type linear loops in HGT attention become one-hot-selected batched
    projections (no python loops over agents);
  * window partition pads H/W up to a window multiple and masks, instead of
    requiring divisibility (the reference hard-crashes on 50x176 maps
    otherwise);
  * time-delay (RTE) and velocity priors are carried as zeros like the
    reference's own wiring (fusion_in_one.py:295-352 passes zero
    prior_encoding and identity spatial correction);
  * LayerNorms pin the torch default eps 1e-5 (flax defaults to 1e-6) —
    at out-of-warp-bounds pixels the feature variance collapses to ~0 and
    the eps mismatch would dominate the normalized output there.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.ops.warp import warp_agents_to_ego


class CavAttention(nn.Module):
    """Per-pixel multi-head attention across agents (base_transformer.py:32)."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, agent_mask):
        # x: (B, L, H, W, C)
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (B, L, H, W, M, c)
            return t.reshape(t.shape[:-1] + (self.heads, self.dim_head))

        q, k, v = heads(q), heads(k), heads(v)
        scale = self.dim_head ** -0.5
        att = jnp.einsum("bihwmc,bjhwmc->bmhwij", q, k) * scale
        att = jnp.where(agent_mask[:, None, None, None, None, :],
                        att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bmhwij,bjhwmc->bihwmc", att, v)
        out = out.reshape(out.shape[:-2] + (inner,))
        return nn.Dense(self.dim, name="to_out")(out)


class HGTCavAttention(nn.Module):
    """Heterogeneous (agent-type aware) cav attention (hmsa.py:7).

    types: (B, L) int in [0, num_types) — 0=vehicle, 1=infrastructure.
    """

    dim: int
    heads: int
    dim_head: int
    num_types: int = 2

    @nn.compact
    def __call__(self, x, agent_mask, types=None):
        b, l, h, w, c = x.shape
        if types is None:
            types = jnp.zeros((b, l), jnp.int32)
        inner = self.heads * self.dim_head
        num_rel = self.num_types * self.num_types

        onehot = jax.nn.one_hot(types, self.num_types, dtype=x.dtype)  # (B,L,T)

        def apply_typed(t, name, in_features, out_dim):
            wgt = self.param(name + "_w", nn.initializers.lecun_normal(),
                             (self.num_types, in_features, out_dim))
            bias = self.param(name + "_b", nn.initializers.zeros,
                              (self.num_types, out_dim))
            w_sel = jnp.einsum("blt,tio->blio", onehot, wgt)
            b_sel = jnp.einsum("blt,to->blo", onehot, bias)
            return (jnp.einsum("blhwi,blio->blhwo", t, w_sel)
                    + b_sel[:, :, None, None, :])

        q = apply_typed(x, "q", c, inner)
        k = apply_typed(x, "k", c, inner)
        v = apply_typed(x, "v", c, inner)

        rel_att = self.param("relation_att", nn.initializers.xavier_uniform(),
                             (num_rel, self.heads, self.dim_head,
                              self.dim_head))
        rel_msg = self.param("relation_msg", nn.initializers.xavier_uniform(),
                             (num_rel, self.heads, self.dim_head,
                              self.dim_head))
        # edge type between receiver i and sender j
        etype = types[:, :, None] * self.num_types + types[:, None, :]
        rel_onehot = jax.nn.one_hot(etype, num_rel, dtype=x.dtype)  # (B,i,j,R)
        w_att = jnp.einsum("bijr,rmpq->bmijpq", rel_onehot, rel_att)
        w_msg = jnp.einsum("bijr,rmpq->bmijpq", rel_onehot, rel_msg)

        def heads(t):
            return t.reshape(t.shape[:-1] + (self.heads, self.dim_head))

        qh, kh, vh = heads(q), heads(k), heads(v)  # (B, L, H, W, M, c)
        scale = self.dim_head ** -0.5
        att = jnp.einsum("bihwmp,bmijpq,bjhwmq->bmhwij", qh, w_att, kh) * scale
        att = jnp.where(agent_mask[:, None, None, None, None, :],
                        att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        v_msg = jnp.einsum("bmijpq,bjhwmp->bmhwijq", w_msg, vh)
        out = jnp.einsum("bmhwij,bmhwijq->bihwmq", att, v_msg)
        out = out.reshape(out.shape[:-2] + (inner,))
        return apply_typed(out, "a", inner, self.dim)


class WindowAttention(nn.Module):
    """Windowed multi-head self-attention with relative position bias
    (mswin.py:19 BaseWindowAttention); pads H/W to a window multiple."""

    dim: int
    heads: int
    dim_head: int
    window_size: int
    relative_pos_embedding: bool = True

    @nn.compact
    def __call__(self, x):
        b, l, h, w, c = x.shape
        ws = self.window_size
        inner = self.heads * self.dim_head
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        nh, nw = hp // ws, wp // ws

        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(xp)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def windows(t):
            t = t.reshape(b, l, nh, ws, nw, ws, self.heads, self.dim_head)
            return t.transpose(0, 1, 6, 2, 4, 3, 5, 7).reshape(
                b, l, self.heads, nh * nw, ws * ws, self.dim_head)

        qw, kw, vw = windows(q), windows(k), windows(v)
        dots = jnp.einsum("blmhic,blmhjc->blmhij", qw, kw) * self.dim_head ** -0.5

        if self.relative_pos_embedding:
            pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (2 * ws - 1, 2 * ws - 1))
            idx = np.array([[xx, yy] for xx in range(ws) for yy in range(ws)])
            rel = idx[None, :, :] - idx[:, None, :] + ws - 1  # (K, K, 2)
            bias = pos[rel[..., 0], rel[..., 1]]
        else:
            bias = self.param("pos_embedding", nn.initializers.normal(1.0),
                              (ws * ws, ws * ws))
        dots = dots + bias

        # mask padded pixels out of the softmax
        valid = jnp.ones((hp, wp), bool).at[h:, :].set(False).at[:, w:].set(False)
        vwin = valid.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3).reshape(
            nh * nw, ws * ws)
        dots = jnp.where(vwin[None, None, None, :, None, :], dots, -jnp.inf)
        att = jax.nn.softmax(dots, axis=-1)
        att = jnp.where(jnp.isnan(att), 0.0, att)

        out = jnp.einsum("blmhij,blmhjc->blmhic", att, vw)
        out = out.reshape(b, l, self.heads, nh, nw, ws, ws, self.dim_head)
        out = out.transpose(0, 1, 3, 5, 4, 6, 2, 7).reshape(b, l, hp, wp, inner)
        out = out[:, :, :h, :w]
        return nn.Dense(self.dim, name="to_out")(out)


class SplitAttn(nn.Module):
    """Radix-3 split attention over the pyramid outputs (split_attn.py:30)."""

    input_dim: int

    @nn.compact
    def __call__(self, window_list):
        assert len(window_list) == 3
        sw, mw, bw = window_list
        gap = (sw + mw + bw).mean(axis=(2, 3), keepdims=True)  # (B,L,1,1,C)
        gap = nn.Dense(self.input_dim, use_bias=False, name="fc1")(gap)
        gap = nn.relu(nn.LayerNorm(name="bn1", epsilon=1e-5)(gap))
        attn = nn.Dense(self.input_dim * 3, use_bias=False, name="fc2")(gap)
        b, l = attn.shape[:2]
        attn = attn.reshape(b, l, 1, 1, 3, self.input_dim)
        attn = jax.nn.softmax(attn, axis=4)
        return (sw * attn[..., 0, :] + mw * attn[..., 1, :]
                + bw * attn[..., 2, :])


class PyramidWindowAttention(nn.Module):
    dim: int
    heads: Sequence[int]
    dim_heads: Sequence[int]
    window_sizes: Sequence[int]
    relative_pos_embedding: bool = True
    fuse_method: str = "split_attn"

    @nn.compact
    def __call__(self, x):
        outs = [
            WindowAttention(self.dim, h, dh, ws,
                            self.relative_pos_embedding)(x)
            for h, dh, ws in zip(self.heads, self.dim_heads,
                                 self.window_sizes)
        ]
        if self.fuse_method == "naive":
            return sum(outs) / len(outs)
        return SplitAttn(self.dim)(outs)


class V2XViTFusion(nn.Module):
    """Full V2X-ViT encoder applied to ego-warped agent features."""

    dim: int
    depth: int = 3
    num_blocks: int = 1
    cav_heads: int = 8
    cav_dim_head: int = 32
    use_hetero: bool = True
    pw_heads: Sequence[int] = (16, 8, 4)
    pw_dim_heads: Sequence[int] = (16, 32, 64)
    window_sizes: Sequence[int] = (4, 8, 16)
    relative_pos_embedding: bool = True
    pw_fuse_method: str = "split_attn"
    mlp_dim: int = 256

    @classmethod
    def from_yaml(cls, args: dict, dim: int):
        enc = args["transformer"]["encoder"]
        cav = enc["cav_att_config"]
        pw = enc["pwindow_att_config"]
        return cls(
            dim=cav.get("dim", dim),
            depth=enc.get("depth", 3),
            num_blocks=enc.get("num_blocks", 1),
            cav_heads=cav.get("heads", 8),
            cav_dim_head=cav.get("dim_head", 32),
            use_hetero=cav.get("use_hetero", True),
            pw_heads=tuple(pw.get("heads", (16, 8, 4))),
            pw_dim_heads=tuple(pw.get("dim_head", (16, 32, 64))),
            window_sizes=tuple(pw.get("window_size", (4, 8, 16))),
            relative_pos_embedding=pw.get("relative_pos_embedding", True),
            pw_fuse_method=pw.get("fusion_method", "split_attn"),
            mlp_dim=enc.get("feed_forward", {}).get("mlp_dim", 256),
        )

    @nn.compact
    def __call__(self, features, affines, agent_mask, train: bool = False):
        """features (B, L, H, W, C); affines (B, L, L, 2, 3); mask (B, L)."""
        x = warp_agents_to_ego(features, affines[:, 0], agent_mask)
        types = None  # prior encoding is zero in the reference wiring
        for _ in range(self.depth):
            for _ in range(self.num_blocks):
                att_in = nn.LayerNorm(epsilon=1e-5)(x)
                if self.use_hetero:
                    att = HGTCavAttention(self.dim, self.cav_heads,
                                          self.cav_dim_head)(
                        att_in, agent_mask, types)
                else:
                    att = CavAttention(self.dim, self.cav_heads,
                                       self.cav_dim_head)(att_in, agent_mask)
                x = x + att
                pw_in = nn.LayerNorm(epsilon=1e-5)(x)
                x = x + PyramidWindowAttention(
                    self.dim, self.pw_heads, self.pw_dim_heads,
                    self.window_sizes, self.relative_pos_embedding,
                    self.pw_fuse_method)(pw_in)
            ff_in = nn.LayerNorm(epsilon=1e-5)(x)
            ff = nn.Dense(self.mlp_dim)(ff_in)
            ff = nn.gelu(ff)
            ff = nn.Dense(self.dim)(ff)
            x = x + ff
        return x[:, 0]

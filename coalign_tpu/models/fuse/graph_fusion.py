"""DiscoNet, V2VNet and When2comm fusion — batched, masked, loop-free.

TPU-first rework of ref fusion_in_one.py:138-431 (+ disco_fuse.py,
convgru.py, when2com_fuse.py). The reference's per-sample / per-agent python
loops become vmapped warps and masked reductions over the padded agent axis:

  * DiscoFusion: pixel-weight MLP on (warped_j, ego) concat -> masked
    softmax over agents -> weighted sum (ref fusion_in_one.py:138).
  * V2VNetFusion: num_iteration rounds of all-to-all message passing — warp
    every sender j into every receiver i (L x L warps, batched), message
    CNN, masked mean/max aggregation with the warped-ones ROI mask, ConvGRU
    node update (ref fusion_in_one.py:173, convgru.py ConvGRUCell).
  * When2commFusion: learned query/key handshake over ego-warped agents
    (policy net -> key/query MLPs -> additive attention, softmax)
    (ref fusion_in_one.py:354, when2com_fuse.py:237-363).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from coalign_tpu.models.layers import ConvBNReLU
from coalign_tpu.ops.warp import warp_affine, warp_agents_to_ego


class PixelWeightLayer(nn.Module):
    """1x1-conv stack 2C -> 128 -> 32 -> 8 -> 1 (ref disco_fuse.py:76)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(128, 1, 1, 0)(x, train=train)
        x = ConvBNReLU(32, 1, 1, 0)(x, train=train)
        x = ConvBNReLU(8, 1, 1, 0)(x, train=train)
        x = nn.relu(nn.Conv(1, (1, 1))(x))
        return x


class DiscoFusion(nn.Module):
    feature_dim: int

    @nn.compact
    def __call__(self, features, affines, agent_mask, train: bool = False):
        """features (B, L, H, W, C), affines (B, L, L, 2, 3) pairwise,
        agent_mask (B, L) -> (B, H, W, C)."""
        warped = warp_agents_to_ego(features, affines[:, 0], agent_mask)
        b, l, h, w, c = warped.shape
        ego = jnp.broadcast_to(warped[:, :1], warped.shape)
        cat = jnp.concatenate([warped, ego], axis=-1).reshape(b * l, h, w, 2 * c)
        logits = PixelWeightLayer()(cat, train=train).reshape(b, l, h, w)
        logits = jnp.where(agent_mask[:, :, None, None], logits, -jnp.inf)
        weight = jax.nn.softmax(logits, axis=1)
        weight = jnp.where(agent_mask[:, :, None, None], weight, 0.0)
        return jnp.einsum("blhw,blhwc->bhwc", weight, warped)


class ConvGRUCell(nn.Module):
    """Convolutional GRU cell (ref convgru.py:7-70)."""

    hidden_dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, h):
        k = self.kernel_size
        pad = [(k // 2, k // 2)] * 2
        combined = jnp.concatenate([x, h], axis=-1)
        gates = nn.Conv(2 * self.hidden_dim, (k, k), padding=pad,
                        name="conv_gates")(combined)
        reset, update = jnp.split(jax.nn.sigmoid(gates), 2, axis=-1)
        cand_in = jnp.concatenate([x, reset * h], axis=-1)
        cand = jnp.tanh(nn.Conv(self.hidden_dim, (k, k), padding=pad,
                                name="conv_can")(cand_in))
        return (1 - update) * h + update * cand


class V2VNetFusion(nn.Module):
    """Iterative GNN message passing over the agent graph."""

    in_channels: int
    num_iteration: int = 2
    agg_operator: str = "avg"
    gru_flag: bool = True
    kernel_size: int = 3

    @nn.compact
    def __call__(self, features, affines, agent_mask, train: bool = False):
        """features (B, L, H, W, C); affines (B, L, L, 2, 3) where
        [b, i, j] samples agent j's map into frame i; agent_mask (B, L)."""
        pairwise_affines = affines
        b, l, h, w, c = features.shape
        msg_cnn = nn.Conv(self.in_channels, (3, 3), padding=[(1, 1)] * 2,
                          name="msg_cnn")
        gru = ConvGRUCell(self.in_channels, self.kernel_size, name="conv_gru")
        mlp = nn.Dense(self.in_channels, name="mlp")

        # ROI mask: warp all-ones maps — marks pixels where sender j actually
        # overlaps receiver i's grid (ref fusion_in_one.py:223-229)
        ones = jnp.ones((b, l, l, h, w, 1), features.dtype)
        flat_aff = pairwise_affines.reshape(b * l * l, 2, 3)
        roi = jax.vmap(warp_affine)(ones.reshape(b * l * l, h, w, 1),
                                    flat_aff).reshape(b, l, l, h, w, 1)
        pair_valid = (agent_mask[:, :, None] & agent_mask[:, None, :])
        roi = roi * pair_valid[..., None, None, None]

        x = features
        for _ in range(self.num_iteration):
            # warp sender j -> receiver i for all pairs: (B, L_i, L_j, H, W, C)
            senders = jnp.broadcast_to(x[:, None], (b, l, l, h, w, c))
            warped = jax.vmap(warp_affine)(
                senders.reshape(b * l * l, h, w, c), flat_aff
            ).reshape(b, l, l, h, w, c)
            receivers = jnp.broadcast_to(x[:, :, None], (b, l, l, h, w, c))
            msg_in = jnp.concatenate([warped, receivers], axis=-1)
            message = msg_cnn(msg_in.reshape(b * l * l, h, w, 2 * c))
            message = message.reshape(b, l, l, h, w, c) * roi

            if self.agg_operator == "avg":
                cnt = jnp.maximum(
                    jnp.sum(pair_valid, axis=2), 1)[:, :, None, None, None]
                agg = jnp.sum(message, axis=2) / cnt
            elif self.agg_operator == "max":
                neg = jnp.finfo(message.dtype).min
                masked = jnp.where(pair_valid[..., None, None, None],
                                   message, neg)
                agg = jnp.max(masked, axis=2)
                agg = jnp.where(agent_mask[..., None, None, None], agg, 0.0)
            else:
                raise ValueError(self.agg_operator)

            cat = jnp.concatenate([x, agg], axis=-1)
            if self.gru_flag:
                x = gru(cat.reshape(b * l, h, w, 2 * c),
                        jnp.zeros((b * l, h, w, c), x.dtype)
                        ).reshape(b, l, h, w, c)
            else:
                x = x + agg
            x = x * agent_mask[..., None, None, None]

        return mlp(x[:, 0])  # ego node, channel MLP (ref :292)


class When2commFusion(nn.Module):
    """Query-key handshake attention over ego-warped agents."""

    in_channels: int
    query_size: int = 32
    key_size: int = 256

    @nn.compact
    def __call__(self, features, affines, agent_mask, train: bool = False):
        warped = warp_agents_to_ego(features, affines[:, 0], agent_mask)
        b, l, h, w, c = warped.shape
        flat = warped.reshape(b * l, h, w, c)

        # policy net (ref when2com_fuse.py:274 policy_net4): 4x downsample
        x = ConvBNReLU(512, 3, 1, 1)(flat, train=train)
        x = ConvBNReLU(256, 3, 1, 1)(x, train=train)
        x = ConvBNReLU(256, 3, 2, 1)(x, train=train)
        x = ConvBNReLU(256, 3, 1, 1)(x, train=train)
        x = ConvBNReLU(256, 3, 2, 1)(x, train=train)

        # km_generator_v2 (ref :253): conv s2 + adaptive avgpool (5,7) + MLP
        def km_head(feat, out_size, name):
            y = ConvBNReLU(128, 3, 2, 1, )(feat, train=train)
            y = _adaptive_avg_pool(y, 5, 7)
            y = y.reshape(y.shape[0], -1)
            y = nn.relu(nn.Dense(256, name=f"{name}_fc1")(y))
            y = nn.relu(nn.Dense(128, name=f"{name}_fc2")(y))
            return nn.Dense(out_size, name=f"{name}_fc3")(y)

        keys = km_head(x, self.key_size, "key").reshape(b, l, self.key_size)
        query = km_head(x.reshape(b, l, *x.shape[1:])[:, 0],
                        self.query_size, "query")  # (B, Cq)

        # additive attention (ref :342): scores = <W_k k, W_q q>
        tk = nn.Dense(128, name="att_feat")(keys)          # (B, L, 128)
        tq = nn.Dense(128, name="att_context")(query)      # (B, 128)
        scores = jnp.einsum("blf,bf->bl", tk, tq)
        scores = jnp.where(agent_mask, scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=1)
        attn = jnp.where(agent_mask, attn, 0.0)
        return jnp.einsum("bl,blhwc->bhwc", attn, warped)


def _adaptive_avg_pool(x, out_h: int, out_w: int):
    """torch AdaptiveAvgPool2d semantics for NHWC (static shapes).

    Bin edges are floor(i*h/out) .. ceil((i+1)*h/out), so bins are always
    non-empty even when out > in (matching torch).
    """
    _, h, w, _ = x.shape
    rows = []
    for i in range(out_h):
        y0, y1 = (i * h) // out_h, -((-(i + 1) * h) // out_h)
        cols = []
        for j in range(out_w):
            x0, x1 = (j * w) // out_w, -((-(j + 1) * w) // out_w)
            patch = x[:, y0:y1, x0:x1, :]
            cols.append(patch.mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, out_h, out_w, C)

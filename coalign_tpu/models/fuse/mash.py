"""MASH: pose-free fusion via global correspondence attention.

TPU-first rework of ref opencood/models/point_pillar_mash.py:18-160 +
sub_modules/mash_utils.py: the reference builds an explicit correspondence
volume (Hs*Ws+1, Ht, Wt) per neighbor, decodes its argmax to a sampling grid
and grid_samples the neighbor map. Mathematically that is hard-attention
cross-attention over coarse grid positions with a learned "no match" bin —
here it runs as ONE soft cross-attention einsum per neighbor (the
expectation instead of the argmax, which is differentiable and
MXU-friendly), producing the same warped-feature fusion plus the
correspondence logits for the MASH loss.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.models.layers import ConvBNReLU


class _Down(nn.Module):
    """segnet-style 3-conv downsample block (ref mash_utils.segnetDown3)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.features, 3, 1, 1)(x, train=train)
        x = ConvBNReLU(self.features, 3, 1, 1)(x, train=train)
        x = ConvBNReLU(self.features, 3, 2, 1)(x, train=train)
        return x


class MASHFusion(nn.Module):
    """Pose-free correspondence fusion over (B, L, H, W, C) features."""

    feature_dim: int
    coarse_downsample: int = 4  # query/key grid = H/ds x W/ds
    query_dim: int = 32

    @nn.compact
    def __call__(self, features, affines, agent_mask, train: bool = False):
        """MASH never uses the affines (pose-free by design)."""
        del affines
        b, l, h, w, c = features.shape
        flat = features.reshape(b * l, h, w, c)

        n_down = max(1, int(np.log2(self.coarse_downsample)))
        q, k = flat, flat
        for _ in range(n_down):
            q = _Down(self.query_dim)(q, train=train)
            k = _Down(self.query_dim)(k, train=train)
        hc, wc = q.shape[1:3]
        q = q.reshape(b, l, hc * wc, self.query_dim)
        k = k.reshape(b, l, hc * wc, self.query_dim)

        # coarse neighbor values: averaged pooled features
        vals = nn.avg_pool(flat, (self.coarse_downsample,) * 2,
                           strides=(self.coarse_downsample,) * 2)
        vals = vals.reshape(b, l, hc * wc, c)

        # per-neighbor correspondence: logits (B, L, P_t, P_s) between the
        # ego query grid (targets) and each neighbor's key grid (sources),
        # plus a learned no-match bin
        scale = 1.0 / np.sqrt(self.query_dim)
        logits = jnp.einsum("bpd,blsd->blps", q[:, 0], k) * scale
        no_match = self.param("no_match", nn.initializers.zeros, (1,))
        nm = jnp.broadcast_to(no_match, logits.shape[:-1] + (1,))
        full = jnp.concatenate([logits, nm], axis=-1)
        attn = jax.nn.softmax(full, axis=-1)
        match_w = 1.0 - attn[..., -1:]  # mass assigned to real positions

        warped = jnp.einsum("blps,blsc->blpc", attn[..., :-1], vals)
        warped = warped * match_w

        # agent mask + keep ego identity; fuse by max like the reference
        m = agent_mask[..., None, None]
        ego = vals[:, 0]
        cands = jnp.where(m, warped, -jnp.inf)
        fused_c = jnp.maximum(ego, jnp.max(cands, axis=1))

        fused_c = fused_c.reshape(b, hc, wc, c)
        fused = jax.image.resize(fused_c, (b, h, w, c), "bilinear")
        # residual with the ego's full-resolution map preserves detail
        fused = jnp.maximum(fused, features[:, 0])
        return fused, full

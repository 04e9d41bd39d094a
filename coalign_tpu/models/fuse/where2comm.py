"""Where2comm: confidence-guided sparse feature transmission + fusion.

TPU-first rework of ref opencood/models/comm_modules/where2comm.py:9
(Communication: sigmoid confidence -> gaussian smoothing -> threshold mask,
comm-rate accounting) and fuse_modules/where2comm_attn.py:174 (Where2comm
multiscale fusion with ATTEN/MAX per level). Batched/masked over padded
agents; the gaussian smoothing is a fixed (non-learned) depthwise conv.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.models.fuse.fusion import AttFusion, MaxFusion


def gaussian_kernel(k_size: int = 5, sigma: float = 1.0) -> np.ndarray:
    center = k_size // 2
    x, y = np.mgrid[-center:k_size - center, -center:k_size - center]
    g = 1 / (2 * np.pi * sigma) * np.exp(-(x ** 2 + y ** 2) / (2 * sigma ** 2))
    return g.astype(np.float32)


class Communication(nn.Module):
    """Confidence map -> binary transmission mask + communication rate.

    Matches ref comm_modules/where2comm.py:34-78: per-agent confidence =
    max over anchors of sigmoid(cls logits); optional gaussian smoothing;
    threshold; ego's own map is never masked.
    """

    threshold: float = 0.01
    smooth: bool = True
    kernel_size: int = 5
    sigma: float = 1.0

    @nn.compact
    def __call__(self, conf_logits, agent_mask):
        """conf_logits (B, L, H, W, A) -> (mask (B, L, H, W, 1), rate ())."""
        conf = jax.nn.sigmoid(conf_logits).max(axis=-1, keepdims=True)
        if self.smooth:
            kern = jnp.asarray(gaussian_kernel(self.kernel_size, self.sigma))
            b, l, h, w, _ = conf.shape
            conf_s = jax.lax.conv_general_dilated(
                conf.reshape(b * l, h, w, 1), kern[..., None, None],
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            conf = conf_s.reshape(b, l, h, w, 1)
        mask = (conf > self.threshold).astype(conf.dtype)
        # rate = transmitted fraction of the pre-override mask, averaged
        # over valid agents (ref :61 computes mask.sum()/(H*W) per sample)
        valid = agent_mask[..., None, None, None].astype(conf.dtype)
        rate = (mask * valid).sum() / jnp.maximum(
            (valid * jnp.ones_like(mask)).sum(), 1.0)
        # ego never masks its own features (ref :70-72)
        mask = mask.at[:, 0].set(1.0)
        return mask, rate


class Where2commFusion(nn.Module):
    """Multiscale warp+fuse with communication-masked features.

    Used by the where2comm model: level-0 features are masked by the
    transmission mask, deeper levels by its max-pooled version
    (ref where2comm_attn.py:262-276).
    """

    agg_mode: str = "ATTEN"
    feature_dims: Sequence[int] = (64, 128, 256)

    def setup(self):
        if self.agg_mode == "ATTEN":
            self.fuse_modules = [AttFusion(d) for d in self.feature_dims]
        else:
            self.fuse_modules = [MaxFusion() for _ in self.feature_dims]
        self.comm = Communication()

    def __call__(self, scales, conf_logits, affines, agent_mask,
                 train: bool = False):
        """scales: list of (B, L, h_i, w_i, C_i); conf_logits (B, L, H0, W0, A)
        at the scale-0 resolution. Returns (fused list, comm_rate)."""
        comm_mask, rate = self.comm(conf_logits, agent_mask)
        fused = []
        mask_i = comm_mask
        for i, feat in enumerate(scales):
            b, l, h, w, c = feat.shape
            if mask_i.shape[2] != h:
                factor = mask_i.shape[2] // h
                m = mask_i.reshape(b * l, mask_i.shape[2], mask_i.shape[3], 1)
                m = nn.max_pool(m, (factor, factor), strides=(factor, factor))
                mask_i = m.reshape(b, l, h, w, 1)
            fused.append(self.fuse_modules[i](
                feat * mask_i, affines, agent_mask, train=train))
        return fused, rate

"""Shared flax building blocks (NHWC, TPU-native layouts).

Covers the reference's conv submodules: torchvision BasicBlock / ResNet trunk
(ref opencood/models/sub_modules/resblock.py), SECOND-style conv backbone
blocks (base_bev_backbone.py), DownsampleConv shrink header
(downsample_conv.py) and NaiveCompressor (naive_compress.py).

BatchNorm uses eps 1e-3 / momentum 0.99 (torch momentum 0.01) like the
reference. MaskedBatchNorm additionally supports an element weight mask so
padded points / padded agents don't pollute batch statistics — the reference
never sees padding because it flattens to sum(n_cav); we pad for static
shapes, so the mask restores equivalent statistics.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_EPS = 1e-3
BN_MOMENTUM = 0.99

# Global compute-dtype policy: None = float32; set to jnp.bfloat16 to run
# the conv stack on the MXU's native dtype (params stay float32, BatchNorm
# statistics stay float32 — see MaskedBatchNorm). Read at trace time.
_COMPUTE_DTYPE = None


def set_compute_dtype(dtype):
    """Set the conv-stack computation dtype (None | jnp.bfloat16)."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading axes with optional element weights.

    x: (..., C); mask: broadcastable to x.shape[:-1] (bool/float), or None.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            xf = x.astype(jnp.float32)
            if mask is None:
                mean = jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
                var = jnp.var(xf, axis=tuple(range(x.ndim - 1)))
            else:
                w = jnp.broadcast_to(
                    jnp.asarray(mask, jnp.float32)[..., None], x.shape)
                denom = jnp.maximum(jnp.sum(w, axis=tuple(range(x.ndim - 1))), 1.0)
                mean = jnp.sum(xf * w, axis=tuple(range(x.ndim - 1))) / denom
                var = jnp.sum(w * (xf - mean) ** 2,
                              axis=tuple(range(x.ndim - 1))) / denom
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.asarray(scale, x.dtype) / jnp.sqrt(
            var.astype(x.dtype) + self.epsilon)
        return (x - mean.astype(x.dtype)) * inv + jnp.asarray(bias, x.dtype)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | str = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        pad = self.padding if isinstance(self.padding, str) else \
            [(self.padding, self.padding)] * 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, dtype=compute_dtype())(x)
        x = MaskedBatchNorm()(x, mask=mask, train=train)
        if self.use_relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """torchvision BasicBlock (ref resblock.py:23), NHWC.

    BN eps is 1e-5 here, NOT the 1e-3 used everywhere else: resblock.py's
    BasicBlock takes the torch.nn.BatchNorm2d default, while the explicit
    backbone/PFN norms pass eps=1e-3 — checkpoint-import parity depends on
    reproducing both (tests/test_ckpt_import.py).
    """

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      dtype=compute_dtype())(x)
        out = MaskedBatchNorm(epsilon=1e-5)(out, mask=mask, train=train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, dtype=compute_dtype())(out)
        out = MaskedBatchNorm(epsilon=1e-5)(out, mask=mask, train=train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=compute_dtype())(x)
            identity = MaskedBatchNorm(epsilon=1e-5)(identity, mask=mask,
                                                     train=train)
        return nn.relu(out + identity)


class ResNetTrunk(nn.Module):
    """Stacked BasicBlock stages returning per-stage features
    (ref resblock.py:130 ResNetModified)."""

    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        outs = []
        for n, stride, filters in zip(self.layer_nums, self.layer_strides,
                                      self.num_filters):
            x = BasicBlock(filters, stride)(x, train=train, mask=mask)
            for _ in range(n - 1):
                x = BasicBlock(filters, 1)(x, train=train, mask=mask)
            outs.append(x)
        return tuple(outs)


class ConvStage(nn.Module):
    """SECOND-style plain conv stage: strided conv + n 3x3 convs
    (ref base_bev_backbone.py:30-60)."""

    num_convs: int
    filters: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = ConvBNReLU(self.filters, 3, self.stride, 1)(x, train=train, mask=mask)
        for _ in range(self.num_convs):
            x = ConvBNReLU(self.filters, 3, 1, 1)(x, train=train, mask=mask)
        return x


class Deblock(nn.Module):
    """Upsample (transposed conv) or downsample block used by the BEV
    backbones' decode stage (ref base_bev_backbone_resnet.py:51-77)."""

    filters: int
    upsample_stride: float

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        s = self.upsample_stride
        if s >= 1:
            s = int(s)
            x = nn.ConvTranspose(self.filters, (s, s), strides=(s, s),
                                 use_bias=False, dtype=compute_dtype())(x)
        else:
            s = int(round(1 / s))
            x = nn.Conv(self.filters, (s, s), strides=(s, s),
                        use_bias=False, dtype=compute_dtype())(x)
        x = MaskedBatchNorm()(x, mask=mask, train=train)
        return nn.relu(x)


class TorchConvTranspose2d(nn.Module):
    """Exact ``torch.nn.ConvTranspose2d(k, s, p, output_padding)``: dilate
    the input by s, pad (k-1-p) low / (k-1-p+op) high, stride-1 correlate.
    The kernel parameter is stored SPATIALLY FLIPPED in (kh, kw, in, out)
    layout — exactly what utils/ckpt_import._tconv produces from a torch
    weight, so checkpoints drop straight in. (flax nn.ConvTranspose's
    'SAME' padding does NOT reproduce the torch k3/s2/p1/op1 alignment —
    verified against torch f64.)"""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1

    @nn.compact
    def __call__(self, x):
        import jax

        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1],
             self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        lo = self.kernel_size - 1 - self.padding
        hi = lo + self.output_padding
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), ((lo, hi), (lo, hi)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(x.dtype)


class DownsampleConv(nn.Module):
    """Shrink header (ref downsample_conv.py:30): stacked DoubleConvs."""

    dims: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    paddings: Sequence[int]

    @classmethod
    def from_config(cls, cfg: dict):
        return cls(dims=tuple(cfg["dim"]),
                   kernel_sizes=tuple(cfg["kernal_size"]),
                   strides=tuple(cfg["stride"]),
                   paddings=tuple(cfg["padding"]))

    @nn.compact
    def __call__(self, x, train: bool = False):
        for k, d, s, p in zip(self.kernel_sizes, self.dims, self.strides,
                              self.paddings):
            x = nn.Conv(d, (k, k), strides=(s, s), padding=[(p, p)] * 2)(x)
            x = nn.relu(x)
            x = nn.Conv(d, (3, 3), padding=[(1, 1)] * 2)(x)
            x = nn.relu(x)
        return x


class NaiveCompressor(nn.Module):
    """Channel-bottleneck autoencoder simulating bandwidth compression
    (ref naive_compress.py:5)."""

    input_dim: int
    compress_ratio: int

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = ConvBNReLU(self.input_dim // self.compress_ratio, 3, 1, 1)(
            x, train=train, mask=mask)
        x = ConvBNReLU(self.input_dim, 3, 1, 1)(x, train=train, mask=mask)
        x = ConvBNReLU(self.input_dim, 3, 1, 1)(x, train=train, mask=mask)
        return x


class AutoEncoder(nn.Module):
    """Deeper spatial+channel compressor (ref auto_encoder.py:5): two
    stride-2 conv stages down (channel bottleneck C/ratio), mirrored
    transposed convs back up — a stronger bandwidth model than
    NaiveCompressor's channel-only bottleneck."""

    feature_dim: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        c = self.feature_dim
        h, w = x.shape[1:3]
        y = ConvBNReLU(c // self.ratio, 3, 2, 1)(x, train=train, mask=mask)
        y = ConvBNReLU(c // self.ratio, 3, 2, 1)(y, train=train, mask=mask)
        y = nn.ConvTranspose(c // self.ratio, (3, 3), strides=(2, 2),
                             use_bias=False)(y)
        y = MaskedBatchNorm()(y, mask=mask, train=train)
        y = nn.relu(y)
        y = nn.ConvTranspose(c, (3, 3), strides=(2, 2), use_bias=False)(y)
        y = MaskedBatchNorm()(y, mask=mask, train=train)
        y = nn.relu(y)
        return y[:, :h, :w]

"""Architecture-exact camera trunks for LSS checkpoint interop (NHWC).

Reference-checkpoint importability requires bit-level architectural parity
with the trunks the reference builds INSIDE its trained ``.pth`` files:

* EfficientNet-b0 (``efficientnet_pytorch.EfficientNet`` — ref
  opencood/models/sub_modules/lss_submodule.py:41 CamEncode): TF-SAME
  padded convs, swish, squeeze-excite on the block INPUT width, BN eps
  1e-3, feature endpoints recorded at each spatial reduction.
* torchvision ResNet-101 through layer2 (ref lss_submodule.py:142
  CamEncode_Resnet101: conv1/bn1/maxpool + 3 + 4 bottlenecks, /8 x 512ch).
* torchvision ResNet-18 layers 1-3 as the BEV encoder trunk (ref
  lss_submodule.py:247 BevEncode / :287 BevEncodeSSFusion / :360
  BevEncodeMSFusion), BN eps 1e-5.
* The reference's ``Up`` block (lss_submodule.py:19): bilinear upsample
  with ``align_corners=True`` (NOT the half-pixel convention
  jax.image.resize implements) + concat + two 3x3 conv-BN-ReLU.

Everything is float32/flax with parameter trees laid out so
utils/ckpt_import.py can map the torch state_dict keys 1:1
(tests/test_ckpt_import.py gates activation parity <= 1e-3 rel).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.models.layers import compute_dtype, BasicBlock, MaskedBatchNorm

# efficientnet-b0 MBConv stack: (in_ch, out_ch, kernel, stride, expand).
# Derived from the b0 blocks_args r{repeats}_k{kernel}_s{stride}_e{expand}
# _i{in}_o{out}_se0.25 (efficientnet_pytorch model registry).
EFFNET_B0_BLOCKS = (
    (32, 16, 3, 1, 1),
    (16, 24, 3, 2, 6), (24, 24, 3, 1, 6),
    (24, 40, 5, 2, 6), (40, 40, 5, 1, 6),
    (40, 80, 3, 2, 6), (80, 80, 3, 1, 6), (80, 80, 3, 1, 6),
    (80, 112, 5, 1, 6), (112, 112, 5, 1, 6), (112, 112, 5, 1, 6),
    (112, 192, 5, 2, 6), (192, 192, 5, 1, 6), (192, 192, 5, 1, 6),
    (192, 192, 5, 1, 6),
    (192, 320, 3, 1, 6),
)


def swish(x):
    return x * nn.sigmoid(x)


def upsample_align_corners(x, scale: int):
    """torch ``nn.Upsample(scale_factor=s, mode='bilinear',
    align_corners=True)`` on NHWC: source coordinate ``i * (n_in - 1) /
    (n_out - 1)`` (corner-aligned), NOT the half-pixel-center convention of
    jax.image.resize. Static shapes -> the gather indices and lerp weights
    are compile-time numpy constants."""
    b, h, w, c = x.shape
    oh, ow = h * scale, w * scale

    def grid(n_in, n_out):
        if n_in == 1:
            z = np.zeros(n_out, np.int32)
            return z, z, np.zeros(n_out, np.float32)
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        i0 = np.minimum(np.floor(src).astype(np.int32), n_in - 2)
        return i0, i0 + 1, (src - i0).astype(np.float32)

    def interp_matrix(n_in, n_out):
        """(n_out, n_in) corner-aligned lerp weights as a dense matrix:
        the resize becomes two small matmuls the MXU tiles natively. The
        gather formulation (x[:, y0] * (1-t) + x[:, y1] * t) lowered the
        minor-axis gather to an 80-step XLA while loop of dynamic-update-
        slices — ~34 ms of the 152 ms LSS step (v5e trace, 2026-08-20)."""
        i0, i1, t = grid(n_in, n_out)
        m = np.zeros((n_out, n_in), np.float32)
        m[np.arange(n_out), i0] += 1.0 - t
        m[np.arange(n_out), i1] += t
        return m

    # HIGHEST: keeps f32 inputs exact (TPU default would round the lerp
    # weights to bf16); the matrices are tiny so the cost is negligible
    hi = jax.lax.Precision.HIGHEST
    wy = jnp.asarray(interp_matrix(h, oh), x.dtype)
    wx = jnp.asarray(interp_matrix(w, ow), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wy, x, precision=hi)
    return jnp.einsum("pw,bowc->bopc", wx, y, precision=hi)


class TorchUp(nn.Module):
    """Ref lss_submodule.py:19 Up: align-corners bilinear upsample of x1,
    concat [x2, x1], two 3x3 conv-BN(eps 1e-5)-ReLU."""

    out_ch: int
    scale: int = 2

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = upsample_align_corners(x1, self.scale)
        x = jnp.concatenate([x2, x1], axis=-1)
        x = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, name="conv1", dtype=compute_dtype())(x)
        x = MaskedBatchNorm(epsilon=1e-5, name="bn1")(x, train=train)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, name="conv2", dtype=compute_dtype())(x)
        x = MaskedBatchNorm(epsilon=1e-5, name="bn2")(x, train=train)
        return nn.relu(x)


class MBConvBlock(nn.Module):
    """efficientnet_pytorch MBConvBlock, eval semantics (drop_connect is a
    train-only regularizer). TF-SAME padding == flax "SAME"; BN eps 1e-3;
    SE squeeze width = max(1, in_ch // 4) — computed from the block INPUT
    channels, not the expanded width."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        exp_ch = self.in_ch * self.expand
        if self.expand != 1:
            x = nn.Conv(exp_ch, (1, 1), use_bias=False,
                        name="expand_conv", dtype=compute_dtype())(x)
            x = MaskedBatchNorm(name="bn0")(x, train=train)
            x = swish(x)
        x = nn.Conv(exp_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=exp_ch, use_bias=False,
                    name="depthwise_conv", dtype=compute_dtype())(x)
        x = MaskedBatchNorm(name="bn1")(x, train=train)
        x = swish(x)
        # squeeze-excite
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(max(1, self.in_ch // 4), (1, 1), name="se_reduce", dtype=compute_dtype())(se)
        se = swish(se)
        se = nn.Conv(exp_ch, (1, 1), name="se_expand", dtype=compute_dtype())(se)
        x = nn.sigmoid(se) * x
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                    name="project_conv", dtype=compute_dtype())(x)
        x = MaskedBatchNorm(name="bn2")(x, train=train)
        if self.stride == 1 and self.in_ch == self.out_ch:
            x = x + inputs
        return x


class EfficientNetB0(nn.Module):
    """The b0 feature trunk exactly as the reference walks it
    (lss_submodule.py:91 get_eff_features): stem + 16 MBConv blocks,
    returning the reduction_3/4/5 endpoints (an endpoint records the
    feature JUST BEFORE each spatial reduction, plus the final block
    output) — (40ch @ /8, 112ch @ /16, 320ch @ /32)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, name="conv_stem", dtype=compute_dtype())(x)
        x = MaskedBatchNorm(name="bn0")(x, train=train)
        x = swish(x)
        endpoints = {}
        prev = x
        for i, (ci, co, k, s, e) in enumerate(EFFNET_B0_BLOCKS):
            x = MBConvBlock(ci, co, k, s, e, name=f"blocks_{i}")(
                x, train=train)
            if s > 1:
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            prev = x
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        return (endpoints["reduction_3"], endpoints["reduction_4"],
                endpoints["reduction_5"])


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4), NHWC, BN eps 1e-5. Stride
    lives on conv2 (torchvision's 'pytorch'-style resnet)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1", dtype=compute_dtype())(x)
        out = MaskedBatchNorm(epsilon=1e-5, name="bn1")(out, train=train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3),
                      strides=(self.stride, self.stride),
                      padding=[(1, 1)] * 2, use_bias=False,
                      name="conv2", dtype=compute_dtype())(out)
        out = MaskedBatchNorm(epsilon=1e-5, name="bn2")(out, train=train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="conv3", dtype=compute_dtype())(out)
        out = MaskedBatchNorm(epsilon=1e-5, name="bn3")(out, train=train)
        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="down_conv", dtype=compute_dtype())(x)
            identity = MaskedBatchNorm(epsilon=1e-5, name="down_bn")(
                identity, train=train)
        return nn.relu(out + identity)


class ResNet101Trunk(nn.Module):
    """torchvision resnet101 through layer2 — the exact slice
    CamEncode_Resnet101 keeps (lss_submodule.py:155-161; layer3 is
    nn.Identity there): conv1 7x7/2 pad 3, BN, ReLU, maxpool 3x3/2 pad 1,
    layer1 = 3 bottlenecks (256), layer2 = 4 bottlenecks (512, /2).
    Output: 512ch @ /8."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, name="conv1", dtype=compute_dtype())(x)
        x = MaskedBatchNorm(epsilon=1e-5, name="bn1")(x, train=train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        for i in range(3):
            x = Bottleneck(64, 1, name=f"layer1_{i}")(x, train=train)
        for i in range(4):
            x = Bottleneck(128, 2 if i == 0 else 1,
                           name=f"layer2_{i}")(x, train=train)
        return x


class ResNet18Layers(nn.Module):
    """The BEV encoders' shared trunk (lss_submodule.py:247/:287/:360):
    a fresh conv1 (inC -> 64, 7x7/2, NO maxpool) + torchvision resnet18
    layer1..layer3. Returns (x1 64ch @ /2, x2 128ch @ /4, x3 256ch @ /8)
    relative to the BEV input."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, name="conv1", dtype=compute_dtype())(x)
        x = MaskedBatchNorm(epsilon=1e-5, name="bn1")(x, train=train)
        x = nn.relu(x)
        x1 = BasicBlock(64, 1, name="layer1_0")(x, train=train)
        x1 = BasicBlock(64, 1, name="layer1_1")(x1, train=train)
        x2 = BasicBlock(128, 2, name="layer2_0")(x1, train=train)
        x2 = BasicBlock(128, 1, name="layer2_1")(x2, train=train)
        x3 = BasicBlock(256, 2, name="layer3_0")(x2, train=train)
        x3 = BasicBlock(256, 1, name="layer3_1")(x3, train=train)
        return x1, x2, x3

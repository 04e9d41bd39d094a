"""Spatial BEV-grid sharding with halo exchange (shard_map + ppermute).

A deliberate TPU-native design beyond the reference's data-parallel-only
story (SURVEY §2.11/§5): for large-range grids (DAIR-V2X 504x200 at
0.4 m, or finer voxels) the BEV H/W axes are *spatially* sharded across
the mesh; convolutions stay local after exchanging halo columns with ring
neighbors over ICI (ppermute), so activation memory and conv FLOPs scale
with devices. Cross-agent per-pixel fusion (max/att) is pointwise in BEV
space and needs NO communication under this layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x, halo: int, axis_name: str):
    """Exchange ``halo`` columns with ring neighbors along the sharded W
    axis. x: (..., W_local, C) inside shard_map. Returns x padded to
    (..., W_local + 2*halo, C); ring ends are zero-padded (grid boundary).
    """
    if halo == 0:
        return x
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    left_edge = x[..., :halo, :]     # my leftmost columns -> left neighbor
    right_edge = x[..., -halo:, :]

    # receive my right neighbor's left edge as my right halo, and vice versa
    right_halo = jax.lax.ppermute(
        left_edge, axis_name, [((i + 1) % n, i) for i in range(n)])
    left_halo = jax.lax.ppermute(
        right_edge, axis_name, [((i - 1) % n, i) for i in range(n)])

    zeros = jnp.zeros_like(left_halo)
    left_halo = jnp.where(idx == 0, zeros, left_halo)
    right_halo = jnp.where(idx == n - 1, zeros, right_halo)
    return jnp.concatenate([left_halo, x, right_halo], axis=-2)


def sharded_conv2d(x, kernel, axis_name: str, stride: int = 1):
    """W-sharded NHWC conv with torch-style symmetric padding semantics
    across shards, any stride.

    x: (B, H, W_local, Cin) inside shard_map; kernel (kh, kw, Cin, Cout).

    Strided phase correctness: with global padding p = kw//2, output col j
    reads inputs [j*s - p, j*s - p + kw - 1]. Requiring W_local % s == 0
    puts every shard's first output at a global input offset that is a
    multiple of s, so after exchanging kw//2 halo columns each shard's
    VALID-W strided conv produces exactly its W_local/s slice of the
    global output — no shard-offset-dependent phase left (this is the
    stride-2 generalization round 2 scoped out). The H axis stays local
    with the same torch padding.
    """
    kh, kw = kernel.shape[:2]
    if stride > 1 and x.shape[-2] % stride:
        raise ValueError(
            f"W_local {x.shape[-2]} not divisible by stride {stride}")
    x = halo_exchange(x, kw // 2, axis_name)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=((kh // 2, kh // 2), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def spatial_resnet_encode_fn(variables, layer_nums, layer_strides,
                             mesh: Mesh, axis: str = "space",
                             eps: float = 1e-5):
    """W-shard the FLAGSHIP backbone's encode over the mesh.

    Takes the real model ``variables`` (params + batch_stats) of a
    ``point_pillar_baseline_multiscale``-family model, folds eval-mode
    BatchNorm into per-channel scale/bias, and returns ``(fn, shard)``
    where ``fn(x)`` runs the full ResNetTrunk stack — including the
    stride-2 stage entries and their 1x1 downsample projections — as
    local convs + halo exchanges, returning the per-scale feature tuple
    exactly like ``model.backbone.encode`` (models/backbones.py:49).
    """
    params = variables["params"]["backbone"]["trunk"]
    stats = variables["batch_stats"]["backbone"]["trunk"]

    def fold(bp, bs, i):
        inv = bp[f"MaskedBatchNorm_{i}"]["scale"] / jnp.sqrt(
            bs[f"MaskedBatchNorm_{i}"]["var"] + eps)
        return inv, (bp[f"MaskedBatchNorm_{i}"]["bias"]
                     - bs[f"MaskedBatchNorm_{i}"]["mean"] * inv)

    blocks, stage_ends = [], []
    idx = 0
    for n, stride in zip(layer_nums, layer_strides):
        for j in range(n):
            bp, bs = params[f"BasicBlock_{idx}"], stats[f"BasicBlock_{idx}"]
            blk = {"stride": stride if j == 0 else 1,
                   "k0": bp["Conv_0"]["kernel"], "bn0": fold(bp, bs, 0),
                   "k1": bp["Conv_1"]["kernel"], "bn1": fold(bp, bs, 1)}
            if "Conv_2" in bp:
                blk["k2"] = bp["Conv_2"]["kernel"]
                blk["bn2"] = fold(bp, bs, 2)
            blocks.append(blk)
            idx += 1
        stage_ends.append(idx)

    strides = [b.pop("stride") for b in blocks]  # static, not traced

    def local(x, blks):
        outs = []
        for i, (blk, s) in enumerate(zip(blks, strides)):
            out = sharded_conv2d(x, blk["k0"], axis, s)
            out = jax.nn.relu(out * blk["bn0"][0] + blk["bn0"][1])
            out = sharded_conv2d(out, blk["k1"], axis, 1)
            out = out * blk["bn1"][0] + blk["bn1"][1]
            if "k2" in blk:
                idt = sharded_conv2d(x, blk["k2"], axis, s)
                idt = idt * blk["bn2"][0] + blk["bn2"][1]
            else:
                idt = x
            x = jax.nn.relu(out + idt)
            if i + 1 in stage_ends:
                outs.append(x)
        return tuple(outs)

    spec = P(None, None, axis, None)
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(spec, P()),
        out_specs=tuple(spec for _ in stage_ends)))
    shard = NamedSharding(mesh, spec)
    return (lambda x: fn(jax.device_put(x, shard), blocks)), shard


def make_spatial_conv_fn(kernels, mesh: Mesh, axis: str = "space"):
    """Build a jitted W-sharded conv stack: x (B, H, W, Cin) sharded on W.

    kernels: list of (kh, kw, Cin, Cout) arrays applied with ReLU between.
    Returns (fn, shard) where fn(x) keeps x sharded over the mesh.
    """
    def local(x, *ks):
        for i, k in enumerate(ks):
            x = sharded_conv2d(x, k, axis)
            if i < len(ks) - 1:
                x = jax.nn.relu(x)
        return x

    in_specs = (P(None, None, axis, None),) + tuple(
        P() for _ in kernels)
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=in_specs,
        out_specs=P(None, None, axis, None)))
    shard = NamedSharding(mesh, P(None, None, axis, None))
    return (lambda x: fn(jax.device_put(x, shard), *kernels)), shard


def make_spatial_mesh(num_devices: int | None = None,
                      axis: str = "space") -> Mesh:
    import numpy as np

    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))

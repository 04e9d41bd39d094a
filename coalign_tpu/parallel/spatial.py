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


def _fold_bn(scope_p, scope_s, name, eps=1e-5):
    """Eval-mode BatchNorm -> per-channel (scale, bias)."""
    inv = scope_p[name]["scale"] / jnp.sqrt(scope_s[name]["var"] + eps)
    return inv, scope_p[name]["bias"] - scope_s[name]["mean"] * inv


def _fold_trunk(variables, layer_nums, layer_strides, eps=1e-5):
    """Extract the ResNetTrunk's conv kernels + folded BN as plain arrays.
    Returns (blocks, strides, stage_ends)."""
    params = variables["params"]["backbone"]["trunk"]
    stats = variables["batch_stats"]["backbone"]["trunk"]

    def fold(bp, bs, i):
        return _fold_bn(bp, bs, f"MaskedBatchNorm_{i}", eps)

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
    return blocks, strides, stage_ends


def _trunk_local(x, blks, strides, stage_ends, axis):
    """Run the folded trunk as local convs + halo exchanges (inside
    shard_map); returns the per-scale feature tuple like backbone.encode."""
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
    blocks, strides, stage_ends = _fold_trunk(variables, layer_nums,
                                              layer_strides, eps)

    def local(x, blks):
        return _trunk_local(x, blks, strides, stage_ends, axis)

    spec = P(None, None, axis, None)
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(spec, P()),
        out_specs=tuple(spec for _ in stage_ends)))
    shard = NamedSharding(mesh, spec)
    return (lambda x: fn(jax.device_put(x, shard), blocks)), shard


def _warp_cols_from_full(src_full, affine, w0, w_local):
    """Bilinear-warp ONLY output columns [w0, w0 + w_local) of the global
    grid, sampling the (all-gathered) full-width source. Exactly
    ops/warp.py warp_affine's align_corners=False convention, restricted
    to a column slice — each shard computes its own slice of the warped
    output from the gathered source (a rotation may sample any column,
    so a bounded halo cannot replace the gather)."""
    from coalign_tpu.ops.warp import _bilinear_gather

    h, w, _ = src_full.shape
    affine = affine.astype(jnp.float32)
    ys = (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0
    xs = (2.0 * (w0 + jnp.arange(w_local, dtype=jnp.float32)) + 1.0) / w - 1.0
    gx = affine[0, 0] * xs[None, :] + affine[0, 1] * ys[:, None] + affine[0, 2]
    gy = affine[1, 0] * xs[None, :] + affine[1, 1] * ys[:, None] + affine[1, 2]
    fx = ((gx + 1.0) * w - 1.0) / 2.0
    fy = ((gy + 1.0) * h - 1.0) / 2.0
    return _bilinear_gather(src_full, fx, fy)


def _att_fuse_local(feats, affines, agent_mask, axis):
    """W-sharded AttFusion (models/fuse/fusion.py:53): all_gather the
    per-agent maps along W, warp each neighbor's LOCAL output slice from
    the gathered source (ego passes through unwarped, like
    warp_agents_to_ego), then per-pixel ego-query attention — pointwise,
    so it stays local. feats: (B, L, H, W_local, C) inside shard_map."""
    import numpy as np

    b, l, h, wl, c = feats.shape
    full = jax.lax.all_gather(feats, axis, axis=3, tiled=True)
    w0 = jax.lax.axis_index(axis) * wl

    neigh = jax.vmap(lambda s, a: _warp_cols_from_full(s, a, w0, wl))(
        full[:, 1:].reshape(b * (l - 1), h, full.shape[3], c),
        affines[:, 1:].reshape(b * (l - 1), 2, 3))
    x = jnp.concatenate(
        [feats[:, :1], neigh.reshape(b, l - 1, h, wl, c)], axis=1)
    x = x * agent_mask[..., None, None, None].astype(x.dtype)

    q = x[:, 0]
    scores = jnp.einsum("bhwc,blhwc->blhw", q, x) / np.sqrt(c)
    scores = jnp.where(agent_mask[:, :, None, None], scores, -jnp.inf)
    att = jnp.exp(scores - jnp.max(scores, axis=1, keepdims=True))
    att = jnp.where(agent_mask[:, :, None, None], att, 0.0)
    att = att / jnp.maximum(jnp.sum(att, axis=1, keepdims=True), 1e-9)
    return jnp.einsum("blhw,blhwc->bhwc", att, x)


def _deblock_local(x, kernel, bn):
    """Deblock (models/layers.py:173) on a W-sharded map. The transposed
    conv has kernel_size == stride, so every output pixel reads EXACTLY
    one input pixel — no halo, the upsample is shard-local:
    out[n, i*s+a, j*s+b, o] = sum_c x[n,i,j,c] * K[s-1-a,s-1-b,c,o]
    (flax nn.ConvTranspose stores the kernel spatially FLIPPED relative
    to the output tiling — verified numerically vs the module)."""
    n, h, w, _ = x.shape
    s = kernel.shape[0]
    o = kernel.shape[-1]
    if s == 1:
        y = jnp.einsum("nhwc,co->nhwo", x, kernel[0, 0])
    else:
        y = jnp.einsum("nhwc,abco->nhawbo",
                       x, kernel[::-1, ::-1]).reshape(n, h * s, w * s, o)
    return jax.nn.relu(y * bn[0] + bn[1])


def spatial_flagship_forward_fn(variables, args: dict, mesh: Mesh,
                                axis: str = "space", eps: float = 1e-5):
    """W-shard the flagship's FULL dense-BEV forward over the mesh:
    trunk encode -> per-scale warp + att fusion -> decode deblocks ->
    shrink header -> detection heads. Everything after the (tiny,
    per-agent) pillar scatter runs sharded; the only cross-shard traffic
    is conv halo exchange (ppermute) and the per-scale all_gather the
    rotation warp fundamentally needs.

    variables: real model params+stats of point_pillar_baseline_multiscale
    args:      the model args dict (base_bev_backbone/shrink_header/...)
    Returns (fn, shard): fn(bev, affine, agent_mask) -> {cls/reg/dir}_preds
    with bev (B*L, H, W, C) the scattered pillar canvas, affine the
    (B, L, 2, 3) ego row of the normalized pairwise matrix, exactly
    matching the dense model's outputs (models/zoo.py:187-207).
    """
    bb = args["base_bev_backbone"]
    blocks, strides, stage_ends = _fold_trunk(
        variables, bb["layer_nums"], bb["layer_strides"], eps)
    p, s = variables["params"], variables["batch_stats"]
    deblocks = []
    for i in range(len(bb["layer_nums"])):
        dp = p["backbone"][f"deblocks_{i}"]
        ds = s["backbone"][f"deblocks_{i}"]
        deblocks.append((dp["ConvTranspose_0"]["kernel"],
                         _fold_bn(dp, ds, "MaskedBatchNorm_0", eps)))
    shrink = [(p["shrink"][f"Conv_{i}"]["kernel"],
               p["shrink"][f"Conv_{i}"]["bias"])
              for i in range(len(p.get("shrink", {})))] \
        if "shrink" in p else []
    heads = {k: (v["kernel"][0, 0], v["bias"])
             for k, v in p["heads"].items()}

    def local(bev, affine, agent_mask, blks, debs, shr, hds):
        b, l = agent_mask.shape
        scales = _trunk_local(bev, blks, strides, stage_ends, axis)
        ups = []
        for i, feat in enumerate(scales):
            h, wl, c = feat.shape[1:]
            fused = _att_fuse_local(feat.reshape(b, l, h, wl, c),
                                    affine, agent_mask, axis)
            ups.append(_deblock_local(fused, debs[i][0], debs[i][1]))
        x = jnp.concatenate(ups, axis=-1)
        for k, bias in shr:
            x = jax.nn.relu(sharded_conv2d(x, k, axis, 1) + bias)
        return {name.replace("_head", "_preds"):
                jnp.einsum("bhwc,co->bhwo", x, kk) + bias
                for name, (kk, bias) in hds.items()}

    spec = P(None, None, axis, None)
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, P(), P(), P(), P(), P(), P()),
        out_specs={k.replace("_head", "_preds"): spec for k in heads}))
    shard = NamedSharding(mesh, spec)

    def run(bev, affine, agent_mask):
        return fn(jax.device_put(bev, shard), affine, agent_mask,
                  blocks, deblocks, shrink, heads)

    return run, shard


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

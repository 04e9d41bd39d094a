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


def sharded_conv2d(x, kernel, axis_name: str):
    """W-sharded stride-1 NHWC conv with SAME padding semantics across
    shards.

    x: (B, H, W_local, Cin) inside shard_map; kernel (kh, kw, Cin, Cout).
    Halo width = kw // 2 columns; the H axis stays local (SAME padding).
    Only stride 1 is supported: a strided conv's output phase would depend
    on each shard's global column offset, which this halo scheme does not
    model.
    """
    kh, kw = kernel.shape[:2]
    x = halo_exchange(x, kw // 2, axis_name)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


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

"""Spatially-sharded BEV convs: halo-exchange result == unsharded conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coalign_tpu.parallel.spatial import (make_spatial_conv_fn,
                                          make_spatial_mesh)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device test mesh")


def _dense_conv(x, kernels):
    for i, k in enumerate(kernels):
        kh, kw = k.shape[:2]
        x = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if i < len(kernels) - 1:
            x = jax.nn.relu(x)
    return x


def test_sharded_conv_matches_dense():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 64, 8)).astype(np.float32))
    kernels = [jnp.asarray(rng.normal(0, 0.2, s).astype(np.float32))
               for s in [(3, 3, 8, 16), (3, 5, 16, 16), (3, 3, 16, 8)]]

    mesh = make_spatial_mesh(8)
    fn, shard = make_spatial_conv_fn(kernels, mesh)
    got = np.asarray(fn(x))
    want = np.asarray(_dense_conv(x, kernels))
    np.testing.assert_allclose(got, want, atol=2e-4)
    # output really is sharded over the mesh
    out = fn(x)
    assert len(out.sharding.device_set) == 8


def test_halo_exchange_boundaries_zero():
    """Ring ends must see zero halos (grid boundary), not wraparound."""
    from functools import partial

    from coalign_tpu.parallel.spatial import halo_exchange

    mesh = make_spatial_mesh(8)
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(1, 1, 32, 1)

    from jax.sharding import PartitionSpec as P
    f = jax.jit(jax.shard_map(
        lambda t: halo_exchange(t, 1, "space"),
        mesh=mesh, in_specs=P(None, None, "space", None),
        out_specs=P(None, None, "space", None)))
    out = np.asarray(f(x)).reshape(-1)
    # each local block is [halo_left, 4 cols, halo_right] = 6 cols
    blocks = out.reshape(8, 6)
    assert blocks[0, 0] == 0.0          # global left boundary
    assert blocks[-1, -1] == 0.0        # global right boundary
    np.testing.assert_allclose(blocks[1, 0], 3.0)   # neighbor edge
    np.testing.assert_allclose(blocks[0, -1], 4.0)

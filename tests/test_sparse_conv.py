"""Sparse 3D conv vs the dense masked-conv twin: identical semantics.

The dense path (models/voxel_backbone.py) is the toy-scale oracle — it is
bit-faithful to spconv's submanifold/dilation index semantics but cannot
fit reference-scale grids (ops/sparse_conv.py module docstring). Every
sparse op here is gated against its dense equivalent on random occupancy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coalign_tpu.ops.sparse_conv import (SparseGrid, downsample_active,
                                         from_dense, gather_neighbors,
                                         sparse_mean_voxelize, strided_conv,
                                         subm_conv, to_dense)
from coalign_tpu.ops.voxels import VoxelSpec, mean_voxelize


def _rand_dense(shape, c, density=0.05, seed=0):
    rng = np.random.RandomState(seed)
    occ = rng.rand(*shape) < density
    x = rng.randn(*shape, c).astype(np.float32) * occ[..., None]
    return jnp.asarray(x)


def _dense_conv3d(x, w, stride=(1, 1, 1), pad=1):
    return jax.lax.conv_general_dilated(
        x[None], w, window_strides=stride,
        padding=[(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]


def test_roundtrip_dense_sparse_dense():
    x = _rand_dense((6, 10, 12), 5, seed=1)
    g = from_dense(x, max_voxels=256)
    np.testing.assert_array_equal(np.asarray(to_dense(g)), np.asarray(x))


def test_subm_conv_matches_masked_dense():
    """Submanifold conv == dense conv * input occupancy mask."""
    x = _rand_dense((6, 10, 12), 4, density=0.08, seed=2)
    w = jnp.asarray(np.random.RandomState(3).randn(3, 3, 3, 4, 6)
                    .astype(np.float32))
    g = from_dense(x, max_voxels=256)
    out_sparse = to_dense(subm_conv(g, w))
    occ = (jnp.abs(x).sum(-1, keepdims=True) > 0).astype(x.dtype)
    out_dense = _dense_conv3d(x, w) * occ
    np.testing.assert_allclose(np.asarray(out_sparse),
                               np.asarray(out_dense), rtol=1e-4, atol=1e-5)


def test_downsample_active_matches_maxpool_dilation():
    """Strided active set == the dense twin's occupancy max-pool."""
    import flax.linen as nn

    x = _rand_dense((7, 11, 13), 3, density=0.1, seed=4)
    g = from_dense(x, max_voxels=512)
    out = downsample_active(g, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    occ = (jnp.abs(x).sum(-1, keepdims=True) > 0).astype(jnp.float32)
    pooled = nn.max_pool(occ[None], (3, 3, 3), strides=(2, 2, 2),
                         padding=[(1, 1)] * 3)[0, ..., 0] > 0
    got = np.zeros(out.shape, bool)
    keys = np.asarray(out.keys)[np.asarray(out.valid)]
    got.reshape(-1)[keys] = True
    np.testing.assert_array_equal(got, np.asarray(pooled))


def test_strided_conv_matches_masked_dense():
    """Strided sparse conv == dense strided conv * dilated occupancy."""
    import flax.linen as nn

    x = _rand_dense((7, 11, 13), 4, density=0.1, seed=5)
    w = jnp.asarray(np.random.RandomState(6).randn(3, 3, 3, 4, 5)
                    .astype(np.float32))
    g = from_dense(x, max_voxels=512)
    out_set = downsample_active(g, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    out_sparse = to_dense(strided_conv(g, w, out_set))

    occ = (jnp.abs(x).sum(-1, keepdims=True) > 0).astype(jnp.float32)
    occ2 = nn.max_pool(occ[None], (3, 3, 3), strides=(2, 2, 2),
                       padding=[(1, 1)] * 3)[0]
    out_dense = _dense_conv3d(x, w, stride=(2, 2, 2)) * occ2
    np.testing.assert_allclose(np.asarray(out_sparse),
                               np.asarray(out_dense), rtol=1e-4, atol=1e-5)


def test_strided_conv_z_squash_kernel():
    """The backbone's final (kz,1,1)/(2,1,1) pad-0 z-squash conv."""
    import flax.linen as nn

    x = _rand_dense((5, 6, 8), 4, density=0.2, seed=7)
    w = jnp.asarray(np.random.RandomState(8).randn(3, 1, 1, 4, 6)
                    .astype(np.float32))
    g = from_dense(x, max_voxels=256)
    out_set = downsample_active(g, (3, 1, 1), (2, 1, 1), (0, 0, 0))
    out_sparse = to_dense(strided_conv(g, w, out_set, stride=(2, 1, 1),
                                       pad=(0, 0, 0)))
    occ = (jnp.abs(x).sum(-1, keepdims=True) > 0).astype(jnp.float32)
    occ2 = nn.max_pool(occ[None], (3, 1, 1), strides=(2, 1, 1),
                       padding=[(0, 0)] * 3)[0]
    out_dense = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(2, 1, 1), padding=[(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0] * occ2
    np.testing.assert_allclose(np.asarray(out_sparse),
                               np.asarray(out_dense), rtol=1e-4, atol=1e-5)


def test_sparse_mean_voxelize_matches_dense():
    spec = VoxelSpec.from_config((0.0, 0.0, -2.0, 4.0, 3.0, 2.0),
                                 (0.5, 0.5, 0.5))
    rng = np.random.RandomState(9)
    pts = rng.uniform(-0.5, 4.5, size=(300, 4)).astype(np.float32)
    pts[:, 1] = rng.uniform(-0.5, 3.5, 300)
    pts[:, 2] = rng.uniform(-2.5, 2.5, 300)
    mask = rng.rand(300) > 0.1
    dense, _ = mean_voxelize(jnp.asarray(pts), jnp.asarray(mask), spec)
    g = sparse_mean_voxelize(jnp.asarray(pts), jnp.asarray(mask), spec,
                             max_voxels=512)
    np.testing.assert_allclose(np.asarray(to_dense(g)), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_sparse_mean_voxelize_overflow_drops_deterministically():
    spec = VoxelSpec.from_config((0.0, 0.0, 0.0, 4.0, 4.0, 4.0),
                                 (1.0, 1.0, 1.0))
    rng = np.random.RandomState(10)
    pts = rng.uniform(0, 4, size=(200, 4)).astype(np.float32)
    mask = np.ones(200, bool)
    g_full = sparse_mean_voxelize(jnp.asarray(pts), jnp.asarray(mask), spec,
                                  max_voxels=64)
    n_active = int(g_full.valid.sum())
    cap = max(1, n_active - 3)
    g_cap = sparse_mean_voxelize(jnp.asarray(pts), jnp.asarray(mask), spec,
                                 max_voxels=cap)
    assert int(g_cap.valid.sum()) == cap
    # kept voxels are the lowest-key prefix, with identical features
    np.testing.assert_array_equal(np.asarray(g_cap.keys[:cap]),
                                  np.asarray(g_full.keys[:cap]))
    np.testing.assert_allclose(np.asarray(g_cap.feats[:cap]),
                               np.asarray(g_full.feats[:cap]), rtol=1e-6)


def test_grads_flow_through_sparse_convs():
    x = _rand_dense((5, 6, 8), 4, density=0.15, seed=11)
    w1 = jnp.asarray(np.random.RandomState(12).randn(3, 3, 3, 4, 6)
                     .astype(np.float32))
    w2 = jnp.asarray(np.random.RandomState(13).randn(3, 3, 3, 6, 6)
                     .astype(np.float32))
    g = from_dense(x, max_voxels=256)

    def loss(w1, w2):
        h = subm_conv(g, w1)
        out_set = downsample_active(h)
        return jnp.sum(strided_conv(h, w2, out_set).feats ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(w1, w2)
    assert np.isfinite(np.asarray(g1)).all() and np.abs(g1).sum() > 0
    assert np.isfinite(np.asarray(g2)).all() and np.abs(g2).sum() > 0


def test_sparse_backbone_matches_dense_twin():
    """SparseVoxelBackbone8x == VoxelBackbone8x on the same params (eval
    mode: BN uses running stats, so masked-vs-unmasked statistics do not
    differ) at toy scale where the dense twin fits."""
    from coalign_tpu.models.voxel_backbone import (SparseVoxelBackbone8x,
                                                   VoxelBackbone8x)

    x = _rand_dense((9, 16, 24), 4, density=0.06, seed=20)
    dense_bb = VoxelBackbone8x(out_features=32)
    sparse_bb = SparseVoxelBackbone8x(out_features=32)
    g = from_dense(x, max_voxels=512)

    dvars = dense_bb.init(jax.random.PRNGKey(0), x[None], train=False)
    svars = sparse_bb.init(jax.random.PRNGKey(0), g, train=False)
    # identical param trees -> checkpoints are interchangeable
    dflat = jax.tree_util.tree_flatten_with_path(dvars["params"])[0]
    sflat = jax.tree_util.tree_flatten_with_path(svars["params"])[0]
    assert [(jax.tree_util.keystr(p), v.shape) for p, v in dflat] == \
           [(jax.tree_util.keystr(p), v.shape) for p, v in sflat]

    def as_dense(o):
        return to_dense(o) if hasattr(o, "keys") else o

    out_d = dense_bb.apply(dvars, x[None], train=False)
    # default: dense stage-4 tail active at toy scale (fits the budget)
    out_s = sparse_bb.apply(dvars, g, train=False)  # dense params verbatim
    # budget 0: the all-sparse tail, same params
    out_s0 = SparseVoxelBackbone8x(
        out_features=32, dense_tail_budget_bytes=0).apply(
        dvars, g, train=False)
    for out_v in (out_s, out_s0):
        np.testing.assert_allclose(np.asarray(as_dense(out_v["out"])),
                                   np.asarray(out_d["out"][0]),
                                   rtol=2e-4, atol=2e-4)
        for k in ("x_conv1", "x_conv2", "x_conv3", "x_conv4"):
            np.testing.assert_allclose(np.asarray(as_dense(out_v[k])),
                                       np.asarray(out_d[k][0]),
                                       rtol=2e-4, atol=2e-4, err_msg=k)


def test_batched_grid_ops_match_per_frame():
    """Batched (F, M) grids — the form flax modules consume — must equal
    per-frame results, including the STATIC shape of downsampled outputs
    (a regression here once left a stride-2 output declared at full
    resolution and the SECOND heads emitted an 800x2816 map)."""
    from coalign_tpu.models.voxel_backbone import SparseVoxelBackbone8x

    xs = [_rand_dense((9, 16, 24), 4, density=0.06, seed=30 + i)
          for i in range(3)]
    gs = [from_dense(x, max_voxels=512) for x in xs]
    batched = SparseGrid(
        keys=jnp.stack([g.keys for g in gs]),
        feats=jnp.stack([g.feats for g in gs]),
        valid=jnp.stack([g.valid for g in gs]), shape=gs[0].shape)

    bb = SparseVoxelBackbone8x(out_features=32, dense_tail_budget_bytes=0)
    variables = bb.init(jax.random.PRNGKey(1), gs[0], train=False)
    out_b = bb.apply(variables, batched, train=False)
    assert out_b["out"].shape == (1, 2, 3), out_b["out"].shape
    dense_b = to_dense(out_b["out"])
    assert dense_b.shape[:1] == (3,)
    for i, g in enumerate(gs):
        out_1 = bb.apply(variables, g, train=False)
        np.testing.assert_allclose(np.asarray(dense_b[i]),
                                   np.asarray(to_dense(out_1["out"])),
                                   rtol=1e-5, atol=1e-6)
    # dense stage-4 tail (default budget): same result, array output
    bb_dt = SparseVoxelBackbone8x(out_features=32)
    out_dt = bb_dt.apply(variables, batched, train=False)
    np.testing.assert_allclose(np.asarray(out_dt["out"]),
                               np.asarray(dense_b), rtol=2e-5, atol=2e-6)


def test_canvas_lookup_matches_sort_lookup():
    """The rank-canvas rulebook lookup must agree with the sort-merge
    lookup exactly — both batched and single-frame — since the budget
    gate (CANVAS_BUDGET_BYTES) silently switches between them."""
    from coalign_tpu.ops import sparse_conv as sc

    xs = [_rand_dense((7, 12, 20), 3, density=0.08, seed=60 + i)
          for i in range(2)]
    gs = [from_dense(x, max_voxels=256) for x in xs]
    batched = SparseGrid(
        keys=jnp.stack([g.keys for g in gs]),
        feats=jnp.stack([g.feats for g in gs]),
        valid=jnp.stack([g.valid for g in gs]), shape=gs[0].shape)

    orig = sc.CANVAS_BUDGET_BYTES
    try:
        sc.CANVAS_BUDGET_BYTES = 0  # force the sort-merge path
        idx_s, fnd_s = jax.jit(lambda: sc.subm_rulebook(batched))()
        sc.CANVAS_BUDGET_BYTES = orig  # canvas path (tiny grid fits)
        idx_c, fnd_c = jax.jit(lambda: sc.subm_rulebook(batched))()
    finally:
        sc.CANVAS_BUDGET_BYTES = orig
    np.testing.assert_array_equal(np.asarray(fnd_s), np.asarray(fnd_c))
    # row indices must agree wherever a neighbor exists
    m = np.asarray(fnd_s)
    np.testing.assert_array_equal(np.asarray(idx_s)[m], np.asarray(idx_c)[m])

    # and the conv outputs must match through both paths
    w = jnp.asarray(np.random.default_rng(3).normal(
        size=(3, 3, 3, 3, 5)).astype(np.float32))
    try:
        sc.CANVAS_BUDGET_BYTES = 0
        out_s = jax.jit(lambda: subm_conv(batched, w))()
    finally:
        sc.CANVAS_BUDGET_BYTES = orig
    out_c = jax.jit(lambda: subm_conv(batched, w))()
    np.testing.assert_allclose(np.asarray(out_s.feats),
                               np.asarray(out_c.feats), rtol=1e-6)

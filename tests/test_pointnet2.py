"""Masked ball query + grouping ops (ops/pointnet2.py) — the TPU
replacement for the reference CUDA pointnet2 stack
(ref opencood/pcdet_utils/pointnet2/pointnet2_stack)."""

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.ops.pointnet2 import (SAModuleMSG, group_points,
                                       masked_ball_query)


def test_ball_query_against_numpy_oracle():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    mask = rng.random(200) < 0.8
    queries = rng.uniform(-5, 5, (16, 3)).astype(np.float32)
    qmask = np.ones(16, bool)
    radius, nsample = 2.0, 8

    idx, valid = masked_ball_query(jnp.asarray(queries), jnp.asarray(qmask),
                                   jnp.asarray(xyz), jnp.asarray(mask),
                                   radius, nsample, chunk=7)
    idx, valid = np.asarray(idx), np.asarray(valid)
    d2 = ((queries[:, None] - xyz[None]) ** 2).sum(-1)
    d2[:, ~mask] = np.inf
    for q in range(16):
        in_r = np.where(d2[q] <= radius ** 2)[0]
        got = set(idx[q][valid[q]].tolist())
        # every returned index is genuinely in radius and valid
        assert got <= set(in_r.tolist())
        # count matches min(nsample, #in-radius), and they are the nearest
        assert valid[q].sum() == min(nsample, len(in_r))
        if len(in_r) >= nsample:
            nearest = set(np.argsort(d2[q])[:nsample].tolist())
            assert got == nearest


def test_ball_query_masked_query_is_empty():
    xyz = jnp.zeros((10, 3))
    mask = jnp.ones(10, bool)
    q = jnp.zeros((4, 3))
    qmask = jnp.array([True, False, True, False])
    _, valid = masked_ball_query(q, qmask, xyz, mask, 1.0, 4)
    assert not np.asarray(valid)[1].any()
    assert not np.asarray(valid)[3].any()
    assert np.asarray(valid)[0].all()


def test_group_points_recentres_and_zeroes():
    xyz = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    feats = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2))
    new_xyz = jnp.asarray([[0.0, 1.0, 2.0]])
    idx = jnp.asarray([[0, 2, 3]], jnp.int32)
    valid = jnp.asarray([[True, True, False]])
    g = np.asarray(group_points(new_xyz, xyz, feats, idx, valid))
    assert g.shape == (1, 3, 5)
    np.testing.assert_allclose(g[0, 0], [0, 0, 0, 0, 1])
    np.testing.assert_allclose(g[0, 1], [6, 6, 6, 4, 5])
    np.testing.assert_allclose(g[0, 2], np.zeros(5))  # invalid zeroed


def test_sa_module_msg_shapes_and_masking():
    rng = np.random.default_rng(1)
    f, n, k = 2, 64, 8
    xyz = jnp.asarray(rng.uniform(-3, 3, (f, n, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((f, n)) < 0.9)
    feats = jnp.asarray(rng.normal(0, 1, (f, n, 2)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-3, 3, (f, k, 3)).astype(np.float32))
    qmask = jnp.ones((f, k), bool).at[0, 0].set(False)
    sa = SAModuleMSG(radii=(1.0, 2.0), nsamples=(4, 8),
                     mlps=((8, 8), (8, 16)))
    v = sa.init(jax.random.PRNGKey(0), q, qmask, xyz, mask, feats)
    out = np.asarray(sa.apply(v, q, qmask, xyz, mask, feats))
    assert out.shape == (f, k, 24)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0, 0], 0.0)  # masked query zeroed

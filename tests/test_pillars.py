import numpy as np
import jax.numpy as jnp

from coalign_tpu.ops import pillars as P


SPEC = P.PillarSpec.from_config([-8.0, -4.0, -3.0, 8.0, 4.0, 1.0],
                                [0.4, 0.4, 4.0])


def _oracle_bev(points, weight, bias):
    """Numpy oracle mimicking ref PillarVFE + scatter semantics
    (dict voxelizer, cluster/center decoration, linear+relu, max, scatter)."""
    nx, ny = SPEC.nx, SPEC.ny
    r, v = SPEC.lidar_range, SPEC.voxel_size
    pillars = {}
    for p in points:
        x, y, z = p[:3]
        if not (r[0] <= x < r[3] and r[1] <= y < r[4] and r[2] <= z <= r[5]):
            continue
        ix, iy = int(np.floor((x - r[0]) / v[0])), int(np.floor((y - r[1]) / v[1]))
        pillars.setdefault((iy, ix), []).append(p)
    bev = np.zeros((ny, nx, weight.shape[1]), dtype=np.float32)
    for (iy, ix), pts in pillars.items():
        pts = np.stack(pts)
        mean = pts[:, :3].mean(axis=0)
        cx = ix * v[0] + v[0] / 2 + r[0]
        cy = iy * v[1] + v[1] / 2 + r[1]
        cz = v[2] / 2 + r[2]
        feats = np.concatenate(
            [pts, pts[:, :3] - mean, pts[:, :3] - [cx, cy, cz]], axis=1)
        out = np.maximum(feats @ weight + bias, 0.0)
        bev[iy, ix] = out.max(axis=0)
    return bev


def test_pillar_pipeline_matches_oracle(rng):
    n = 500
    pts = np.zeros((n, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(-10, 10, n)   # some out of range
    pts[:, 1] = rng.uniform(-5, 5, n)
    pts[:, 2] = rng.uniform(-3.5, 1.5, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    mask = np.ones(n, dtype=bool)
    mask[-50:] = False  # padded points

    weight = rng.normal(size=(10, 8)).astype(np.float32)
    bias = rng.normal(size=(8,)).astype(np.float32)

    ids, valid = P.pillar_ids(jnp.asarray(pts), jnp.asarray(mask), SPEC)
    feats = P.decorate_points(jnp.asarray(pts), ids, valid, SPEC)
    mlp_out = jnp.maximum(feats @ jnp.asarray(weight) + bias, 0.0)
    # invalid rows must not contribute
    bev = np.asarray(P.scatter_max_bev(mlp_out, ids, valid, SPEC))

    want = _oracle_bev(pts[mask], weight, bias)
    np.testing.assert_allclose(bev, want, atol=1e-3, rtol=1e-3)


def test_pillar_counts(rng):
    pts = np.array([[0.1, 0.1, 0, 0.5], [0.15, 0.12, 0, 0.2],
                    [-7.9, -3.9, 0, 0.1], [99, 0, 0, 0]], dtype=np.float32)
    mask = np.ones(4, dtype=bool)
    ids, valid = P.pillar_ids(jnp.asarray(pts), jnp.asarray(mask), SPEC)
    assert np.asarray(valid).tolist() == [True, True, True, False]
    cnt = np.asarray(P.pillar_count_bev(ids, valid, SPEC))
    assert cnt.sum() == 3
    assert cnt.max() == 2  # two points share a pillar


def test_empty_frame():
    pts = np.zeros((16, 4), dtype=np.float32)
    mask = np.zeros(16, dtype=bool)
    ids, valid = P.pillar_ids(jnp.asarray(pts), jnp.asarray(mask), SPEC)
    feats = P.decorate_points(jnp.asarray(pts), ids, valid, SPEC)
    bev = np.asarray(P.scatter_max_bev(feats, ids, valid, SPEC))
    assert bev.shape == (SPEC.ny, SPEC.nx, 10)
    assert np.all(bev == 0)


def test_scatter_max_bev_compact_matches_direct(rng):
    """Compact two-step canvas scatter == direct segment_max scatter."""
    import jax
    import jax.numpy as jnp

    from coalign_tpu.ops import pillars as P

    spec = P.PillarSpec.from_config([-8, -8, -3, 8, 8, 1], [0.4, 0.4, 4])
    n = 500
    pts = rng.uniform(-9, 9, (n, 4)).astype(np.float32)
    mask = rng.uniform(size=n) > 0.15
    ids, valid = P.pillar_ids(jnp.asarray(pts), jnp.asarray(mask), spec)
    pts_s, ids_s, valid_s = P.sort_points_by_pillar(
        jnp.asarray(pts), ids, valid)
    feats = jnp.abs(jnp.asarray(
        rng.normal(size=(n, 16)).astype(np.float32)))  # post-ReLU-like
    # keep feats aligned with the sort: re-derive from sorted points
    feats_s = feats  # content is arbitrary; alignment with ids_s is fine

    direct = P.scatter_max_bev(feats_s, ids_s, valid_s, spec,
                               indices_are_sorted=True)
    compact = P.scatter_max_bev_compact(feats_s, ids_s, valid_s, spec)
    np.testing.assert_allclose(np.asarray(compact), np.asarray(direct),
                               rtol=0, atol=0)
    nosent = P.scatter_max_bev_nosentinel(feats_s, ids_s, valid_s, spec)
    np.testing.assert_allclose(np.asarray(nosent), np.asarray(direct),
                               rtol=0, atol=0)


def test_scatter_max_bev_cvjp_matches_autodiff(rng):
    """Custom-VJP canvas scatter: forward identical to scatter_max_bev and
    backward equal to autodiff through segment_max + clamp (generic inputs,
    no max ties)."""
    import jax
    import jax.numpy as jnp

    from coalign_tpu.ops import pillars as P

    spec = P.PillarSpec.from_config([-8, -8, -3, 8, 8, 1], [0.4, 0.4, 4])
    n = 500
    pts = rng.uniform(-9, 9, (n, 4)).astype(np.float32)
    mask = rng.uniform(size=n) > 0.15
    ids, valid = P.pillar_ids(jnp.asarray(pts), jnp.asarray(mask), spec)
    _, ids_s, valid_s = P.sort_points_by_pillar(jnp.asarray(pts), ids, valid)
    # strictly positive distinct features: no relu-clamp or max ties, so
    # autodiff and the hand-written backward must agree exactly
    feats = jnp.asarray(
        rng.uniform(0.1, 5.0, (n, 16)).astype(np.float32))

    ref = P.scatter_max_bev(feats, ids_s, valid_s, spec,
                            indices_are_sorted=True)
    out = P.scatter_max_bev_cvjp(feats, ids_s, valid_s, spec)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    cot = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))

    def loss_ref(f):
        return jnp.vdot(P.scatter_max_bev(
            f, ids_s, valid_s, spec, indices_are_sorted=True), cot)

    def loss_cvjp(f):
        return jnp.vdot(P.scatter_max_bev_cvjp(f, ids_s, valid_s, spec), cot)

    g_ref = jax.grad(loss_ref)(feats)
    g_new = jax.grad(loss_cvjp)(feats)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=0, atol=1e-6)

    # vmapped (the production form in PillarEncoder)
    f2 = jnp.stack([feats, feats * 0.5])
    i2 = jnp.stack([ids_s, ids_s])
    v2 = jnp.stack([valid_s, valid_s])
    ref2 = jax.vmap(lambda a, b, c: P.scatter_max_bev(
        a, b, c, spec, indices_are_sorted=True))(f2, i2, v2)
    out2 = jax.vmap(lambda a, b, c: P.scatter_max_bev_cvjp(
        a, b, c, spec))(f2, i2, v2)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref2))

    def loss2(f):
        o = jax.vmap(lambda a, b, c: P.scatter_max_bev_cvjp(
            a, b, c, spec))(f, i2, v2)
        return jnp.vdot(o, jnp.stack([cot, cot]))

    def loss2_ref(f):
        o = jax.vmap(lambda a, b, c: P.scatter_max_bev(
            a, b, c, spec, indices_are_sorted=True))(f, i2, v2)
        return jnp.vdot(o, jnp.stack([cot, cot]))

    np.testing.assert_allclose(np.asarray(jax.grad(loss2)(f2)),
                               np.asarray(jax.grad(loss2_ref)(f2)),
                               rtol=0, atol=1e-6)


def test_scatter_max_bev_cvjp_batched_matches_vmapped(rng):
    """The batch-aware (F, N, C) cvjp path — one flat segment op /
    global-index gather — must match the vmapped per-frame form in both
    forward and backward (it lost the e2e race on layout copies but
    remains a supported calling convention)."""
    import jax
    import jax.numpy as jnp

    from coalign_tpu.ops import pillars as P

    spec = P.PillarSpec.from_config([-4, -4, -3, 4, 4, 1], [0.5, 0.5, 4])
    f, n, c = 3, 200, 8
    pts = rng.uniform(-5, 5, (f, n, 4)).astype(np.float32)
    mask = rng.uniform(size=(f, n)) > 0.2
    ids, valid = jax.vmap(lambda p, m: P.pillar_ids(p, m, spec))(
        jnp.asarray(pts), jnp.asarray(mask))
    feats = jnp.asarray(rng.normal(size=(f, n, c)).astype(np.float32))
    # sorted ids per frame (the cvjp contract)
    order = jnp.argsort(ids, axis=1)
    ids = jnp.take_along_axis(ids, order, axis=1)
    valid = jnp.take_along_axis(valid, order, axis=1)
    feats = jnp.take_along_axis(feats, order[..., None], axis=1)
    feats = jax.nn.relu(feats)  # non-negative like the encoder output

    def loss_vmapped(x):
        bev = jax.vmap(lambda xi, i, v: P.scatter_max_bev_cvjp(
            xi, i, v, spec))(x, ids, valid)
        return jnp.sum(jnp.sin(bev) * bev), bev

    def loss_batched(x):
        bev = P.scatter_max_bev_cvjp(x, ids, valid, spec)
        return jnp.sum(jnp.sin(bev) * bev), bev

    (l1, b1), g1 = jax.value_and_grad(loss_vmapped, has_aux=True)(feats)
    (l2, b2), g2 = jax.value_and_grad(loss_batched, has_aux=True)(feats)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-6)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)

"""Account the pillar-encoder stage (examples/ablate_frame.py s0, ~7.5 ms
of the ~21 ms OPV2V frame) by racing prefix programs of its internals:

  p0  pillar ids (grid hash)
  p1  p0 + co-sort by pillar id (lax.sort, 6 operands x 30k x 5 agents)
  p2  p1 + cumsum-trick decoration (f32 scans)
  p3  p2 + VFE Dense+BN+ReLU (bf16 matmul)
  p4  p3 + canvas segment_max scatter (= the full encoder)

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python examples/ablate_pillar.py [iters]
"""
import sys
import time

import jax
import jax.numpy as jnp

import bench as BB
from coalign_tpu.ops import pillars as P


def timed(fn, args, iters):
    out = fn(*args)
    BB._drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    BB._drain(out)
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    model, _ = BB._setup()
    batch = BB.make_batch(1)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch)
    spec = P.PillarSpec.from_config(BB.LIDAR_RANGE, BB.VOXEL)

    b, l, n, _ = batch["points"].shape
    points = batch["points"].reshape(b * l, n, -1)
    pmask = batch["point_mask"].reshape(b * l, n)

    dense_p = variables["params"]["encoder"]["Dense_0"]
    bn = variables["params"]["encoder"]["MaskedBatchNorm_0"]

    def p0(pts, msk):
        return jax.vmap(lambda p, m: P.pillar_ids(p, m, spec))(pts, msk)

    def p1(pts, msk):
        ids, valid = p0(pts, msk)
        return jax.vmap(P.sort_points_by_pillar)(pts, ids, valid)

    def p2(pts, msk):
        spts, ids, valid = p1(pts, msk)
        feats = jax.vmap(lambda p, i, v: P.decorate_points_sorted(
            p, i, v, spec))(spts, ids, valid)
        return feats, ids, valid

    def _vfe(feats, valid):
        x = (feats.astype(jnp.bfloat16) @ dense_p["kernel"].astype(jnp.bfloat16))
        inv = bn["scale"].astype(x.dtype) / jnp.sqrt(
            jnp.ones_like(bn["scale"]).astype(x.dtype) + 1e-3)
        x = x * inv + bn["bias"].astype(x.dtype)
        return jax.nn.relu(x) * valid[..., None]

    def p3(pts, msk):
        feats, ids, valid = p2(pts, msk)
        return _vfe(feats, valid), ids, valid

    def p4(pts, msk):
        x, ids, valid = p3(pts, msk)
        return jax.vmap(lambda xi, i, v: P.scatter_max_bev(
            xi, i, v, spec, indices_are_sorted=True))(x, ids, valid)

    def p4_real(pts, msk):
        def encode(m, bb):
            return m.encoder(bb["points"].reshape(b * l, n, -1),
                             bb["point_mask"].reshape(b * l, n), train=False)
        return model.apply(variables, batch, method=encode)

    stages = [("p0_ids", p0), ("p1_sort", p1), ("p2_decorate", p2),
              ("p3_vfe", p3), ("p4_scatter", p4),
              ("p4_real_encoder", p4_real)]
    prev = 0.0
    print(f"{'stage':18s} {'prefix ms':>10s} {'delta ms':>10s}")
    for name, fn in stages:
        t = timed(jax.jit(fn), (points, pmask), iters) * 1e3
        print(f"{name:18s} {t:10.2f} {t - prev:10.2f}")
        prev = t


if __name__ == "__main__":
    main()

"""Account the full B=1 OPV2V-scale frame time by racing PREFIX programs
of the inference pipeline on the real chip.

The round-3 device trace (docs/PARITY.md) attributes ~8 ms of the ~21 ms
frame (warp gathers, canvas scatter, candidate sorts); per-op trace times
are inflated by instrumentation, so this harness instead times jitted
prefixes of the real pipeline with the trusted protocol (saturated loop,
forced drain, >=100 iters — see bench.py / docs measurement discipline):

  s0  pillar encode (sort + cumsum decoration + VFE + canvas scatter)
  s1  s0 + multiscale trunk (ResNet encode)
  s2  s1 + per-scale warp + attention fusion
  s3  full forward (decode deconvs + shrink + heads)
  s4  forward + select-then-decode + dir fix + rotated NMS (= bench value)

Deltas between consecutive rows attribute time to each stage (prefix
outputs must materialize in HBM, so deltas slightly overcount stages
whose outputs the full program keeps fused — treat as upper bounds).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python examples/ablate_frame.py [iters]
"""
import sys
import time

import numpy as np

import jax

import bench as BB
from coalign_tpu.inference import make_infer_fn


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
    model, spec = BB._setup()
    batch = BB.make_batch(1)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch)

    def encode(m, b):
        return m._encode_agents(b, False)[0]

    def trunk(m, b):
        bev, affine, bn_mask, _ = m._encode_agents(b, False)
        return m.backbone.encode(bev, train=False, mask=bn_mask)

    def fuse(m, b):
        bev, affine, bn_mask, (bb, ll) = m._encode_agents(b, False)
        scales = m.backbone.encode(bev, train=False, mask=bn_mask)
        outs = []
        for i, feat in enumerate(scales):
            h, w, c = feat.shape[1:]
            outs.append(m.fusion_nets[i](feat.reshape(bb, ll, h, w, c),
                                         affine, b["agent_mask"],
                                         train=False))
        return outs

    stages = [
        ("s0_pillar_encode", jax.jit(
            lambda v, b: model.apply(v, b, method=encode))),
        ("s1_trunk", jax.jit(
            lambda v, b: model.apply(v, b, method=trunk))),
        ("s2_warp_fusion", jax.jit(
            lambda v, b: model.apply(v, b, method=fuse))),
        ("s3_forward", jax.jit(
            lambda v, b: model.apply(v, b, train=False))),
        ("s4_full_infer", make_infer_fn(model, spec.anchors, BB.POSTPROCESS)),
    ]

    prev = 0.0
    print(f"{'stage':20s} {'prefix ms':>10s} {'delta ms':>10s}")
    for name, fn in stages:
        t = timed(fn, (variables, batch), iters) * 1e3
        print(f"{name:20s} {t:10.2f} {t - prev:10.2f}")
        prev = t


if __name__ == "__main__":
    main()

"""Account the decode+NMS tail (~2.5 ms of the OPV2V frame): race the
full-infer program against variants with pieces of the postprocess
stubbed, attributing cost by difference (full-program races, not
prefix materialization — see docs/PARITY.md measurement discipline).

  v0  full infer (baseline)
  v1  decode with NMS's rotated-IoU matrix replaced by zeros (keeps
      top_k + packed gather + ranked gather; removes the 512x512
      convex clip + fixpoint)
  v2  v1 with top_k replaced by a static slice (removes the 140k top_k)

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python examples/ablate_decode.py [iters]
"""
import sys
import time

import jax
import jax.numpy as jnp

import bench as BB
from coalign_tpu.inference import make_infer_fn
from coalign_tpu.postprocess import decode as D
from coalign_tpu.utils import nms as NMS


def timed(fn, args, iters):
    out = fn(*args)
    BB._drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    BB._drain(out)
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    model, spec = BB._setup()
    batch = BB.make_batch(1)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch)

    real_iou = NMS.rotated_iou_corners
    real_topk = jax.lax.top_k

    def fake_iou(a, b):
        return jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)

    def fake_topk(x, k):
        return x[..., :k], jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32), x.shape[:-1] + (k,))

    rows = []
    for name, iou_fn, topk_fn in (
            ("v0_full", real_iou, real_topk),
            ("v1_no_ioumatrix", fake_iou, real_topk),
            ("v2_no_topk_too", fake_iou, fake_topk)):
        NMS.rotated_iou_corners = iou_fn
        D.jax.lax.top_k = topk_fn
        try:
            infer = make_infer_fn(model, spec.anchors, BB.POSTPROCESS)
            t = timed(infer, (variables, batch), iters) * 1e3
            rows.append((name, t))
            print(f"{name:18s} {t:8.2f} ms  {1e3 / t:6.1f} fps")
        finally:
            NMS.rotated_iou_corners = real_iou
            D.jax.lax.top_k = real_topk


if __name__ == "__main__":
    main()

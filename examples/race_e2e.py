"""Race the CURRENT full inference program on the real chip — saturated
e2e protocol (distinct-input loop, forced drain, 200 iters).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python examples/race_e2e.py [B] [iters]
"""
import sys
import time

import jax

import bench as BB
from coalign_tpu.inference import make_infer_fn


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    model, spec = BB._setup()
    infer = make_infer_fn(model, spec.anchors, BB.POSTPROCESS)
    batch = BB.make_batch(bs)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch)
    out = infer(variables, batch)
    BB._drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, batch)
    BB._drain(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"B={bs}: {dt * 1e3:.2f} ms/step, {bs / dt:.1f} frames/s")


if __name__ == "__main__":
    main()

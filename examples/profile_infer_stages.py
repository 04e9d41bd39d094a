"""Split the B=1 OPV2V-scale inference program into stages on the real
chip: model forward alone vs forward+decode+NMS, and race the bilinear
warp variants inside the FULL program (micro-benchmarks of isolated
gathers are misleading on TPU — see docs/PARITY.md perf notes).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python examples/profile_infer_stages.py
"""
import time

import numpy as np

import jax

import bench as BB
from coalign_tpu.inference import make_infer_fn
from coalign_tpu.ops import warp as warp_mod


def timed(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    model, spec = BB._setup()
    batch = BB.make_batch(1)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch)

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    infer = make_infer_fn(model, spec.anchors, BB.POSTPROCESS)

    for name, gather in (("split4", None),
                         ("pair", warp_mod._bilinear_gather_pair)):
        if gather is not None:
            orig = warp_mod._bilinear_gather
            warp_mod._bilinear_gather = gather
            fwd_v = jax.jit(lambda v, b: model.apply(v, b, train=False))
            infer_v = make_infer_fn(model, spec.anchors, BB.POSTPROCESS)
        else:
            fwd_v, infer_v = fwd, infer
        try:
            t_fwd = timed(fwd_v, variables, batch)
            t_full = timed(infer_v, variables, batch)
            print(f"warp={name}: model fwd {t_fwd*1e3:.2f} ms, "
                  f"full infer {t_full*1e3:.2f} ms "
                  f"(decode+NMS ~{(t_full-t_fwd)*1e3:.2f} ms) "
                  f"-> {1.0/t_full:.1f} fps")
        finally:
            if gather is not None:
                warp_mod._bilinear_gather = orig


if __name__ == "__main__":
    main()

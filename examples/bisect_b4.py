#!/usr/bin/env python
"""Bisect the B=4 TPU worker fault to a pipeline stage.

Runs progressively larger prefixes of the flagship forward (encoder ->
backbone.encode -> per-scale fusion -> full forward) at a given batch size,
each stage invoked as `--upto <stage>`; the driver loop runs each in a
subprocess so a faulting program cannot poison later probes.

Usage: python examples/bisect_b4.py            # run the whole bisection
       python examples/bisect_b4.py --upto encoder --bs 4   # one probe
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MODEL_ARGS, make_batch  # noqa: E402

STAGES = ["encoder", "scales", "fusion", "decode", "full"]


def probe(upto: str, bs: int):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from coalign_tpu.models import build_model
    from coalign_tpu.models.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)
    model = build_model({"core_method": "point_pillar_baseline_multiscale",
                         "args": MODEL_ARGS})
    batch1 = make_batch(1)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch1)
    batch = batch1 if bs == 1 else make_batch(bs)

    def partial(mdl, batch):
        bev, affine, bn_mask, (b, l) = mdl._encode_agents(batch, False)
        if upto == "encoder":
            return bev.sum()
        scales = mdl.backbone.encode(bev, train=False, mask=bn_mask)
        if upto == "scales":
            return sum(s.sum() for s in scales)
        fused_scales = []
        for i, feat in enumerate(scales):
            h, w, c = feat.shape[1:]
            fused_scales.append(mdl.fusion_nets[i](
                feat.reshape(b, l, h, w, c), affine,
                batch["agent_mask"], train=False))
        if upto == "fusion":
            return sum(s.sum() for s in fused_scales)
        fused = mdl.backbone.decode(tuple(fused_scales), train=False)
        if mdl.shrink is not None:
            fused = mdl.shrink(fused, train=False)
        if upto == "decode":
            return fused.sum()
        out = mdl.heads(fused)
        return sum(v.sum() for v in out.values())

    fn = jax.jit(lambda v, b: model.apply(v, b, method=partial))
    t0 = time.perf_counter()
    out = fn(variables, batch)
    jax.block_until_ready(out)
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(variables, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(json.dumps({"upto": upto, "bs": bs, "ok": float(out),
                      "step_ms": round(dt * 1e3, 2),
                      "first_s": round(compile_and_run, 1)}))


def main():
    if "--upto" in sys.argv:
        upto = sys.argv[sys.argv.index("--upto") + 1]
        bs = int(sys.argv[sys.argv.index("--bs") + 1])
        probe(upto, bs)
        return

    results = {}
    for upto in STAGES:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--upto", upto, "--bs", "4"]
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=1500)
        except subprocess.TimeoutExpired:
            results[upto] = "timeout"
            print(upto, "-> timeout", flush=True)
            continue
        line = None
        for ln in reversed(out.stdout.strip().splitlines()):
            try:
                line = json.loads(ln)
                break
            except ValueError:
                continue
        if line:
            results[upto] = line
        else:
            tail = (out.stderr or "").strip().splitlines()
            results[upto] = tail[-1][:300] if tail else f"rc={out.returncode}"
        print(upto, "->", results[upto], flush=True)
    print(json.dumps(results, default=str))


if __name__ == "__main__":
    main()

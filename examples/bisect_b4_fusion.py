#!/usr/bin/env python
"""Narrow the B=4 TPU fault inside the fusion stage.

bisect_b4.py isolated the fault to the per-scale warp+attention fusion.
This probes finer slices at a given batch size, each in a subprocess:

  warp0/warp1/warp2 — warp_agents_to_ego only, one scale
  att0/att1/att2    — full AttFusion (warp + per-pixel attention), one scale
  attnw0..2         — attention math WITHOUT the warp (identity affines
                      replaced by the raw features)
  allwarp           — warp at all three scales
  allfuse           — the production fusion loop (all scales)

Usage: python examples/bisect_b4_fusion.py [--bs 4]
       python examples/bisect_b4_fusion.py --probe att0 --bs 4
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MODEL_ARGS, make_batch  # noqa: E402

PROBES = ["warp0", "warp1", "warp2", "attnw0", "attnw1", "attnw2",
          "att0", "att1", "att2", "allwarp", "allfuse"]


def probe(name: str, bs: int):
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
    from coalign_tpu.ops.warp import warp_agents_to_ego

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
        scales = mdl.backbone.encode(bev, train=False, mask=bn_mask)
        feats = []
        for feat in scales:
            h, w, c = feat.shape[1:]
            feats.append(feat.reshape(b, l, h, w, c))
        mask = batch["agent_mask"]
        if name.startswith("warp"):
            i = int(name[-1])
            return warp_agents_to_ego(feats[i], affine[:, 0], mask).sum()
        if name.startswith("attnw"):
            i = int(name[-1])
            x = feats[i]
            c = x.shape[-1]
            q = x[:, 0]
            scores = jnp.einsum("bhwc,blhwc->blhw", q, x) / (c ** 0.5)
            scores = jnp.where(mask[:, :, None, None], scores, -jnp.inf)
            att = jnp.exp(scores - jnp.max(scores, axis=1, keepdims=True))
            att = jnp.where(mask[:, :, None, None], att, 0.0)
            att = att / jnp.maximum(att.sum(1, keepdims=True), 1e-9)
            return jnp.einsum("blhw,blhwc->bhwc", att, x).sum()
        if name.startswith("att"):
            i = int(name[-1])
            return mdl.fusion_nets[i](feats[i], affine, mask,
                                      train=False).sum()
        if name == "allwarp":
            return sum(warp_agents_to_ego(f, affine[:, 0], mask).sum()
                       for f in feats)
        # allfuse: the production path
        return sum(mdl.fusion_nets[i](feats[i], affine, mask,
                                      train=False).sum()
                   for i in range(3))

    fn = jax.jit(lambda v, b: model.apply(v, b, method=partial))
    t0 = time.perf_counter()
    out = fn(variables, batch)
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(variables, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(json.dumps({"probe": name, "bs": bs, "ok": float(out),
                      "step_ms": round(dt * 1e3, 2),
                      "first_s": round(first, 1)}))


def main():
    if "--probe" in sys.argv:
        probe(sys.argv[sys.argv.index("--probe") + 1],
              int(sys.argv[sys.argv.index("--bs") + 1]))
        return
    bs = (int(sys.argv[sys.argv.index("--bs") + 1])
          if "--bs" in sys.argv else 4)
    results = {}
    for name in PROBES:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--probe", name, "--bs", str(bs)]
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=1200)
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
            print(name, "-> timeout", flush=True)
            continue
        line = None
        for ln in reversed(out.stdout.strip().splitlines()):
            try:
                line = json.loads(ln)
                break
            except ValueError:
                continue
        results[name] = line or (out.stderr or "").strip().splitlines()[-1][:200]
        print(name, "->", results[name], flush=True)
    print(json.dumps(results, default=str))


if __name__ == "__main__":
    main()

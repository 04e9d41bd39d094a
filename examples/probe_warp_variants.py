#!/usr/bin/env python
"""Probe bilinear-warp gather formulations at the B=4 faulting shape.

bisect_b4_fusion.py isolated the TPU worker fault to warp_agents_to_ego
at scale 1: maps (20, 50, 176, 128) bf16 (B=4 x L=5). Each variant runs
in a subprocess so a faulting program cannot poison later probes.

  pair   — production 2-gather paired-channel table (faults here)
  split2 — two independent C-wide gathers (left/right taps, no packing)
  seqmap — pair table under lax.map over the 20 maps
  halfw  — pair table with W split into two half-width gathers
  padrow — pair table with the row axis padded to a multiple of 8
"""

import json
import os
import subprocess
import sys
import time

VARIANTS = ["pair", "split2", "seqmap", "halfw", "padrow"]
SHAPE = (20, 50, 176, 128)  # (B*L, H, W, C) at the faulting scale


def probe(variant: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    n, h, w, c = SHAPE
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(0, 1, SHAPE).astype(np.float32),
                        dtype=jnp.bfloat16)
    ang = rng.uniform(-0.4, 0.4, n)
    affines = np.zeros((n, 2, 3), np.float32)
    affines[:, 0, 0] = np.cos(ang)
    affines[:, 0, 1] = -np.sin(ang) * h / w
    affines[:, 1, 0] = np.sin(ang) * w / h
    affines[:, 1, 1] = np.cos(ang)
    affines[:, :, 2] = rng.uniform(-0.1, 0.1, (n, 2))
    affines = jnp.asarray(affines)

    def coords(affine):
        affine = affine.astype(jnp.float32)
        ys = (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0
        xs = (2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w - 1.0
        gx = (affine[0, 0] * xs[None, :] + affine[0, 1] * ys[:, None]
              + affine[0, 2])
        gy = (affine[1, 0] * xs[None, :] + affine[1, 1] * ys[:, None]
              + affine[1, 2])
        fx = ((gx + 1.0) * w - 1.0) / 2.0
        fy = ((gy + 1.0) * h - 1.0) / 2.0
        return fx, fy

    def warp_pair(src, affine, pad_rows=0):
        fx, fy = coords(affine)
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx, ty = fx - x0, fy - y0
        x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
        sp = jnp.pad(src, ((0, 0), (1, 1), (0, 0)))
        pair = jnp.concatenate([sp[:, :-1], sp[:, 1:]], axis=-1)
        flat = pair.reshape(h * (w + 1), 2 * c)
        if pad_rows:
            extra = (-flat.shape[0]) % pad_rows
            flat = jnp.pad(flat, ((0, extra), (0, 0)))
        p = jnp.clip(x0i + 1, 0, w)

        def tap2(yi):
            iny = (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * (w + 1) + p
            vals = flat[idx.reshape(-1)].reshape(idx.shape + (2 * c,))
            return vals * iny[..., None].astype(src.dtype)

        top, bot = tap2(y0i), tap2(y0i + 1)
        m0 = ((x0i >= 0) & (x0i < w))[..., None].astype(src.dtype)
        m1 = ((x0i + 1 >= 0) & (x0i + 1 < w))[..., None].astype(src.dtype)
        wx0 = (1 - tx)[..., None].astype(src.dtype) * m0
        wx1 = tx[..., None].astype(src.dtype) * m1
        ty_ = ty[..., None].astype(src.dtype)
        top_v = top[..., :c] * wx0 + top[..., c:] * wx1
        bot_v = bot[..., :c] * wx0 + bot[..., c:] * wx1
        return top_v * (1 - ty_) + bot_v * ty_

    def warp_split2(src, affine):
        fx, fy = coords(affine)
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx, ty = fx - x0, fy - y0
        x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
        sp = jnp.pad(src, ((0, 0), (1, 1), (0, 0)))  # (h, w+2, c)
        flat = sp.reshape(h * (w + 2), c)
        p = jnp.clip(x0i + 1, 0, w)

        def tap(yi, dx):
            iny = (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * (w + 2) + p + dx
            vals = flat[idx.reshape(-1)].reshape(idx.shape + (c,))
            return vals * iny[..., None].astype(src.dtype)

        m0 = ((x0i >= 0) & (x0i < w))[..., None].astype(src.dtype)
        m1 = ((x0i + 1 >= 0) & (x0i + 1 < w))[..., None].astype(src.dtype)
        wx0 = (1 - tx)[..., None].astype(src.dtype) * m0
        wx1 = tx[..., None].astype(src.dtype) * m1
        ty_ = ty[..., None].astype(src.dtype)
        top_v = tap(y0i, 0) * wx0 + tap(y0i, 1) * wx1
        bot_v = tap(y0i + 1, 0) * wx0 + tap(y0i + 1, 1) * wx1
        return top_v * (1 - ty_) + bot_v * ty_

    if variant == "pair":
        fn = jax.jit(jax.vmap(warp_pair))
    elif variant == "split2":
        fn = jax.jit(jax.vmap(warp_split2))
    elif variant == "seqmap":
        fn = jax.jit(lambda f, a: jax.lax.map(
            lambda t: warp_pair(*t), (f, a)))
    elif variant == "halfw":
        def half(src, affine):
            out = warp_pair(src, affine)
            return out  # placeholder; halfw handled below

        def warp_halfw(src, affine):
            fx, fy = coords(affine)
            x0 = jnp.floor(fx)
            y0 = jnp.floor(fy)
            tx, ty = fx - x0, fy - y0
            x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
            sp = jnp.pad(src, ((0, 0), (1, 1), (0, 0)))
            pair = jnp.concatenate([sp[:, :-1], sp[:, 1:]], axis=-1)
            flat = pair.reshape(h * (w + 1), 2 * c)
            p = jnp.clip(x0i + 1, 0, w)
            outs = []
            for sl in (slice(0, w // 2), slice(w // 2, w)):
                pp, yy = p[:, sl], y0i[:, sl]

                def tap2(yi):
                    iny = (yi >= 0) & (yi < h)
                    idx = jnp.clip(yi, 0, h - 1) * (w + 1) + pp
                    vals = flat[idx.reshape(-1)].reshape(
                        idx.shape + (2 * c,))
                    return vals * iny[..., None].astype(src.dtype)

                top, bot = tap2(yy), tap2(yy + 1)
                m0 = ((x0i[:, sl] >= 0)
                      & (x0i[:, sl] < w))[..., None].astype(src.dtype)
                m1 = ((x0i[:, sl] + 1 >= 0)
                      & (x0i[:, sl] + 1 < w))[..., None].astype(src.dtype)
                wx0 = (1 - tx[:, sl])[..., None].astype(src.dtype) * m0
                wx1 = tx[:, sl][..., None].astype(src.dtype) * m1
                ty_ = ty[:, sl][..., None].astype(src.dtype)
                top_v = top[..., :c] * wx0 + top[..., c:] * wx1
                bot_v = bot[..., :c] * wx0 + bot[..., c:] * wx1
                outs.append(top_v * (1 - ty_) + bot_v * ty_)
            return jnp.concatenate(outs, axis=1)

        fn = jax.jit(jax.vmap(warp_halfw))
    elif variant == "padrow":
        fn = jax.jit(jax.vmap(lambda s, a: warp_pair(s, a, pad_rows=8)))
    else:
        raise SystemExit(f"unknown variant {variant}")

    t0 = time.perf_counter()
    out = fn(feats, affines)
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(feats, affines)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({"variant": variant,
                      "ok": float(jnp.sum(out.astype(jnp.float32))),
                      "step_ms": round(dt * 1e3, 3),
                      "first_s": round(first, 1)}))


def main():
    if "--variant" in sys.argv:
        probe(sys.argv[sys.argv.index("--variant") + 1])
        return
    results = {}
    for v in VARIANTS:
        cmd = [sys.executable, os.path.abspath(__file__), "--variant", v]
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=900)
        except subprocess.TimeoutExpired:
            results[v] = "timeout"
            print(v, "-> timeout", flush=True)
            continue
        line = None
        for ln in reversed(out.stdout.strip().splitlines()):
            try:
                line = json.loads(ln)
                break
            except ValueError:
                continue
        results[v] = line or (out.stderr or "?").strip().splitlines()[-1][:200]
        print(v, "->", results[v], flush=True)
    print(json.dumps(results, default=str))


if __name__ == "__main__":
    main()

"""Device-trace the OPV2V-scale inference or train step and print a per-op
cost table (top XLA ops by total device time).

The jax.profiler perfetto trace is parsed directly (trace.json.gz under
<logdir>/plugins/perfetto) — no TensorBoard needed. Per-op absolute times
carry instrumentation overhead on this remote stack (docs/PARITY.md), so
treat the table as a RANKING with approximate shares, and always quote the
untraced wall time next to it.

Usage:
    PYTHONPATH=/root/repo python examples/trace_step.py train [B]
    PYTHONPATH=/root/repo python examples/trace_step.py infer [B]
"""
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

import jax

import bench as BB


def run_traced(step, args, logdir, iters=3):
    out = step(*args)  # compile outside the trace
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    try:
        for _ in range(iters):
            out = step(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    finally:
        jax.profiler.stop_trace()
    return iters


def untraced_ms(step, args, iters=20):
    out = step(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def _canon(name: str) -> str:
    """Collapse fusion instances: 'fusion.123' -> 'fusion', keep op kind."""
    return re.sub(r"[._]\d+$", "", name)


def per_op_table(logdir, iters):
    paths = glob.glob(os.path.join(logdir, "**", "*.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no perfetto trace under {logdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    # device tracks: pid/tid names containing TPU / device; fall back to
    # "every complete event whose name looks like an HLO op"
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in events:
        if not isinstance(ev, dict) or ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        cat = str(ev.get("cat", ""))
        if "TensorFlow" in cat or "host" in cat.lower():
            continue
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        totals[_canon(name)] += dur
        counts[_canon(name)] += 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    return [(name, us / iters / 1e3, counts[name]) for name, us in rows]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "train"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    model, spec = BB._setup()
    batch = BB.make_batch(bs)

    if which == "train":
        from coalign_tpu.loss import build_loss
        from coalign_tpu.train import (build_optimizer, create_train_state,
                                       make_train_step)
        loss_fn = build_loss(BB.LOSS_CFG)
        tx = build_optimizer({"lr": 1e-3, "args": {}}, None)
        state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
        raw_step = make_train_step(model, loss_fn, spec)

        # non-donating wrapper: donated buffers can't be reused across
        # traced iterations
        def step(s, b):
            new_s, metrics = raw_step(
                jax.tree_util.tree_map(lambda x: x + 0 if hasattr(
                    x, "dtype") else x, s), b)
            return metrics
        args = (state, batch)
    else:
        from coalign_tpu.inference import make_infer_fn
        infer = make_infer_fn(model, spec.anchors, BB.POSTPROCESS)
        variables = jax.jit(
            lambda k, b: model.init(k, b, train=False))(
                jax.random.PRNGKey(0), batch)
        step, args = infer, (variables, batch)

    wall = untraced_ms(step, args)
    logdir = tempfile.mkdtemp(prefix=f"trace_{which}_")
    iters = run_traced(step, args, logdir)
    print(f"=== {which} B={bs}: untraced wall {wall:.2f} ms/step ===")
    rows = per_op_table(logdir, iters)
    traced_total = sum(ms for _, ms, _ in rows)
    print(f"traced device total {traced_total:.2f} ms/step "
          f"(overhead-inflated; ranking only)")
    for name, ms, n in rows[:25]:
        print(f"{ms:9.3f} ms  x{n:4d}  {name[:90]}")
    print(f"trace dir: {logdir}")


if __name__ == "__main__":
    main()

"""Device-trace the OPV2V-scale inference or train step and print a per-op
cost table (top XLA ops by device time, with HLO long names + bytes).

The jax.profiler perfetto trace is parsed directly (trace.json.gz under
<logdir>/plugins/perfetto) — no TensorBoard needed. Only events on the
device process's "XLA Ops" track are counted, using their
``device_duration_ps`` arg (the real on-device time, not the host span), so
the table is trustworthy per-op data — unlike host-span parsing, which
mixes Python dispatch events into the totals. The per-category rollup
(convolution fusion / custom fusion (gathers+scatters) / data formatting /
sort / ...) is the headline; docs/PARITY.md quotes it.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python examples/trace_step.py train [B]
    PYTHONPATH=/root/.axon_site:/root/repo python examples/trace_step.py infer [B]
"""
import glob
import gzip
import json
import os
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


def per_op_table(logdir, iters, top=30):
    paths = glob.glob(os.path.join(logdir, "**", "*.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no perfetto trace under {logdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    # device pid(s) + their "XLA Ops" thread, from the metadata events
    dev_pids, ops_tids = set(), {}
    for e in events:
        if e.get("ph") != "M":
            continue
        name = e.get("args", {}).get("name", "")
        if e.get("name") == "process_name" and "/device:" in str(name):
            dev_pids.add(e["pid"])
        if e.get("name") == "thread_name" and name == "XLA Ops":
            ops_tids[e["pid"]] = e["tid"]

    dur = defaultdict(float)
    cnt = defaultdict(int)
    byts = defaultdict(float)
    cat, lname = {}, {}
    cat_dur = defaultdict(float)
    total = 0.0
    for e in events:
        if (e.get("ph") != "X" or e.get("pid") not in dev_pids
                or e.get("tid") != ops_tids.get(e.get("pid"))):
            continue
        a = e.get("args", {})
        d = float(a.get("device_duration_ps", 0)) / 1e9  # ps -> ms
        if d <= 0:
            continue
        k = e.get("name", "")
        dur[k] += d
        cnt[k] += 1
        byts[k] += float(a.get("bytes_accessed", 0))
        cat[k] = a.get("hlo_category", "")
        lname.setdefault(k, a.get("long_name", ""))
        cat_dur[a.get("hlo_category", "?")] += d
        total += d
    print(f"device total {total / iters:.2f} ms/step")
    print("-- by HLO category (ms/step) --")
    for c, d in sorted(cat_dur.items(), key=lambda kv: -kv[1]):
        if d / iters >= 0.01:
            print(f"{d / iters:9.3f} ms  {c}")
    print(f"-- top {top} ops --")
    for k in sorted(dur, key=lambda k: -dur[k])[:top]:
        mb = byts[k] / max(cnt[k], 1) / 1e6
        print(f"{dur[k] / iters:9.3f} ms x{cnt[k] // iters:4d} "
              f"{mb:9.1f} MB/call [{cat[k][:18]:18s}] {k}")
        print(f"           {lname[k][:200]}")


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
        # donate=False: the traced loop feeds the SAME state every iteration
        # (a donating step invalidates its input buffers; the eager per-leaf
        # copy workaround polluted both the wall time and the trace)
        step, args = make_train_step(model, loss_fn, spec,
                                     donate=False), (state, batch)
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
    per_op_table(logdir, iters)
    print(f"trace dir: {logdir}")


if __name__ == "__main__":
    main()

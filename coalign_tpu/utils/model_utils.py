"""Checkpoint parameter surgery for flax param pytrees.

TPU-first rework of ref opencood/utils/model_utils.py (rename_model_dict_
keys:44, compose_model:71, weight_init:29): the reference mutates torch
state dicts in place; here the same workflows — renaming parameter paths and
composing a model's params from two checkpoints (e.g. the V2VNet-robust
3-stage curriculum, ref hypes_yaml/readme.md) — operate functionally on
nested flax dicts.
"""

from __future__ import annotations

import re
from typing import Any, Dict


def flatten_params(params: dict, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in params.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, path))
        else:
            out[path] = v
    return out


def unflatten_params(flat: Dict[str, Any]) -> dict:
    out: dict = {}
    for path, v in flat.items():
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def rename_param_keys(params: dict, pattern: str, repl: str) -> dict:
    """Regex-rename parameter paths (ref rename_model_dict_keys:44)."""
    flat = flatten_params(params)
    return unflatten_params({re.sub(pattern, repl, k): v
                             for k, v in flat.items()})


def compose_params(base: dict, donor: dict, key_patterns) -> dict:
    """Take every donor leaf whose path matches any pattern, keep the rest
    from base (ref compose_model:71 — stage-wise checkpoint composition)."""
    fb = flatten_params(base)
    fd = flatten_params(donor)
    pats = [re.compile(p) for p in key_patterns]
    for k, v in fd.items():
        if any(p.search(k) for p in pats) and k in fb:
            fb[k] = v
    return unflatten_params(fb)


def count_params(params: dict) -> int:
    import numpy as np

    return int(sum(np.prod(v.shape) for v in flatten_params(params).values()
                   if hasattr(v, "shape")))


def cleanup_checkpoints(ckpt_dir: str, keep: int = 3) -> list:
    """Delete all but the newest ``keep`` step_* checkpoints (the bestval
    slot is always kept) — ref utils/cleanup_utils.py. Returns removed."""
    import os
    import shutil

    steps = sorted(
        (d for d in os.listdir(ckpt_dir) if d.startswith("step_")),
        key=lambda d: int(d.split("_")[1]))
    removed = []
    for d in steps[:-keep] if keep else steps:
        shutil.rmtree(os.path.join(ckpt_dir, d))
        removed.append(d)
    return removed

"""AOT export / serving: package the fused inference program as a
self-contained deployment artifact.

The reference has no deployment story beyond "run inference.py in the
training repo" (ref opencood/tools/inference.py:40-227 — python loop,
CPU shapely NMS, needs the full model zoo importable). Here the whole
frame program (forward -> decode -> dir fix -> rotated NMS -> range mask,
coalign_tpu/inference.make_infer_fn) is serialized ONCE with
``jax.export`` (StableHLO with forward-compatibility guarantees) plus the
parameter pytree, and a serving host reloads it with
:func:`load_artifact` — no model-building code, no config parsing, no
flax on the deploy side. Multi-platform lowering (``platforms=("cpu",
"tpu")``) lets the same artifact run on a TPU serving fleet and on CPU
fallback hosts.

Artifact layout (one directory):
  program.jaxexport   serialized jax.export.Exported (StableHLO + vjp-free)
  params.npz          parameter/batch-stat leaves, "/"-joined tree paths
  meta.json           batch contract (key -> shape/dtype), platforms,
                      jax version — validated at load and call time
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

_PROGRAM = "program.jaxexport"
_PARAMS = "params.npz"
_META = "meta.json"


def _flatten_tree(tree) -> dict:
    """Nested-dict pytree -> {"a/b/c": leaf} (flax param trees are plain
    nested dicts, so paths are DictKeys all the way down)."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_tree(flat: dict) -> dict:
    tree: dict = {}
    for key, leaf in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def export_inference(model, variables, batch: dict, anchors,
                     postprocess_cfg: dict, out_dir: str,
                     platforms=("cpu", "tpu")) -> str:
    """Trace the fused inference program at ``batch``'s shapes and write a
    deployment artifact to ``out_dir``. Returns ``out_dir``.

    ``variables`` stays an argument of the exported program (params.npz
    alongside), so a re-trained checkpoint can be swapped into an existing
    artifact without re-export, as long as the tree structure matches.
    """
    from jax import export as jexport

    from coalign_tpu.inference import make_infer_fn

    infer = make_infer_fn(model, anchors, postprocess_cfg)
    exported = jexport.export(infer, platforms=tuple(platforms))(
        variables, batch)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PROGRAM), "wb") as f:
        f.write(exported.serialize())
    np.savez(os.path.join(out_dir, _PARAMS), **_flatten_tree(variables))
    meta = {
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "batch_spec": {k: {"shape": list(np.shape(v)),
                           "dtype": str(np.asarray(v).dtype)}
                       for k, v in batch.items()},
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return out_dir


class ServingModel:
    """A loaded artifact: ``dets = serving_model(batch)``.

    The deserialized program is wrapped in one ``jax.jit`` so repeated
    calls reuse the compiled executable (the StableHLO is compiled once
    per process, exactly like a hand-built jit)."""

    def __init__(self, exported, variables, meta: dict):
        self.meta = meta
        self.variables = variables
        self._fn = jax.jit(exported.call)

    def check_batch(self, batch: dict):
        spec = self.meta["batch_spec"]
        missing = sorted(set(spec) - set(batch))
        if missing:
            raise ValueError(f"batch is missing keys {missing}; the "
                             f"artifact was exported with {sorted(spec)}")
        for k, s in spec.items():
            got = list(np.shape(batch[k]))
            if got != s["shape"]:
                raise ValueError(
                    f"batch[{k!r}] has shape {got}, artifact expects "
                    f"{s['shape']} (exported programs are fixed-shape; "
                    f"re-export for a different batch contract)")

    def __call__(self, batch: dict):
        self.check_batch(batch)
        return self._fn(self.variables, batch)


def load_artifact(artifact_dir: str) -> ServingModel:
    """Reload an :func:`export_inference` artifact. Needs only this module
    (jax + numpy) — no model zoo, flax, or config system."""
    from jax import export as jexport

    with open(os.path.join(artifact_dir, _PROGRAM), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(artifact_dir, _META)) as f:
        meta = json.load(f)
    npz = np.load(os.path.join(artifact_dir, _PARAMS))
    variables = _unflatten_tree({k: npz[k] for k in npz.files})
    return ServingModel(exported, variables, meta)

"""Config-driven CLI: train / inference from a hypes yaml.

TPU-first rework of ref opencood/tools/train.py:32-194 and
inference.py:40-227: ONE entry point builds dataset + batcher + model +
loss + anchors from the yaml (string-keyed registries instead of importlib
reflection, ref train_utils.py:113-182), trains with the fully-jitted step
(data-parallel over a jax Mesh when more than one device is visible),
checkpoints via orbax, and evaluates AP@0.3/0.5/0.7.

Usage:
  python -m coalign_tpu.tools.run train -y <hypes.yaml> [--model_dir out]
  python -m coalign_tpu.tools.run inference --model_dir out \
      [--fusion_method intermediate]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def build_all(params: dict, train: bool = True):
    """yaml params -> (base_dataset, batcher, model, loss_fn, anchor_spec)."""
    from coalign_tpu.data import build_dataset
    from coalign_tpu.loss import build_loss
    from coalign_tpu.models import build_model
    from coalign_tpu.postprocess.anchors import make_anchor_spec

    base, batcher = build_dataset(params, train=train)
    model = build_model(params["model"])
    loss_fn = build_loss(params["loss"])
    post = params["postprocess"]
    if post.get("core_method") == "BevPostprocessor":
        # anchor-free PIXOR family: dense label maps instead of an anchor
        # grid (ref bev_postprocessor.py)
        from coalign_tpu.ops.bev_raster import BevSpec
        from coalign_tpu.postprocess.dense_bev import DenseBevSpec
        spec = DenseBevSpec(
            bev=BevSpec.from_config(params["model"]["args"]
                                    ["geometry_param"]))
    else:
        spec = make_anchor_spec(post["anchor_args"], post["target_args"],
                                post.get("order", "hwl"))
    return base, batcher, model, loss_fn, spec


def postprocess_cfg(params: dict) -> dict:
    post = dict(params["postprocess"])
    post.setdefault("gt_range", params["preprocess"]["cav_lidar_range"])
    if "dir_args" in params.get("model", {}).get("args", {}):
        post.setdefault("dir_args", params["model"]["args"]["dir_args"])
    return post


def _backup_source(model_dir: str):
    """Snapshot the package source into the log dir (ref
    train_utils.py:16-27 backup_script) so every run is reproducible from
    its own directory. Stored as one zip to keep log dirs tidy."""
    import zipfile

    import coalign_tpu

    pkg = os.path.dirname(os.path.abspath(coalign_tpu.__file__))
    out = os.path.join(model_dir, "scripts_backup.zip")
    try:
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg):
                for name in files:
                    if name.endswith((".py", ".yaml", ".cpp")):
                        full = os.path.join(root, name)
                        zf.write(full, os.path.relpath(full,
                                                       os.path.dirname(pkg)))
    except OSError:  # backup must never block training
        pass


def cmd_train(opt):
    from coalign_tpu.config.yaml_utils import load_yaml, save_yaml
    from coalign_tpu.inference import evaluate
    from coalign_tpu.parallel import make_mesh
    from coalign_tpu.train import (build_optimizer, create_train_state,
                                   save_checkpoint, train_epochs)

    params = load_yaml(opt.hypes_yaml)
    if opt.root_dir:
        params["root_dir"] = opt.root_dir
    base, batcher, model, loss_fn, spec = build_all(params, train=True)
    tp = params["train_params"]

    model_dir = opt.model_dir or os.path.join(
        "logs", params.get("name", "exp"))
    os.makedirs(model_dir, exist_ok=True)
    save_yaml(params, os.path.join(model_dir, "config.yaml"))
    _backup_source(model_dir)

    batch0 = batcher.assemble([base[0]])
    tx = build_optimizer(params["optimizer"], params.get("lr_scheduler"),
                         max(1, len(base) // tp["batch_size"]))
    state = create_train_state(model, jax.tree.map(np.asarray, batch0), tx)
    # resume: continue from the latest checkpoint already in model_dir
    # (ref tools/train.py:55-75 load_saved_model at init_epoch)
    ckpts = sorted((d for d in os.listdir(model_dir)
                    if d.startswith("step_")),
                   key=lambda d: int(d.split("_")[1]))
    start_step = 0
    if ckpts:
        from coalign_tpu.train import load_checkpoint
        state = load_checkpoint(os.path.join(model_dir, ckpts[-1]), state)
        start_step = int(ckpts[-1].split("_")[1])
        print(json.dumps({"resumed_from": ckpts[-1]}))
    n_dev = len(jax.devices())
    mesh = (make_mesh(n_dev)
            if n_dev > 1 and tp["batch_size"] % n_dev == 0 else None)

    def log(m):
        print(json.dumps(m))

    # TensorBoard scalars next to the checkpoints (ref criterion.logging
    # -> tensorboardX writer in tools/train.py)
    from coalign_tpu.utils.tb_logging import make_tb_callback
    log, tb_close = make_tb_callback(os.path.join(model_dir, "tb"),
                                     inner=log)

    val_base = None
    if params.get("validate_dir") and os.path.exists(
            str(params["validate_dir"])):
        try:
            from coalign_tpu.data import build_dataset
            val_base, _ = build_dataset(
                dict(params, root_dir=params["validate_dir"]), train=False)
        except Exception:
            val_base = None  # missing/partial validation split

    state, history = train_epochs(
        model, loss_fn, spec, state, batcher, base,
        epochs=opt.epochs or tp["epoches"], batch_size=tp["batch_size"],
        ckpt_dir=model_dir, save_freq=tp.get("save_freq", 0), mesh=mesh,
        callback=log, val_dataset=val_base,
        eval_freq=tp.get("eval_freq", 0), start_step=start_step)
    tb_close()
    path = save_checkpoint(state, model_dir,
                           step=start_step + max(len(history), 1))
    print(f"saved {path}")

    # end-of-train eval follows the config's fusion protocol (ref
    # train.py:187-194 spawns inference.py with the matching fusion flag)
    fusion_kind = params.get("fusion", {}).get("core_method",
                                               "intermediate")
    method = fusion_kind if fusion_kind in ("late", "early") \
        else "intermediate"
    res = evaluate(model,
                   {"params": state.params,
                    "batch_stats": state.batch_stats},
                   batcher, base, getattr(spec, "anchors", spec), postprocess_cfg(params),
                   max_frames=opt.eval_frames, fusion_method=method)
    print(json.dumps({"eval": res}))
    return state, res


def _load_model_dir(opt, params_hook=None):
    """model_dir (flax orbax run OR a reference torch run) ->
    (params, base, batcher, model, spec, state). Shared by inference,
    export, noise_sweep and pose_graph_eval.

    params_hook(params) -> params lets a caller rewrite the config (e.g.
    force a noise_setting) before the dataset/model are built."""
    from coalign_tpu.config.yaml_utils import load_yaml
    from coalign_tpu.train import (build_optimizer, create_train_state,
                                   load_checkpoint)

    params = load_yaml(os.path.join(opt.model_dir, "config.yaml"))
    if opt.root_dir:
        # eval-time dataset override: build_dataset(train=False) reads
        # validate_dir first, so point both at the requested root
        params["root_dir"] = opt.root_dir
        params["validate_dir"] = opt.root_dir
    if params_hook is not None:
        params = params_hook(params)
    # prefer the bestval slot, else the numerically-latest epoch snapshot
    # (ref train_utils.py:29-74 load_saved_model; note lexicographic sort
    # would pick step_9 over step_10)
    ckpts = sorted((d for d in os.listdir(opt.model_dir)
                    if d.startswith("step_")),
                   key=lambda d: int(d.split("_")[1]))
    if os.path.isdir(os.path.join(opt.model_dir, "bestval")):
        ckpts.append("bestval")
    pths = sorted(f for f in os.listdir(opt.model_dir)
                  if f.endswith(".pth"))
    if pths and not ckpts:
        # reference checkpoints were trained with torch PFN semantics:
        # pad slots participate in the pillar max (see PillarEncoder)
        params["model"]["args"].setdefault("pillar_vfe", {})
        params["model"]["args"]["pillar_vfe"]["pad_parity"] = True
    base, batcher, model, _, spec = build_all(params, train=False)
    batch0 = batcher.assemble([base[0]])
    tx = build_optimizer(params["optimizer"], None)
    state = create_train_state(model, jax.tree.map(np.asarray, batch0),
                               tx)
    if ckpts:
        state = load_checkpoint(os.path.join(opt.model_dir, ckpts[-1]),
                                state)
        print(json.dumps({"loaded_checkpoint": ckpts[-1]}))
    elif pths:
        # a reference (opencood torch) model dir: import net_epoch*.pth
        # directly (ref tools/train_utils.py:29-74 load_saved_model).
        # Prefer the bestval slot like the reference does.
        from coalign_tpu.utils.ckpt_import import load_reference_checkpoint
        best = [f for f in pths if "bestval" in f]
        path = os.path.join(opt.model_dir, (best or pths)[-1])
        variables = load_reference_checkpoint(
            path, {"params": state.params,
                   "batch_stats": state.batch_stats})
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        print(json.dumps({"imported_reference_checkpoint": path}))
    return params, base, batcher, model, spec, state


def _left_hand(params: dict) -> bool:
    """CARLA-derived datasets (OPV2V/V2XSet) are left-hand coordinate, so
    saved renders flip y (ref tools/inference.py:80 keys on the test_dir
    path; DAIR-V2X / V2X-Sim stay right-hand)."""
    dirs = " ".join(str(params.get(k, "")) for k in
                    ("validate_dir", "root_dir", "test_dir"))
    return ("OPV2V" in dirs.upper()) or ("V2XSET" in dirs.upper())


def _box_align_hook(params: dict):
    """Offline CoAlign pass 2 for eval: when the config's ``box_align``
    block points at an existing precalc ``stage1_boxes.json`` (ref
    pointpillar_coalign.yaml:34-44 + intermediate_fusion_dataset.py:
    301-328), return a batch hook that pose-graph-corrects each batch's
    noisy poses before inference. Returns None when not configured."""
    ba = params.get("box_align") or {}
    path = ba.get("val_result") or ba.get("test_result")
    if not path or not os.path.exists(str(path)):
        return None
    from coalign_tpu.posegraph.box_align import BoxAlignConfig
    from coalign_tpu.tools.stage1 import (correct_batch_poses_from_json,
                                          load_stage1_json)

    content = load_stage1_json(str(path))
    cfg = BoxAlignConfig.from_yaml(ba.get("args", {}))

    def hook(batch, frame_ids):
        return correct_batch_poses_from_json(batch, content, frame_ids,
                                             cfg)

    print(json.dumps({"box_align_json": str(path)}))
    return hook


def _heter_selector(params: dict):
    """AgentSelector for heterogeneous configs (yaml ``heter`` block, ref
    heter_utils.py) — eval then dumps per-CAV marker boxes + the
    lidar/camera record next to the detections (ref inference.py:195)."""
    heter = params.get("heter")
    if not heter:
        return None
    from coalign_tpu.utils.heter import AgentSelector
    return AgentSelector(
        lidar_ratio=float(heter.get("lidar_ratio", 0.5)),
        ego_modality=heter.get("ego_modality", "lidar"),
        seed=int(heter.get("seed", 303)))


def cmd_inference(opt):
    import contextlib

    from coalign_tpu.inference import evaluate

    params, base, batcher, model, spec, state = _load_model_dir(opt)
    if not opt.fusion_method:
        # default from the trained config: a late/early run must be
        # decoded with its own protocol (the anchor-map decode crashes on
        # a late model's per-agent outputs)
        kind = params.get("fusion", {}).get("core_method", "intermediate")
        opt.fusion_method = kind if kind in ("late", "early") \
            else "intermediate"
        print(json.dumps({"fusion_method": opt.fusion_method}))
    trace = contextlib.nullcontext()
    if getattr(opt, "profile", None):
        # device trace (XProf/TensorBoard) around the whole eval loop —
        # SURVEY §5: profiling is a green field vs the reference
        from coalign_tpu.utils.profiling import device_trace
        trace = device_trace(opt.profile)
    # ref tools/inference.py --save_npy / save_vis_interval workflow
    npy_dir = (os.path.join(opt.model_dir, "npy")
               if getattr(opt, "save_npy", False) else None)
    vis_dir = (os.path.join(opt.model_dir, "vis")
               if getattr(opt, "save_vis", False) else None)
    with trace:
        res = evaluate(model,
                       {"params": state.params,
                        "batch_stats": state.batch_stats},
                       batcher, base, getattr(spec, "anchors", spec),
                       postprocess_cfg(params),
                       fusion_method=opt.fusion_method,
                       max_frames=opt.eval_frames,
                       npy_dir=npy_dir, vis_dir=vis_dir,
                       vis_interval=getattr(opt, "save_vis_interval", 40),
                       batch_hook=_box_align_hook(params),
                       left_hand=_left_hand(params),
                       heter_selector=_heter_selector(params))
    print(json.dumps({"eval": res}))
    from coalign_tpu.config.yaml_utils import save_yaml
    save_yaml(res, os.path.join(
        opt.model_dir, f"eval_{opt.fusion_method}.yaml"))
    return res


def cmd_export(opt):
    """Write a self-contained serving artifact (StableHLO program +
    params + batch contract) for the model_dir's checkpoint — see
    coalign_tpu/serving.py. The batch shapes are taken from one assembled
    dataset batch (exported programs are fixed-shape by design)."""
    from coalign_tpu.serving import export_inference

    params, base, batcher, model, spec, state = _load_model_dir(opt)
    batch0 = jax.tree.map(np.asarray, batcher.assemble([base[0]]))
    out = opt.output or os.path.join(opt.model_dir, "serving_artifact")
    platforms = tuple((opt.platforms or "cpu,tpu").split(","))
    export_inference(model,
                     {"params": state.params,
                      "batch_stats": state.batch_stats},
                     batch0, getattr(spec, "anchors", spec), postprocess_cfg(params), out,
                     platforms=platforms)
    print(json.dumps({"artifact": out, "platforms": list(platforms)}))
    return out


def cmd_precalc(opt):
    """CoAlign stage-1 precompute (ref tools/pose_graph_pre_calc.py:36-150):
    run a frozen per-agent uncertainty detector over the train/val/test
    splits and dump a ``stage1_boxes.json`` per split (consumed online by
    tools/stage1.correct_batch_poses, or offline like the reference's
    intermediate_fusion_dataset.py:301-328 box_align hook)."""
    import jax.numpy as jnp

    from coalign_tpu.config.yaml_utils import load_yaml
    from coalign_tpu.data import build_dataset
    from coalign_tpu.models import build_model
    from coalign_tpu.postprocess.anchors import make_anchor_spec
    from coalign_tpu.tools.stage1 import dump_stage1_json, make_stage1_fn
    from coalign_tpu.train import (build_optimizer, create_train_state,
                                   load_checkpoint)

    params = load_yaml(opt.hypes_yaml)
    pc = params["box_align_pre_calc"]
    model = build_model({"core_method": pc["stage1_model"],
                         "args": pc["stage1_model_config"]})
    post = params["postprocess"]
    spec = make_anchor_spec(post["anchor_args"], post["target_args"],
                            post.get("order", "hwl"))
    stage1 = make_stage1_fn(model, getattr(spec, "anchors", spec), postprocess_cfg(params),
                            max_boxes=int(pc.get("max_boxes", 24)))

    out_dir = opt.model_dir or pc.get("output_save_path", "precalc_out")
    splits = [("train", params.get("root_dir")),
              ("val", params.get("validate_dir")),
              ("test", params.get("test_dir"))]
    state = None
    written = []
    for split, root in splits:
        if not root or not os.path.exists(str(root)):
            continue
        # build_dataset reads validate_dir when train=False: pin the split
        base, batcher = build_dataset(
            dict(params, root_dir=root, validate_dir=root), train=False)
        if state is None:
            batch0 = batcher.assemble([base[0]])
            tx = build_optimizer(params.get(
                "optimizer", {"core_method": "Adam", "lr": 1e-3}), None)
            state = create_train_state(
                model, {k: np.asarray(v) for k, v in batch0.items()}, tx)
            ckpt = pc.get("stage1_model_path") or ""
            if ckpt and os.path.exists(ckpt):
                if os.path.isdir(ckpt) and not os.path.basename(
                        ckpt).startswith("step_"):
                    steps = sorted((d for d in os.listdir(ckpt)
                                    if d.startswith("step_")),
                                   key=lambda d: int(d.split("_")[1]))
                    if steps:
                        ckpt = os.path.join(ckpt, steps[-1])
                state = load_checkpoint(ckpt, state)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        dets, ids = [], []
        bs = int(pc.get("batch_size", 4))
        for start in range(0, len(base), bs):
            idxs = list(range(start, min(start + bs, len(base))))
            batch = batcher.assemble([base[i] for i in idxs])
            d = stage1(variables, {k: jnp.asarray(v)
                                   for k, v in batch.items()})
            dets.append({k: np.asarray(v) for k, v in d.items()})
            ids.extend(idxs)
        merged = {k: np.concatenate([d[k] for d in dets], axis=0)
                  for k in dets[0]}
        split_dir = os.path.join(out_dir, split)
        os.makedirs(split_dir, exist_ok=True)
        path = os.path.join(split_dir, "stage1_boxes.json")
        dump_stage1_json(merged, ids, path)
        written.append(path)
        print(json.dumps({"split": split, "frames": len(ids),
                          "json": path}))
    return written


def cmd_config_generate(opt):
    """Expand a yaml through its parser and re-dump
    (ref tools/config_generate.py:9-23)."""
    from coalign_tpu.config.yaml_utils import load_yaml, save_yaml

    params = load_yaml(opt.hypes_yaml)
    out = opt.output or opt.hypes_yaml.replace(".yaml", "_full.yaml")
    save_yaml(params, out)
    print(out)


def _apply_bf16(opt):
    if getattr(opt, "bf16", False):
        import jax.numpy as jnp

        from coalign_tpu.models.layers import set_compute_dtype

        # MXU-native conv/matmul dtype; params, BN stats and geometry stay
        # f32 (ref train.py --half is the torch fp16 counterpart)
        set_compute_dtype(jnp.bfloat16)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("train", "inference", "config_generate", "precalc",
                 "export"):
        s = sub.add_parser(name)
        s.add_argument("-y", "--hypes_yaml", default=None)
        s.add_argument("--model_dir", default=None)
        s.add_argument("--root_dir", default=None,
                       help="override dataset root")
        s.add_argument("--fusion_method", default=None,
                       help="late/early/intermediate/no/no_w_uncertainty/"
                            "single; defaults to the config's fusion kind")
        s.add_argument("--epochs", type=int, default=None)
        s.add_argument("--eval_frames", type=int, default=None)
        s.add_argument("--output", default=None)
        s.add_argument("--platforms", default=None,
                       help="export lowering targets, e.g. 'cpu,tpu'")
        s.add_argument("--profile", default=None,
                       help="write a jax.profiler device trace (XProf/"
                            "TensorBoard logdir) around inference")
        s.add_argument("--save_npy", action="store_true",
                       help="dump per-frame pred/gt arrays to "
                            "<model_dir>/npy (ref inference_utils.py:176)")
        s.add_argument("--save_vis", action="store_true",
                       help="save BEV detection renderings to "
                            "<model_dir>/vis every save_vis_interval "
                            "frames (ref inference.py:199-223)")
        s.add_argument("--save_vis_interval", type=int, default=40)
        s.add_argument("--bf16", action="store_true",
                       help="bfloat16 compute policy for convs/matmuls "
                            "(ref train.py --half; params stay f32)")
    opt = p.parse_args(argv)
    _apply_bf16(opt)
    if opt.cmd == "train":
        return cmd_train(opt)
    if opt.cmd == "inference":
        return cmd_inference(opt)
    if opt.cmd == "precalc":
        return cmd_precalc(opt)
    if opt.cmd == "export":
        return cmd_export(opt)
    return cmd_config_generate(opt)


if __name__ == "__main__":
    main()

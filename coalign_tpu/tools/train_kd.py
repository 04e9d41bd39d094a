"""DiscoNet knowledge-distillation training.

TPU-first rework of ref opencood/tools/train_w_kd.py:32-112: a frozen
early-fusion teacher runs alongside the student inside ONE jitted step —
the teacher forward, the student forward, the KD loss and the update all
compile into a single XLA program (the reference runs two separate module
calls with torch.no_grad on the teacher).
"""

from __future__ import annotations

from functools import partial

import jax

from coalign_tpu.postprocess.anchors import AnchorSpec, assign_targets
from coalign_tpu.train import TrainState


def make_kd_train_step(student, teacher, teacher_variables, loss_fn,
                       anchor_spec: AnchorSpec):
    """Returns a jitted (state, batch) -> (state, metrics) KD step.

    ``teacher_variables`` are frozen (closed over as constants); the loss_fn
    must be a DiscoNetLoss consuming the merged student+teacher outputs.
    """

    def step(state: TrainState, batch: dict):
        labels = jax.vmap(partial(assign_targets, spec=anchor_spec))(
            batch["gt_boxes"], batch["gt_mask"])
        t_out = teacher.apply(teacher_variables, batch, train=False)
        t_out = jax.lax.stop_gradient(t_out)

        def loss_of(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"])
            out = dict(out, **t_out)
            total, metrics = loss_fn(out, labels)
            return total, (metrics, mutated["batch_stats"])

        grads, (metrics, new_stats) = jax.grad(
            loss_of, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,))


def main(argv=None):
    """CLI mirroring ref tools/train_w_kd.py:32-112: train a DiscoNet
    student against a frozen early-fusion teacher (same model args,
    ``point_pillar_disconet_teacher``), optionally warm-starting the
    teacher from a checkpoint dir."""
    import argparse
    import json
    import os

    import numpy as np

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-y", "--hypes_yaml", required=True)
    p.add_argument("--model_dir", default=None)
    p.add_argument("--teacher_dir", default=None,
                   help="optional dir with step_* checkpoints for the "
                        "frozen teacher")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--root_dir", default=None)
    opt = p.parse_args(argv)

    from coalign_tpu.config.yaml_utils import load_yaml, save_yaml
    from coalign_tpu.data import build_dataset
    from coalign_tpu.data.batch import KDFusionBatcher
    from coalign_tpu.data.prefetch import prefetch
    from coalign_tpu.loss import build_loss
    from coalign_tpu.models import build_model
    from coalign_tpu.postprocess.anchors import make_anchor_spec
    from coalign_tpu.train import (build_optimizer, create_train_state,
                                   load_checkpoint, save_checkpoint)

    params = load_yaml(opt.hypes_yaml)
    if opt.root_dir:
        params["root_dir"] = opt.root_dir
    base, inter = build_dataset(params, train=True)
    # KD needs the merged-cloud teacher view alongside the student batch;
    # keep the augmentor/seed build_dataset wired into the base batcher
    # (ref tools/train_w_kd.py trains with the normal augmented pipeline)
    batcher = KDFusionBatcher(
        max_cav=params["train_params"].get("max_cav", 5),
        max_points=inter.max_points, max_objects=inter.max_objects,
        lidar_range=params["preprocess"]["cav_lidar_range"],
        comm_range=params.get("comm_range", 70.0),
        pos_std=inter.pos_std, rot_std=inter.rot_std,
        augmentor=getattr(inter, "augmentor", None), train=True)

    margs = params["model"]["args"]
    student = build_model({"core_method": "point_pillar_disconet",
                           "args": margs})
    # a reference torch teacher checkpoint trains with torch PFN
    # semantics (pad slots in the pillar max) — mirror cmd_inference
    teacher_pths = sorted(
        f for f in (os.listdir(opt.teacher_dir) if opt.teacher_dir else [])
        if f.endswith(".pth"))
    t_margs = margs
    if teacher_pths:
        t_margs = dict(margs, pillar_vfe=dict(
            margs.get("pillar_vfe", {}), pad_parity=True))
    teacher = build_model({"core_method": "point_pillar_disconet_teacher",
                           "args": t_margs})
    loss_fn = build_loss(params["loss"])
    post = params["postprocess"]
    spec = make_anchor_spec(post["anchor_args"], post["target_args"],
                            post.get("order", "hwl"))

    tp = params["train_params"]
    batch0 = batcher.assemble([base[0]])
    batch0 = {k: np.asarray(v) for k, v in batch0.items()}
    import jax

    t_vars = jax.jit(lambda k, b: teacher.init(k, b, train=False))(
        jax.random.PRNGKey(1), batch0)
    if opt.teacher_dir:
        ckpts = sorted((d for d in os.listdir(opt.teacher_dir)
                        if d.startswith("step_")),
                       key=lambda d: int(d.split("_")[1]))
        if ckpts:
            tx_t = build_optimizer({"core_method": "Adam", "lr": 1e-3},
                                   None)
            t_state = create_train_state(teacher, batch0, tx_t)
            t_state = load_checkpoint(
                os.path.join(opt.teacher_dir, ckpts[-1]), t_state)
            t_vars = {"params": t_state.params,
                      "batch_stats": t_state.batch_stats}
        elif teacher_pths:
            # reference torch teacher (ref tools/train_w_kd.py loads a
            # frozen early-fusion teacher net_epoch*.pth)
            import json

            from coalign_tpu.utils.ckpt_import import (
                load_reference_checkpoint)
            best = [f for f in teacher_pths if "bestval" in f]
            t_path = os.path.join(opt.teacher_dir,
                                  (best or teacher_pths)[-1])
            t_vars = load_reference_checkpoint(t_path, t_vars)
            print(json.dumps({"imported_reference_teacher": t_path}))

    tx = build_optimizer(params["optimizer"], params.get("lr_scheduler"),
                         max(1, len(base) // tp["batch_size"]))
    state = create_train_state(student, batch0, tx)
    step_fn = make_kd_train_step(student, teacher, t_vars, loss_fn, spec)

    model_dir = opt.model_dir or os.path.join(
        "logs", params.get("name", "kd"))
    os.makedirs(model_dir, exist_ok=True)
    save_yaml(params, os.path.join(model_dir, "config.yaml"))
    history = []
    for epoch in range(opt.epochs or tp["epoches"]):
        metrics = None
        for batch in prefetch(batcher.batches(base, tp["batch_size"]),
                              size=2):
            state, metrics = step_fn(state, batch)
        if metrics is None:  # dataset smaller than one batch (drop_last)
            print(json.dumps({"epoch": epoch, "batches": 0}))
            continue
        m = {k: float(v) for k, v in metrics.items()}
        m["epoch"] = epoch
        history.append(m)
        print(json.dumps(m))
    save_checkpoint(state, model_dir, step=len(history))
    return state, history


if __name__ == "__main__":
    main()

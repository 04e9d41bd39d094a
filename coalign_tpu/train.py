"""Training loop: optax + orbax, fully jitted step, mesh data parallelism.

TPU-first rework of opencood/tools/train.py:32-194 / train_ddp.py. The whole
step (label assignment -> forward -> loss -> grads -> update) is ONE jitted
program; labels are generated on device from padded gt boxes, so the host
only feeds raw padded points.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from coalign_tpu.postprocess.anchors import AnchorSpec, assign_targets


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def build_optimizer(opt_cfg: dict, sched_cfg: dict | None,
                    steps_per_epoch: int = 1000):
    """Adam + step/multistep/exponential schedule from the yaml
    ``optimizer`` / ``lr_scheduler`` subtrees — the reference's three
    scheduler kinds (ref train_utils.py:209-246: StepLR, MultiStepLR,
    ExponentialLR; all step once per epoch)."""
    lr = opt_cfg.get("lr", 1e-3)
    if sched_cfg:
        method = sched_cfg.get("core_method", "multistep")
        if method == "multistep":
            gamma = sched_cfg.get("gamma", 0.1)
            bounds = {int(e) * steps_per_epoch: gamma
                      for e in sched_cfg.get("step_size", [])}
            schedule = optax.piecewise_constant_schedule(lr, bounds)
        elif method == "step":
            # StepLR: decay by gamma every step_size EPOCHS
            schedule = optax.exponential_decay(
                lr, int(sched_cfg.get("step_size", 1)) * steps_per_epoch,
                sched_cfg.get("gamma", 0.1), staircase=True)
        elif method == "exponential":
            # ExponentialLR steps once per epoch -> staircase
            schedule = optax.exponential_decay(
                lr, steps_per_epoch, sched_cfg.get("gamma", 0.98),
                staircase=True)
        else:
            schedule = lr
    else:
        schedule = lr
    wd = float(opt_cfg.get("args", {}).get("weight_decay", 0.0))
    eps = float(opt_cfg.get("args", {}).get("eps", 1e-8))
    if wd:
        return optax.adamw(schedule, eps=eps, weight_decay=wd)
    return optax.adam(schedule, eps=eps)


def create_train_state(model, batch, tx, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # jit the init: eager init dispatches one (remote, on TPU) compile per
    # op; as one compiled program it is ~25x faster on large models and
    # hits the persistent compilation cache on reruns
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rng,
                                                                    batch)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def make_train_step(model, loss_fn, anchor_spec: AnchorSpec,
                    donate: bool = True, remat: str | None = None):
    """Returns a jitted (state, batch) -> (state, metrics) step.

    donate=False keeps the input state buffers alive (needed when the same
    state is fed repeatedly, e.g. profiling loops — examples/trace_step.py).

    remat trades recompute for activation bytes on the byte-bound step
    (the v5e train program moves >60 GB/step by XLA's buffer count):
      None    store every forward intermediate (plain autodiff)
      'dots'  save matmul/conv outputs, recompute elementwise chains
              (jax.checkpoint_policies.checkpoint_dots)
      'full'  save only the forward inputs, recompute the whole forward
    Raced on the real v5e (B=4 OPV2V, 2026-08-20): both LOSE — 20.75
    (none) vs 16.13 ('dots') vs 15.07 ('full') frames/s, XLA-counted
    bytes RISING 104.6 -> 129.9 -> 139.1 GB/step: the step's bytes are
    canvas gathers/scatters/layout copies, which remat re-EXECUTES rather
    than avoids. Kept as a tested-and-rejected reference point and for
    memory-limited configs ('full' cuts live activation memory)."""

    from coalign_tpu.postprocess.dense_bev import (DenseBevSpec,
                                                   assign_dense_targets)

    def step(state: TrainState, batch: dict):
        if isinstance(anchor_spec, DenseBevSpec):
            # anchor-free PIXOR family: dense (H, W, 7) label maps
            # (ref bev_postprocessor.py generate_label)
            labels = {"label_map": jax.vmap(
                partial(assign_dense_targets, spec=anchor_spec))(
                batch["gt_boxes"], batch["gt_mask"])}
        else:
            labels = jax.vmap(partial(assign_targets, spec=anchor_spec))(
                batch["gt_boxes"], batch["gt_mask"])
        if getattr(loss_fn, "wants_single_labels", False):
            # per-agent stage-1 / supervise_single labels (ref
            # train.py:119-121 second loss pass with suffix "_single"):
            # flattened to (B*L, ...) matching the *_single output rows
            from coalign_tpu.postprocess.anchors import (
                assign_targets_per_agent)
            singles = jax.vmap(partial(assign_targets_per_agent,
                                       spec=anchor_spec))(
                batch["gt_boxes"], batch["gt_mask"],
                batch["lidar_pose_clean"], batch["agent_mask"])
            labels.update({
                k + "_single": v.reshape((-1,) + v.shape[2:])
                for k, v in singles.items()})

        def fwd(params, batch):
            return state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"])

        if remat == "full":
            fwd = jax.checkpoint(fwd)
        elif remat == "dots":
            fwd = jax.checkpoint(
                fwd, policy=jax.checkpoint_policies.checkpoint_dots)
        elif remat is not None:
            raise ValueError(f"unknown remat policy: {remat!r}")

        def loss_of(params):
            out, mutated = fwd(params, batch)
            total, metrics = loss_fn(out, labels)
            return total, (metrics, mutated["batch_stats"])

        grads, (metrics, new_stats) = jax.grad(
            loss_of, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def save_checkpoint(state: TrainState, ckpt_dir: str, step=0):
    """step: int for periodic snapshots; the string 'bestval' mirrors the
    reference's net_epoch_bestval_at%d.pth slot (ref train.py:153-168)."""
    import orbax.checkpoint as ocp

    name = step if isinstance(step, str) else f"step_{step}"
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params,
                      "batch_stats": state.batch_stats}, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {"params": state.params, "batch_stats": state.batch_stats}
    restored = ckptr.restore(os.path.abspath(path), target)
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"])


def validate(model, loss_fn, anchor_spec, state, batcher, dataset,
             batch_size: int, max_batches: int | None = None):
    """Mean validation loss (ref train.py:129-150 validation pass)."""
    labels_fn = jax.vmap(partial(assign_targets, spec=anchor_spec))

    @jax.jit
    def val_loss(params, batch_stats, batch):
        labels = labels_fn(batch["gt_boxes"], batch["gt_mask"])
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch, train=False)
        total, _ = loss_fn(out, labels)
        return total

    losses = []
    for i, batch in enumerate(batcher.batches(dataset, batch_size,
                                              shuffle=False,
                                              drop_last=False)):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        losses.append(float(val_loss(state.params, state.batch_stats,
                                     batch)))
        if max_batches and i + 1 >= max_batches:
            break
    return sum(losses) / max(len(losses), 1)


def train_epochs(model, loss_fn, anchor_spec, state, batcher, dataset,
                 *, epochs: int, batch_size: int, log_every: int = 10,
                 ckpt_dir: str | None = None, save_freq: int = 0,
                 mesh=None, callback=None, val_dataset=None,
                 eval_freq: int = 0, start_step: int = 0):
    """Epoch loop with periodic validation + bestval checkpoint
    (ref train.py:102-171: save_freq snapshots, eval_freq validation,
    bestval tracking at :153-168; DDP scaffolding replaced by the mesh).

    start_step offsets checkpoint numbering when resuming so snapshots
    never collide with an earlier run's."""
    from coalign_tpu.data.prefetch import prefetch

    step_fn = make_train_step(model, loss_fn, anchor_spec)
    history = []
    step = start_step
    best_val = float("inf")
    for epoch in range(epochs):
        t0 = time.time()
        # assemble + H2D copy of the NEXT batches overlap this step's
        # device execution (ref train.py:42 num_workers=4 DataLoader)
        for batch in prefetch(batcher.batches(dataset, batch_size),
                              size=2, mesh=mesh):
            state, metrics = step_fn(state, batch)
            step += 1
            if step % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(epoch=epoch, step=step)
                history.append(m)
                if callback:
                    callback(m)
        if (val_dataset is not None and eval_freq
                and (epoch + 1) % eval_freq == 0):
            vl = validate(model, loss_fn, anchor_spec, state, batcher,
                          val_dataset, batch_size)
            history.append({"epoch": epoch, "step": step, "val_loss": vl})
            if callback:
                callback(history[-1])
            if vl < best_val and ckpt_dir:
                best_val = vl
                save_checkpoint(state, ckpt_dir, step="bestval")
        if ckpt_dir and save_freq and (epoch + 1) % save_freq == 0:
            save_checkpoint(state, ckpt_dir, step)
        _ = time.time() - t0
    return state, history

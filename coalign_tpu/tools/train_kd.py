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

"""Stage-wise training masks for the robust V2VNet curriculum.

The reference freezes/unfreezes module parameters in-place per stage
(ref point_pillar_v2vnet_robust.py:81-139 backbone_fix/unfix). In a
functional JAX stack the same curriculum is an optax parameter mask:
  stage 0: train everything EXCEPT the pose/attention nets (plain V2VNet)
  stage 1: train ONLY the pose regression + attention nets
  stage 2: train everything jointly
"""

from __future__ import annotations

import optax

ROBUST_KEYS = ("pose_regression", "attention", "alpha")


def _is_robust_path(path) -> bool:
    return any(any(k in str(p) for k in ROBUST_KEYS) for p in path)


def stage_param_labels(params, stage: int):
    """Pytree of 'train'/'freeze' labels for optax.multi_transform."""
    import jax

    def label(path, _):
        robust = _is_robust_path(path)
        if stage == 0:
            return "freeze" if robust else "train"
        if stage == 1:
            return "train" if robust else "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def staged_optimizer(tx, params, stage: int):
    """Wrap an optax transform so only the stage's params update."""
    labels = stage_param_labels(params, stage)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)

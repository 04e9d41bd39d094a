"""End-to-end: train a tiny CoAlign model on synthetic scenes until it
detects the planted boxes, then evaluate AP — the framework's equivalent of
the reference's inference.py-as-test protocol (SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
from coalign_tpu.inference import evaluate
from coalign_tpu.loss import build_loss
from coalign_tpu.models import build_model
from coalign_tpu.postprocess.anchors import make_anchor_spec
from coalign_tpu.train import (build_optimizer, create_train_state,
                               make_train_step, train_epochs)

LIDAR_RANGE = [-16.0, -16.0, -3.0, 16.0, 16.0, 1.0]
VOXEL = [0.5, 0.5, 4.0]

MODEL_ARGS = {
    "voxel_size": VOXEL,
    "lidar_range": LIDAR_RANGE,
    "anchor_number": 2,
    "pillar_vfe": {"use_norm": True, "with_distance": False,
                   "use_absolute_xyz": True, "num_filters": [32]},
    "point_pillar_scatter": {"num_features": 32},
    "base_bev_backbone": {
        "layer_nums": [2, 2],
        "layer_strides": [2, 2],
        "num_filters": [32, 64],
        "upsample_strides": [1, 2],
        "num_upsample_filter": [32, 32],
    },
    "fusion_method": "att",
    "att": {"feat_dim": [32, 64]},
    "shrink_header": {"kernal_size": [3], "stride": [1], "padding": [1],
                      "dim": [64], "input_dim": 64},
    "dir_args": {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]},
}

ANCHOR_ARGS = {
    "W": 64, "H": 64, "l": 4.2, "w": 1.8, "h": 1.6, "r": [0, 90],
    "vw": VOXEL[0], "vh": VOXEL[1], "feature_stride": 2,
    "cav_lidar_range": LIDAR_RANGE,
}
POSTPROCESS = {
    "anchor_args": ANCHOR_ARGS,
    "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                    "score_threshold": 0.25},
    "order": "hwl",
    "max_num": 100,
    "nms_thresh": 0.15,
    "gt_range": LIDAR_RANGE,
    "dir_args": {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]},
}
LOSS_ARGS = {
    "pos_cls_weight": 2.0,
    "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
    "reg": {"sigma": 3.0, "weight": 2.0},
    "dir": {"weight": 0.2,
            "args": {"dir_offset": 0.7853, "num_bins": 2,
                     "anchor_yaw": [0, 90]}},
}


def _setup():
    dataset = SyntheticScenes(num_frames=4, num_agents=2, num_objects=4,
                              lidar_range=LIDAR_RANGE, agent_spread=4.0,
                              points_per_object=220, ground_points=512,
                              object_spread=0.55, seed=7)
    batcher = IntermediateFusionBatcher(
        max_cav=2, max_points=2500, max_objects=16,
        lidar_range=LIDAR_RANGE, comm_range=70.0)
    model = build_model({"core_method": "point_pillar_baseline_multiscale",
                         "args": MODEL_ARGS})
    spec = make_anchor_spec(ANCHOR_ARGS, POSTPROCESS["target_args"], "hwl")
    loss_fn = build_loss(LOSS_ARGS)
    return dataset, batcher, model, spec, loss_fn


@pytest.mark.slow
def test_overfit_and_detect():
    dataset, batcher, model, spec, loss_fn = _setup()
    # overfit TWO frames (was four): same code paths at half the per-step
    # cost, and the easier fit supports far TIGHTER AP gates than the
    # round-1 advisor's 0.3 floor (measured ap50 1.0 / ap70 0.69 at 250
    # steps, lr 3e-3, seed 42)
    batch0 = batcher.assemble([dataset[i] for i in range(2)])
    batch0 = {k: jnp.asarray(v) for k, v in batch0.items()}
    tx = build_optimizer({"lr": 3e-3, "args": {"eps": 1e-10}}, None)
    state = create_train_state(model, batch0, tx, jax.random.PRNGKey(42))

    step_fn = make_train_step(model, loss_fn, spec)
    losses = []
    for i in range(250):
        state, metrics = step_fn(state, batch0)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0] * 0.05, f"loss did not drop: {losses[::50]}"

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    result = evaluate(model, variables, batcher, dataset,
                      spec.anchors, POSTPROCESS, batch_size=2, max_frames=2)
    assert result["frames"] == 2
    assert result["ap30"] > 0.8, f"AP too low after overfit: {result}"
    assert result["ap50"] > 0.6, f"AP too low after overfit: {result}"


def test_train_step_runs_on_mesh():
    """The same jitted step consumes a batch sharded over an 8-device mesh."""
    from coalign_tpu.parallel import make_mesh, replicate, shard_batch

    dataset, batcher, model, spec, loss_fn = _setup()
    batch = batcher.assemble([dataset[i % 4] for i in range(8)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tx = build_optimizer({"lr": 1e-3, "args": {}}, None)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, loss_fn, spec)

    # single-device reference
    _, m_single = step_fn(state, batch)

    mesh = make_mesh(8)
    state_r = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    state_r = state_r.replace(params=replicate(state_r.params, mesh),
                              batch_stats=replicate(state_r.batch_stats, mesh))
    sharded = shard_batch(batch, mesh)
    new_state, m_mesh = step_fn(state_r, sharded)
    assert len(jax.devices()) == 8
    np.testing.assert_allclose(float(m_single["total_loss"]),
                               float(m_mesh["total_loss"]), rtol=1e-4)


@pytest.mark.parametrize("policy", ["dots", "full"])
def test_train_step_remat_parity(policy):
    """remat trades recompute for activation bytes; it must not change the
    step's math — same loss and same updated params as plain autodiff."""
    import optax

    dataset, batcher, model, spec, loss_fn = _setup()
    batch = batcher.assemble([dataset[0]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    # SGD, not Adam: Adam's first step is sign-like (±lr), so a near-zero
    # grad element whose sign flips under remat's re-ordered bf16 rounding
    # would show as a full ±2lr param jump; under SGD the param delta is
    # proportional to the grad and the tolerance means what it says.
    tx = optax.sgd(1e-2)

    state0 = create_train_state(model, batch, tx, jax.random.PRNGKey(3))
    s_ref, m_ref = make_train_step(model, loss_fn, spec,
                                   donate=False)(state0, batch)

    state1 = create_train_state(model, batch, tx, jax.random.PRNGKey(3))
    s_rmt, m_rmt = make_train_step(model, loss_fn, spec, donate=False,
                                   remat=policy)(state1, batch)

    np.testing.assert_allclose(float(m_ref["total_loss"]),
                               float(m_rmt["total_loss"]), rtol=1e-5)
    ref_leaves = jax.tree_util.tree_leaves(s_ref.params)
    rmt_leaves = jax.tree_util.tree_leaves(s_rmt.params)
    for a, b in zip(ref_leaves, rmt_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)

"""Input pipeline: threaded prefetch preserves order/content, propagates
errors, and places batches with a mesh sharding."""

import numpy as np
import pytest

from coalign_tpu.data.prefetch import prefetch


def test_prefetch_order_and_content():
    batches = [{"x": np.full((4, 2), i)} for i in range(7)]
    out = list(prefetch(iter(batches), size=2, to_device=False))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b["x"], np.full((4, 2), i))


def test_prefetch_propagates_errors():
    def gen():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    it = prefetch(gen(), size=1, to_device=False)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_device_put_with_mesh():
    import jax

    from coalign_tpu.parallel import make_mesh

    mesh = make_mesh(len(jax.devices()))
    batches = [{"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
               for _ in range(3)]
    out = list(prefetch(iter(batches), size=2, mesh=mesh))
    assert len(out) == 3
    x = out[0]["x"]
    assert isinstance(x, jax.Array)
    # leading dim sharded over the data axis
    assert len(x.sharding.device_set) == len(jax.devices())
    np.testing.assert_array_equal(np.asarray(x), batches[0]["x"])


def test_train_epochs_uses_prefetch_end_to_end():
    """One tiny epoch through train_epochs still converges shape-wise."""
    import jax.numpy as jnp

    from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
    from coalign_tpu.loss import build_loss
    from coalign_tpu.models import build_model
    from coalign_tpu.postprocess.anchors import make_anchor_spec
    from coalign_tpu.train import (build_optimizer, create_train_state,
                                   train_epochs)

    lr = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]
    args = {
        "voxel_size": [0.4, 0.4, 4], "lidar_range": lr, "anchor_number": 2,
        "pillar_vfe": {"use_norm": True, "with_distance": False,
                       "use_absolute_xyz": True, "num_filters": [16]},
        "point_pillar_scatter": {"num_features": 16},
        "base_bev_backbone": {"layer_nums": [1], "layer_strides": [2],
                              "num_filters": [16],
                              "upsample_strides": [1],
                              "num_upsample_filter": [16]},
        "fusion_method": "max",
    }
    model = build_model({"core_method": "point_pillar_baseline_multiscale",
                         "args": args})
    loss_fn = build_loss({"core_method": "point_pillar_loss",
                          "args": {"pos_cls_weight": 2.0,
                                   "cls": {"alpha": 0.25, "gamma": 2.0,
                                           "weight": 1.0},
                                   "reg": {"sigma": 3.0, "weight": 2.0}}})
    spec = make_anchor_spec(
        {"cav_lidar_range": lr, "l": 3.9, "w": 1.6, "h": 1.56,
         "r": [0, 90], "feature_stride": 2, "num": 2,
         "W": 64, "H": 64, "vw": 0.4, "vh": 0.4},
        {"pos_threshold": 0.6, "neg_threshold": 0.45,
         "score_threshold": 0.2}, "hwl")
    ds = SyntheticScenes(num_frames=4, num_agents=2, num_objects=2,
                         lidar_range=lr, points_per_object=16,
                         ground_points=32, seed=11)
    batcher = IntermediateFusionBatcher(max_cav=2, max_points=512,
                                        max_objects=8, lidar_range=lr)
    batch0 = batcher.assemble([ds[0], ds[1]])
    tx = build_optimizer({"core_method": "Adam", "lr": 1e-3}, None)
    state = create_train_state(
        model, {k: np.asarray(v) for k, v in batch0.items()}, tx)
    state, history = train_epochs(
        model, loss_fn, spec, state, batcher, ds,
        epochs=1, batch_size=2, log_every=1)
    assert history and np.isfinite(history[-1]["total_loss"])


def test_prefetch_abandoned_generator_stops_worker():
    """Consumer breaking out early must not leak the worker thread on a
    full queue (evaluate() max_frames / noise_sweep break mid-epoch)."""
    import threading
    import time

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield {"x": np.full((2,), i)}

    it = prefetch(gen(), size=1, to_device=False)
    next(it)
    it.close()  # GeneratorExit -> finally must retire the worker
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(t.name == "coalign-prefetch" and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.05)
    assert not any(t.name == "coalign-prefetch" and t.is_alive()
                   for t in threading.enumerate())
    assert len(produced) < 1000  # worker stopped early, didn't drain source

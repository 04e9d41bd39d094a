"""Input pipeline: threaded prefetch preserves order/content, propagates
errors, and places batches with a mesh sharding."""

import numpy as np
import pytest

from coalign_tpu.data.prefetch import prefetch, prefetch_batches


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


def test_prefetch_batches_pool_matches_serial():
    """The 4-worker pool yields the same batches in the same order as the
    serial batches() path, and partial tails obey drop_last."""
    from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes

    lr = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]
    ds = SyntheticScenes(num_frames=5, num_agents=2, num_objects=2,
                         lidar_range=lr, points_per_object=16,
                         ground_points=32, seed=3)
    batcher = IntermediateFusionBatcher(max_cav=2, max_points=512,
                                        max_objects=8, lidar_range=lr)
    serial = list(batcher.batches(ds, 2, shuffle=False, drop_last=False))
    pooled = list(prefetch_batches(batcher, ds, 2, workers=4, size=3,
                                   to_device=False, shuffle=False,
                                   drop_last=False))
    assert len(pooled) == len(serial) == 3  # 2+2+1
    for s, p in zip(serial, pooled):
        for k in s:
            np.testing.assert_array_equal(np.asarray(s[k]),
                                          np.asarray(p[k]), err_msg=k)
    assert len(list(prefetch_batches(batcher, ds, 2, workers=2,
                                     to_device=False, shuffle=False,
                                     drop_last=True))) == 2


def test_precache_json_fast_path(tmp_path):
    """precache_json writes side-files the reader then prefers; frames
    parse identically through both paths."""
    from coalign_tpu.data import SyntheticScenes
    from coalign_tpu.data.fixtures import write_opv2v_fixture
    from coalign_tpu.data.opv2v import OPV2VBaseDataset, precache_json

    lr = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]
    scenes = SyntheticScenes(num_frames=2, num_agents=2, num_objects=3,
                             lidar_range=lr, points_per_object=16,
                             ground_points=32, seed=5)
    root = write_opv2v_fixture(str(tmp_path / "opv2v"), scenes,
                               frames_per_scenario=2)
    before = OPV2VBaseDataset(root, train=False, max_cav=2)[0]
    n = precache_json(root)
    assert n > 0
    assert precache_json(root) == 0  # idempotent
    after = OPV2VBaseDataset(root, train=False, max_cav=2)[0]
    for a, b in zip(before["agents"], after["agents"]):
        np.testing.assert_allclose(a["pose"], b["pose"], rtol=1e-12)
    np.testing.assert_allclose(before["objects"]["boxes"],
                               after["objects"]["boxes"], rtol=1e-12)


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

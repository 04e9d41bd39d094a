import numpy as np

from conftest import jit_apply, jit_init
import jax
import jax.numpy as jnp
import pytest

from coalign_tpu.models import build_model
from coalign_tpu.utils.transforms import get_pairwise_transformation



def _model_args(fusion="att"):
    return {
        "voxel_size": [0.4, 0.4, 4],
        "lidar_range": [-6.4, -6.4, -3, 6.4, 6.4, 1],  # 32x32 grid
        "anchor_number": 2,
        "pillar_vfe": {"use_norm": True, "with_distance": False,
                       "use_absolute_xyz": True, "num_filters": [16]},
        "point_pillar_scatter": {"num_features": 16},
        "base_bev_backbone": {
            "layer_nums": [2, 2, 2],
            "layer_strides": [2, 2, 2],
            "num_filters": [16, 32, 48],
            "upsample_strides": [1, 2, 4],
            "num_upsample_filter": [24, 24, 24],
        },
        "fusion_method": fusion,
        "att": {"feat_dim": [16, 32, 48]},
        "shrink_header": {"kernal_size": [3], "stride": [1], "padding": [1],
                          "dim": [32], "input_dim": 72},
        "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                     "anchor_yaw": [0, 90]},
    }


def _make_batch(rng, b=2, l=3, n=256):
    pts = np.zeros((b, l, n, 4), dtype=np.float32)
    pts[..., 0] = rng.uniform(-6, 6, (b, l, n))
    pts[..., 1] = rng.uniform(-6, 6, (b, l, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, l, n))
    pts[..., 3] = rng.uniform(0, 1, (b, l, n))
    pmask = np.ones((b, l, n), dtype=bool)
    amask = np.array([[True, True, False], [True, False, False]])
    poses = np.zeros((b, l, 6), dtype=np.float32)
    poses[..., 0] = rng.uniform(-2, 2, (b, l))
    poses[..., 4] = rng.uniform(-30, 30, (b, l))
    pair = np.asarray(get_pairwise_transformation(poses, amask))
    return {
        "points": jnp.asarray(pts),
        "point_mask": jnp.asarray(pmask),
        "agent_mask": jnp.asarray(amask),
        "pairwise_t_matrix": jnp.asarray(pair, dtype=jnp.float32),
    }


@pytest.mark.parametrize("core,fusion", [
    ("point_pillar_baseline_multiscale", "att"),
    ("point_pillar_baseline_multiscale", "max"),
    ("point_pillar_baseline", "max"),
])
def test_collaborative_forward_shapes(rng, core, fusion):
    model = build_model({"core_method": core, "args": _model_args(fusion)})
    batch = _make_batch(rng)
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    # grid 32x32, backbone stride 2 -> 16x16 head maps
    assert out["cls_preds"].shape == (2, 16, 16, 2)
    assert out["reg_preds"].shape == (2, 16, 16, 14)
    assert out["dir_preds"].shape == (2, 16, 16, 4)
    assert np.all(np.isfinite(np.asarray(out["cls_preds"])))


def test_single_agent_forward(rng):
    args = _model_args()
    del args["fusion_method"], args["att"]
    model = build_model({"core_method": "point_pillar", "args": args})
    batch = _make_batch(rng)
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    assert out["cls_preds"].shape == (6, 16, 16, 2)  # B*L agents


def test_train_mode_updates_batch_stats(rng):
    model = build_model({"core_method": "point_pillar_baseline_multiscale",
                         "args": _model_args()})
    batch = _make_batch(rng)
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=True)
    out, mutated = jax.jit(lambda v, b: model.apply(
        v, b, train=True, mutable=["batch_stats"]))(variables, batch)
    assert "batch_stats" in mutated
    stats_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    stats_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b)
               for a, b in zip(stats_before, stats_after))


def test_fusion_invariance_duplicate_agent(rng):
    """Fusing an agent with an identical copy at the same pose must equal
    the single-agent result (max fusion is idempotent)."""
    model = build_model({"core_method": "point_pillar_baseline_multiscale",
                         "args": _model_args("max")})
    batch = _make_batch(rng, b=1, l=3)
    # duplicate ego into slot 1, same pose
    pts = np.asarray(batch["points"]).copy()
    pts[0, 1] = pts[0, 0]
    pair = np.tile(np.eye(4, dtype=np.float32), (1, 3, 3, 1, 1))
    batch_dup = dict(batch,
                     points=jnp.asarray(pts),
                     pairwise_t_matrix=jnp.asarray(pair),
                     agent_mask=jnp.asarray([[True, True, False]]))
    batch_solo = dict(batch_dup,
                      agent_mask=jnp.asarray([[True, False, False]]))
    variables = jit_init(model, jax.random.PRNGKey(0), batch_dup, train=False)
    out_dup = jit_apply(model, variables, batch_dup, train=False)
    out_solo = jit_apply(model, variables, batch_solo, train=False)
    np.testing.assert_allclose(np.asarray(out_dup["cls_preds"]),
                               np.asarray(out_solo["cls_preds"]), atol=1e-4)


def test_where2comm_forward(rng):
    args = _model_args("att")
    args["where2comm"] = {"agg_operator": {"mode": "ATTEN"},
                          "communication": {"thre": 0.01}}
    model = build_model({"core_method": "point_pillar_where2comm",
                         "args": args})
    batch = _make_batch(rng)
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
    out = jit_apply(model, variables, batch, train=False)
    assert out["cls_preds"].shape == (2, 16, 16, 2)
    assert out["cls_preds_single"].shape == (6, 16, 16, 2)
    assert np.isfinite(float(out["comm_rate"]))
    assert 0.0 <= float(out["comm_rate"]) <= 1.0


def test_auto_encoder_compressor():
    """Deeper AutoEncoder bandwidth model (ref auto_encoder.py:5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coalign_tpu.models.layers import AutoEncoder

    m = AutoEncoder(feature_dim=64, ratio=4)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, 24, 40, 64)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_cleanup_checkpoints(tmp_path):
    import os

    from coalign_tpu.utils.model_utils import cleanup_checkpoints

    for s in (10, 20, 30, 40):
        os.makedirs(tmp_path / f"step_{s}")
    os.makedirs(tmp_path / "bestval")
    removed = cleanup_checkpoints(str(tmp_path), keep=2)
    assert removed == ["step_10", "step_20"]
    assert sorted(os.listdir(tmp_path)) == ["bestval", "step_30", "step_40"]

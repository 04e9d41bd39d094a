import numpy as np

from conftest import jit_apply, jit_init
import jax
import jax.numpy as jnp
import pytest

from coalign_tpu.models.fuse.fusion import build_fusion
from coalign_tpu.models.fuse.graph_fusion import (

    ConvGRUCell, _adaptive_avg_pool)


def _identity_affines(b, l):
    aff = np.zeros((b, l, l, 2, 3), dtype=np.float32)
    aff[..., 0, 0] = 1.0
    aff[..., 1, 1] = 1.0
    return jnp.asarray(aff)


def _inputs(rng, b=2, l=3, h=16, w=16, c=8):
    feats = jnp.asarray(rng.normal(size=(b, l, h, w, c)), jnp.float32)
    mask = jnp.asarray(np.array([[True, True, False],
                                 [True, False, False]])[:b, :l])
    return feats, _identity_affines(b, l), mask


FUSION_ARGS = {
    "v2vnet": {"in_channels": 8, "num_iteration": 2, "agg_operator": "avg",
               "gru_flag": True, "conv_gru": {"kernel_size": [3]}},
    "when2comm": {"in_channels": 8, "query_size": 16, "key_size": 32},
}


@pytest.mark.parametrize("method", ["max", "att", "disconet", "v2vnet",
                                    "when2comm"])
def test_fusion_forward_shapes(rng, method):
    feats, aff, mask = _inputs(rng)
    module = build_fusion(method, FUSION_ARGS, 8)
    variables = module.init(jax.random.PRNGKey(0), feats, aff, mask)
    out = module.apply(variables, feats, aff, mask)
    assert out.shape == (2, 16, 16, 8)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("method", ["max", "att", "disconet", "v2vnet",
                                    "when2comm"])
def test_fusion_ignores_masked_agents(rng, method):
    """Changing a masked agent's features must not change the output."""
    feats, aff, mask = _inputs(rng)
    module = build_fusion(method, FUSION_ARGS, 8)
    variables = module.init(jax.random.PRNGKey(0), feats, aff, mask)
    out1 = module.apply(variables, feats, aff, mask)
    poisoned = feats.at[:, 2].set(1e3)  # slot 2 masked in both samples
    out2 = module.apply(variables, poisoned, aff, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_max_fusion_equals_numpy_max(rng):
    feats, aff, mask = _inputs(rng, b=1, l=2)
    module = build_fusion("max", {}, 8)
    variables = module.init(jax.random.PRNGKey(0), feats, aff,
                            jnp.asarray([[True, True]]))
    out = module.apply(variables, feats, aff, jnp.asarray([[True, True]]))
    want = np.maximum(np.asarray(feats)[0, 0], np.asarray(feats)[0, 1])
    np.testing.assert_allclose(np.asarray(out)[0], want, atol=1e-5)


def test_att_fusion_single_agent_is_identity(rng):
    feats, aff, _ = _inputs(rng, b=1, l=3)
    mask = jnp.asarray([[True, False, False]])
    module = build_fusion("att", {}, 8)
    variables = module.init(jax.random.PRNGKey(0), feats, aff, mask)
    out = module.apply(variables, feats, aff, mask)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(feats)[0, 0],
                               atol=1e-5)


def test_conv_gru_cell(rng):
    cell = ConvGRUCell(hidden_dim=8)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    h = jnp.zeros((2, 8, 8, 8), jnp.float32)
    variables = cell.init(jax.random.PRNGKey(0), x, h)
    out = cell.apply(variables, x, h)
    assert out.shape == (2, 8, 8, 8)
    # gru output is bounded by tanh when h=0: |h_next| <= |cand| <= 1
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-6


def test_adaptive_avg_pool_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 13, 17, 4)).astype(np.float32)
    got = np.asarray(_adaptive_avg_pool(jnp.asarray(x), 5, 7))
    want = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), (5, 7)).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


V2XVIT_ARGS = {
    "v2xvit": {
        "transformer": {
            "encoder": {
                "num_blocks": 1, "depth": 2, "use_roi_mask": True,
                "use_RTE": False, "RTE_ratio": 0,
                "cav_att_config": {"dim": 8, "use_hetero": True,
                                   "heads": 2, "dim_head": 4,
                                   "dropout": 0.0},
                "pwindow_att_config": {"dim": 8, "heads": [2, 2, 2],
                                       "dim_head": [4, 4, 4],
                                       "dropout": 0.0,
                                       "window_size": [2, 4, 8],
                                       "relative_pos_embedding": True,
                                       "fusion_method": "split_attn"},
                "feed_forward": {"mlp_dim": 16, "dropout": 0.0},
                "sttf": {"voxel_size": [0.4, 0.4, 4],
                         "downsample_rate": 4},
            },
        },
    },
}


def test_v2xvit_forward_and_masking(rng):
    feats, aff, mask = _inputs(rng)  # 16x16 maps, window 8 divides, 2/4 too
    module = build_fusion("v2xvit", V2XVIT_ARGS, 8)
    variables = module.init(jax.random.PRNGKey(0), feats, aff, mask)
    out = module.apply(variables, feats, aff, mask)
    assert out.shape == (2, 16, 16, 8)
    assert np.all(np.isfinite(np.asarray(out)))
    # masked-agent invariance
    poisoned = feats.at[:, 2].set(1e3)
    out2 = module.apply(variables, poisoned, aff, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_v2xvit_nondivisible_window(rng):
    """Window sizes that don't divide H/W must pad+mask, not crash."""
    feats, aff, mask = _inputs(rng, h=10, w=14)
    module = build_fusion("v2xvit", V2XVIT_ARGS, 8)
    variables = module.init(jax.random.PRNGKey(0), feats, aff, mask)
    out = module.apply(variables, feats, aff, mask)
    assert out.shape == (2, 10, 14, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_deformable_fusion_and_aliases():
    """Deformable-attention fusion (ref needs a CUDA ext; pure XLA here) +
    the point_pillar_intermediate / deform_transformer aliases."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
    from coalign_tpu.models import build_model

    lr = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]
    args = {
        "voxel_size": [0.4, 0.4, 4.0], "lidar_range": lr,
        "anchor_number": 2,
        "pillar_vfe": {"use_norm": True, "with_distance": False,
                       "use_absolute_xyz": True, "num_filters": [32]},
        "point_pillar_scatter": {"num_features": 32},
        "base_bev_backbone": {"layer_nums": [2, 2], "layer_strides": [2, 2],
                              "num_filters": [32, 64],
                              "upsample_strides": [1, 2],
                              "num_upsample_filter": [32, 32],
                              "resnet": False},
        "att": {"feat_dim": 64},
    }
    ds = SyntheticScenes(num_frames=1, num_agents=2, num_objects=3,
                         lidar_range=lr, points_per_object=32,
                         ground_points=64, seed=2)
    b = IntermediateFusionBatcher(max_cav=2, max_points=512, max_objects=8,
                                  lidar_range=lr)
    batch = {k: jnp.asarray(v) for k, v in b.assemble([ds[0]]).items()}
    for core in ("point_pillar_intermediate",
                 "point_pillar_deform_transformer"):
        model = build_model({"core_method": core, "args": dict(args)})
        v = jit_init(model, jax.random.PRNGKey(0), batch, train=False)
        out = jit_apply(model, v, batch, train=False)
        assert np.isfinite(np.asarray(out["cls_preds"])).all(), core

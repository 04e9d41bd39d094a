"""bfloat16 compute policy: conv stack in bf16 stays close to f32."""

import jax

from conftest import jit_apply, jit_init
import jax.numpy as jnp
import numpy as np
import pytest

from coalign_tpu.data import IntermediateFusionBatcher, SyntheticScenes
from coalign_tpu.models import build_model
from coalign_tpu.models.layers import compute_dtype, set_compute_dtype

LIDAR_RANGE = [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0]
ARGS = {
    "voxel_size": [0.4, 0.4, 4.0], "lidar_range": LIDAR_RANGE,
    "anchor_number": 2,
    "pillar_vfe": {"use_norm": True, "with_distance": False,
                   "use_absolute_xyz": True, "num_filters": [32]},
    "point_pillar_scatter": {"num_features": 32},
    "base_bev_backbone": {"layer_nums": [2, 2], "layer_strides": [2, 2],
                          "num_filters": [32, 64],
                          "upsample_strides": [1, 2],
                          "num_upsample_filter": [32, 32]},
    "fusion_method": "att", "att": {"feat_dim": [32, 64]},
}


@pytest.fixture(autouse=True)
def _reset_policy():
    yield
    set_compute_dtype(None)


def test_bf16_policy_close_to_f32():
    ds = SyntheticScenes(num_frames=1, num_agents=2, num_objects=3,
                         lidar_range=LIDAR_RANGE, points_per_object=32,
                         ground_points=64, seed=2)
    b = IntermediateFusionBatcher(max_cav=2, max_points=512, max_objects=8,
                                  lidar_range=LIDAR_RANGE)
    batch = {k: jnp.asarray(v) for k, v in b.assemble([ds[0]]).items()}

    assert compute_dtype() is None
    model32 = build_model({"core_method": "point_pillar_baseline_multiscale",
                           "args": ARGS})
    v = jit_init(model32, jax.random.PRNGKey(0), batch, train=False)
    out32 = jit_apply(model32, v, batch, train=False)

    set_compute_dtype(jnp.bfloat16)
    model16 = build_model({"core_method": "point_pillar_baseline_multiscale",
                           "args": ARGS})
    out16 = jit_apply(model16, v, batch, train=False)

    a, bb = np.asarray(out32["cls_preds"]), np.asarray(out16["cls_preds"])
    assert bb.dtype == np.float32  # heads promote back to f32
    assert np.isfinite(bb).all()
    # bf16 conv noise is bounded relative to the activation scale
    denom = np.abs(a).mean() + 1e-6
    assert np.abs(a - bb).mean() / denom < 0.15

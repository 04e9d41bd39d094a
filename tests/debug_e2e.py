"""Debug helper for the e2e AP parity gap (not collected by pytest)."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from conftest import jit_init  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from coalign_tpu.inference import make_infer_fn  # noqa: E402
from coalign_tpu.models import build_model  # noqa: E402
from coalign_tpu.postprocess.anchors import generate_anchor_box  # noqa: E402
from coalign_tpu.utils.ckpt_import import load_reference_checkpoint  # noqa: E402

from test_golden_e2e import ANCHOR_ARGS, TINY_ARGS  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
io = np.load(os.path.join(GOLDEN, "e2e_ap_io.npz"))

anchors = generate_anchor_box(ANCHOR_ARGS, order="hwl")
model = build_model({"core_method": "point_pillar_baseline_multiscale",
                     "args": TINY_ARGS})


def frame_batch(i):
    n = 512
    points = np.zeros((1, 2, n, 4), np.float32)
    pmask = np.zeros((1, 2, n), bool)
    for a, key in enumerate((f"ego_points_{i}", f"cav_points_{i}")):
        pts = io[key]
        points[0, a, :len(pts)] = pts
        pmask[0, a, :len(pts)] = True
    return {"points": jnp.asarray(points),
            "point_mask": jnp.asarray(pmask),
            "agent_mask": jnp.ones((1, 2), bool),
            "pairwise_t_matrix": jnp.asarray(io[f"pairwise_{i}"]),
            "transformation_matrix": jnp.eye(4)[None]}


batch0 = frame_batch(0)
variables = jit_init(model, jax.random.PRNGKey(0), batch0, train=False)
variables = load_reference_checkpoint(
    os.path.join(GOLDEN, "coalign_multiscale.pth"), variables)

out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch0)
cls = np.asarray(out["cls_preds"])
scores_all = 1 / (1 + np.exp(-cls.reshape(-1)))
thr = float(io["score_threshold"])
print("our cls_preds shape:", cls.shape)
print("our candidates above thr:", int((scores_all > thr).sum()))
print("our top-25 scores:", np.sort(scores_all)[::-1][:25])

cfg = {
    "target_args": {"score_threshold": thr},
    "nms_thresh": float(io["nms_thresh"]),
    "gt_range": TINY_ARGS["lidar_range"],
    "dir_args": TINY_ARGS["dir_args"],
    "order": "hwl", "max_num": 100,
}
infer = make_infer_fn(model, anchors, cfg)
dets = jax.tree_util.tree_map(np.asarray, infer(variables, batch0))
keep = dets["mask"][0]
print("our final boxes:", int(keep.sum()))
print("our final scores:", np.sort(dets["scores"][0][keep])[::-1])
print("ref final boxes:", len(io["pred_scores_0"]))
print("ref final scores:", np.sort(io["pred_scores_0"])[::-1])

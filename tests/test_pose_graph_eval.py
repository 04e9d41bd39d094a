"""Pose-graph evaluation tool: error stats before/after correction."""

import numpy as np

from coalign_tpu.tools.pose_graph_eval import (relative_pose_errors,
                                               summarize)


def test_relative_pose_errors_oracle():
    clean = np.zeros((2, 3, 6), dtype=np.float32)
    clean[:, 1, 0] = 10.0  # agent 1 at x=10
    clean[:, 2, 4] = 30.0  # agent 2 yawed 30 deg
    noisy = clean.copy()
    noisy[0, 1, 0] += 0.5          # 0.5 m translation error
    noisy[1, 2, 4] += -2.0         # 2 deg rotation error
    mask = np.ones((2, 3), dtype=bool)
    terr, rerr = relative_pose_errors(noisy, clean, mask)
    assert terr.shape == (4,)      # 2 frames x 2 non-ego agents
    np.testing.assert_allclose(sorted(terr)[-1], 0.5, atol=1e-5)
    np.testing.assert_allclose(sorted(rerr)[-1], 2.0, atol=1e-5)

    s = summarize(terr, rerr)
    assert s["trans_mean"] > 0 and s["rot_mean"] > 0
    assert s["trans_p95"] >= s["trans_p50"]


def test_relative_pose_errors_wraps_yaw():
    clean = np.zeros((1, 2, 6), dtype=np.float32)
    noisy = clean.copy()
    noisy[0, 1, 4] = 359.0  # = -1 deg
    terr, rerr = relative_pose_errors(noisy, clean,
                                      np.ones((1, 2), dtype=bool))
    np.testing.assert_allclose(rerr, [1.0], atol=1e-5)
    np.testing.assert_allclose(terr, [0.0], atol=1e-6)

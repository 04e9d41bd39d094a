import numpy as np
import jax.numpy as jnp

from coalign_tpu.posegraph import (BoxAlignConfig, align_poses_batch,
                                   box_alignment_relative_sample)
from coalign_tpu.utils.transforms import get_pairwise_transformation


def _se2_apply_inv(pose, xyyaw):
    """World box (x, y, yaw-rad) -> agent frame given agent (x, y, yaw-rad)."""
    c, s = np.cos(pose[2]), np.sin(pose[2])
    dx, dy = xyyaw[0] - pose[0], xyyaw[1] - pose[1]
    return np.array([c * dx + s * dy, -s * dx + c * dy, xyyaw[2] - pose[2]])


def _make_problem(rng, l=3, k=12, n_landmarks=8, pos_noise=0.4,
                  yaw_noise_deg=2.0):
    true_pose = np.zeros((l, 6), dtype=np.float32)
    true_pose[1:, 0] = rng.uniform(-10, 10, l - 1)
    true_pose[1:, 1] = rng.uniform(-10, 10, l - 1)
    true_pose[1:, 4] = rng.uniform(-60, 60, l - 1)

    landmarks = np.zeros((n_landmarks, 3), dtype=np.float32)
    landmarks[:, 0] = rng.uniform(-25, 25, n_landmarks)
    landmarks[:, 1] = rng.uniform(-25, 25, n_landmarks)
    landmarks[:, 2] = rng.uniform(-np.pi, np.pi, n_landmarks)

    boxes = np.zeros((l, k, 3), dtype=np.float32)
    mask = np.zeros((l, k), dtype=bool)
    for a in range(l):
        se2 = np.array([true_pose[a, 0], true_pose[a, 1],
                        np.deg2rad(true_pose[a, 4])])
        for j in range(n_landmarks):
            boxes[a, j] = _se2_apply_inv(se2, landmarks[j])
            mask[a, j] = True

    noisy = true_pose.copy()
    noisy[:, :2] += rng.normal(0, pos_noise, (l, 2))
    noisy[:, 4] += rng.normal(0, yaw_noise_deg, l)
    unc = np.full((l, k, 3), -3.0, dtype=np.float32)  # confident
    agent_mask = np.ones(l, dtype=bool)
    return true_pose, noisy, boxes, mask, unc, agent_mask


def _pairwise_err(refined_xyyaw, true_pose, l):
    """Max pairwise-transform discrepancy vs truth (what fusion consumes)."""
    ref6 = np.zeros((l, 6), dtype=np.float32)
    ref6[:, 0] = refined_xyyaw[:, 0]
    ref6[:, 1] = refined_xyyaw[:, 1]
    ref6[:, 4] = refined_xyyaw[:, 2]
    mask = np.ones(l, dtype=bool)
    p_ref = np.asarray(get_pairwise_transformation(ref6, mask))
    p_true = np.asarray(get_pairwise_transformation(true_pose, mask))
    return np.abs(p_ref[..., :2, 3] - p_true[..., :2, 3]).max()


def test_recovers_relative_poses(rng):
    true_pose, noisy, boxes, mask, unc, agent_mask = _make_problem(rng)
    refined = np.asarray(box_alignment_relative_sample(
        jnp.asarray(boxes), jnp.asarray(mask), jnp.asarray(unc),
        jnp.asarray(noisy), jnp.asarray(agent_mask)))
    # before: pairwise translation error ~ noise level
    noisy_xyyaw = noisy[:, [0, 1, 4]]
    err_before = _pairwise_err(noisy_xyyaw, true_pose, 3)
    err_after = _pairwise_err(refined, true_pose, 3)
    assert err_before > 0.2  # sanity: there was real noise
    assert err_after < 0.05, f"pose graph failed: {err_before} -> {err_after}"
    # ego row untouched
    np.testing.assert_allclose(refined[0], noisy[0, [0, 1, 4]], atol=1e-5)


def test_abandon_with_few_landmarks(rng):
    true_pose, noisy, boxes, mask, unc, agent_mask = _make_problem(
        rng, n_landmarks=2)  # <= 3 landmarks -> hard case
    refined = np.asarray(box_alignment_relative_sample(
        jnp.asarray(boxes), jnp.asarray(mask), jnp.asarray(unc),
        jnp.asarray(noisy), jnp.asarray(agent_mask),
        BoxAlignConfig(abandon_hard_cases=True)))
    np.testing.assert_allclose(refined, noisy[:, [0, 1, 4]], atol=1e-5)


def test_masked_agents_unchanged(rng):
    true_pose, noisy, boxes, mask, unc, _ = _make_problem(rng, l=4)
    agent_mask = np.array([True, True, True, False])
    boxes[3] = 1e3  # garbage in padded slot must not matter
    refined = np.asarray(box_alignment_relative_sample(
        jnp.asarray(boxes), jnp.asarray(mask), jnp.asarray(unc),
        jnp.asarray(noisy), jnp.asarray(agent_mask)))
    np.testing.assert_allclose(refined[3], noisy[3, [0, 1, 4]], atol=1e-5)


def test_align_poses_batch(rng):
    probs = [_make_problem(rng) for _ in range(2)]
    stack = lambda i: jnp.asarray(np.stack([p[i] for p in probs]))
    out = np.asarray(align_poses_batch(
        stack(2), stack(3), stack(4), stack(1), stack(5)))
    assert out.shape == (2, 3, 6)
    # z/roll/pitch pass through from the noisy pose
    noisy = np.stack([p[1] for p in probs])
    np.testing.assert_allclose(out[..., [2, 3, 5]], noisy[..., [2, 3, 5]])
    for b, (true_pose, noisy_p, *_rest) in enumerate(probs):
        err = _pairwise_err(out[b][:, [0, 1, 4]], true_pose, 3)
        assert err < 0.05

"""CoAlign agent-object pose-graph optimization — batched, on device.

TPU-first replacement for the reference's g2o/C++ Levenberg-Marquardt path
(ref opencood/models/sub_modules/box_align_v2.py:101
box_alignment_relative_sample_np + pose_graph_optim.py:11
PoseGraphOptimization2D). Everything is fixed-capacity and branch-free so a
whole batch of pose graphs solves inside one jitted program:

  1. project each agent's stage-1 detections to world using noisy poses
  2. cluster boxes across agents by center distance < thres via iterative
     min-label propagation (replaces the reference's python BFS,
     ref :218-288); the cluster representative is the lowest-index box —
     exactly the box whose pose seeds the reference's landmark
  3. build the agent-object graph: agent SE(2) vertices (ego fixed),
     landmark SE(2) (or R^2) vertices, edges weighted by
     exp(-log sigma^2) / d_a^2 certainty (ref :190-198)
  4. solve with damped Gauss-Newton over the masked residuals
     (jnp.linalg.solve on the dense normal equations, jacfwd Jacobians)
  5. hard-case heuristics as lax-style selects: abandon when landmarks <= 3
     or >= half of the clusters have high yaw variance; drop yaw-varying
     clusters (ref :295-382)

Returns refined (x, y, yaw-degrees) per agent, ego unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from coalign_tpu.utils.common import limit_period

# anchor diag^2 used to convert regression-target variance to meters
# (ref box_align_v2.py:185-197, hard-coded w_a=1.6, l_a=3.9)
_D_A_SQUARE = 1.6 ** 2 + 3.9 ** 2


class BoxAlignConfig(NamedTuple):
    landmark_SE2: bool = True
    adaptive_landmark: bool = False
    normalize_uncertainty: bool = False
    abandon_hard_cases: bool = True
    drop_hard_boxes: bool = True
    use_uncertainty: bool = True
    thres: float = 1.5
    yaw_var_thres: float = 0.2
    iterations: int = 20
    damping: float = 1e-6

    @classmethod
    def from_yaml(cls, args: dict):
        return cls(
            landmark_SE2=args.get("landmark_SE2", True),
            adaptive_landmark=args.get("adaptive_landmark", False),
            normalize_uncertainty=args.get("normalize_uncertainty", False),
            abandon_hard_cases=args.get("abandon_hard_cases", True),
            drop_hard_boxes=args.get("drop_hard_boxes", True),
            use_uncertainty=args.get("use_uncertainty", True),
        )


def _se2_inv_compose(pose_a, pose_b):
    """log(A^-1 B) for SE(2) poses (x, y, theta): B expressed in A's frame."""
    c, s = jnp.cos(pose_a[..., 2]), jnp.sin(pose_a[..., 2])
    dx = pose_b[..., 0] - pose_a[..., 0]
    dy = pose_b[..., 1] - pose_a[..., 1]
    return jnp.stack(
        [c * dx + s * dy, -s * dx + c * dy,
         limit_period(pose_b[..., 2] - pose_a[..., 2], 0.5, 2 * np.pi)],
        axis=-1)


def _cluster_min_label(dist, valid, same_agent, thres, num_iters=8):
    """Connected components by iterative min-label propagation.

    dist: (M, M) world center distances; valid: (M,); same_agent: (M, M)
    bool (pairs from one agent are never adjacent, ref :207-212).
    Returns labels (M,) int32: lowest box index in each cluster.
    """
    m = dist.shape[0]
    adj = (dist < thres) & ~same_agent & valid[:, None] & valid[None, :]
    adj = adj | jnp.eye(m, dtype=bool)
    labels = jnp.arange(m, dtype=jnp.int32)

    def body(_, labels):
        # min label among neighbors
        lab = jnp.where(adj, labels[None, :], m)
        return jnp.min(lab, axis=1).astype(jnp.int32)

    return jax.lax.fori_loop(0, num_iters, body, labels)


@partial(jax.jit, static_argnames=("cfg",))
def box_alignment_relative_sample(box_poses_agent, box_mask, uncertainty,
                                  noisy_pose, agent_mask,
                                  cfg: BoxAlignConfig = BoxAlignConfig()):
    """Refine one sample's agent poses from overlapping detections.

    box_poses_agent: (L, K, 3) per-agent stage-1 box poses (x, y, yaw-rad)
        in each agent's own frame (z/size dropped — the graph is planar).
    box_mask:    (L, K) bool.
    uncertainty: (L, K, 3) log sigma^2 for (x, y, yaw) (stage-1 unc head).
    noisy_pose:  (L, 6) noisy 6-DoF agent poses (degrees).
    agent_mask:  (L,) bool.

    Returns (L, 3): refined (x, y, yaw-degrees); masked/ego rows unchanged.
    """
    l, k, _ = box_poses_agent.shape
    m = l * k

    # ---- agent poses as SE(2) (x, y, yaw-rad), RECENTERED at the ego:
    # world coordinates are hundreds of meters; solving the normal
    # equations around the origin keeps f32 conditioning healthy
    ego_xy = noisy_pose[0, :2]
    agent_se2 = jnp.stack(
        [noisy_pose[:, 0] - ego_xy[0], noisy_pose[:, 1] - ego_xy[1],
         jnp.deg2rad(noisy_pose[:, 4])],
        axis=-1)  # (L, 3)

    # ---- boxes to world
    flat_boxes = box_poses_agent.reshape(m, 3)
    flat_mask = (box_mask & agent_mask[:, None]).reshape(m)
    agent_of_box = jnp.repeat(jnp.arange(l), k)
    ap = agent_se2[agent_of_box]  # (M, 3)
    c, s = jnp.cos(ap[:, 2]), jnp.sin(ap[:, 2])
    wx = ap[:, 0] + c * flat_boxes[:, 0] - s * flat_boxes[:, 1]
    wy = ap[:, 1] + s * flat_boxes[:, 0] + c * flat_boxes[:, 1]
    wyaw = ap[:, 2] + flat_boxes[:, 2]
    world = jnp.stack([wx, wy, wyaw], axis=-1)  # (M, 3)

    # ---- certainty weights (ref :190-198)
    if cfg.use_uncertainty:
        cert = jnp.exp(-uncertainty.reshape(m, 3))
        cert = cert.at[:, :2].divide(_D_A_SQUARE)
        if cfg.normalize_uncertainty:
            cert = jnp.sqrt(cert)
    else:
        cert = jnp.ones((m, 3))

    # ---- clustering
    d2 = ((world[:, None, :2] - world[None, :, :2]) ** 2).sum(-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    same_agent = agent_of_box[:, None] == agent_of_box[None, :]
    labels = _cluster_min_label(dist, flat_mask, same_agent, cfg.thres)

    is_rep = (labels == jnp.arange(m)) & flat_mask
    # cluster size (valid members only)
    member = (labels[None, :] == jnp.arange(m)[:, None]) & flat_mask[None, :]
    csize = member.sum(axis=1)
    active_cluster = is_rep & (csize >= 2)

    # circular yaw variance per cluster (ref box_yaw var; np.var on raw yaw)
    yaw = world[:, 2]
    yaw_mean = jnp.where(member, yaw[None, :], 0.0).sum(1) / jnp.maximum(csize, 1)
    yaw_var = (jnp.where(member, (yaw[None, :] - yaw_mean[:, None]) ** 2,
                         0.0).sum(1) / jnp.maximum(csize, 1))
    yaw_varies = yaw_var > cfg.yaw_var_thres

    landmark_num = active_cluster.sum()
    yaw_varies_cnt = (active_cluster & yaw_varies).sum()
    abandoned = cfg.abandon_hard_cases & (
        (landmark_num <= 3) | (yaw_varies_cnt >= 0.5 * landmark_num))

    edge_active = active_cluster[labels] & flat_mask
    if cfg.drop_hard_boxes and not cfg.adaptive_landmark:
        edge_active = edge_active & ~yaw_varies[labels]

    # ---- landmark init: representative's world pose (ref :259-274)
    landmark0 = world  # slot per box; only representative slots used

    # ---- unknowns: agent (L, 3) with ego fixed + landmarks (M, 3)
    free_agent = agent_mask & (jnp.arange(l) > 0)

    def unpack(x):
        da = x[: l * 3].reshape(l, 3)
        dl = x[l * 3:].reshape(m, 3)
        agents = agent_se2 + da * free_agent[:, None]
        lms = landmark0 + dl
        return agents, lms

    sqrt_w = jnp.sqrt(cert) * edge_active[:, None]
    if not cfg.landmark_SE2:
        sqrt_w = sqrt_w.at[:, 2].set(0.0)
    elif cfg.adaptive_landmark:
        # yaw-varying clusters fall back to R^2 landmarks with doubled
        # certainty (ref :261-266)
        adapt = yaw_varies[labels]
        adapted = jnp.sqrt(2 * cert).at[:, 2].set(0.0) * edge_active[:, None]
        sqrt_w = jnp.where(adapt[:, None], adapted, sqrt_w)

    def residuals(x):
        agents, lms = unpack(x)
        pred = _se2_inv_compose(agents[agent_of_box], lms[labels])  # (M, 3)
        r = pred - flat_boxes
        r = r.at[:, 2].set(limit_period(r[:, 2], 0.5, 2 * np.pi))
        return (r * sqrt_w).reshape(-1)

    n_u = (l + m) * 3
    x0 = jnp.zeros((n_u,))

    hi = jax.lax.Precision.HIGHEST

    def gn_step(_, x):
        r = residuals(x)
        jmat = jax.jacfwd(residuals)(x)  # (3M, n_u)
        # TPU default matmul precision is bf16 — fatal for normal
        # equations (NaN poses); pin full f32 (see utils/transforms.py)
        h = (jnp.matmul(jmat.T, jmat, precision=hi)
             + cfg.damping * jnp.eye(n_u))
        g = jnp.matmul(jmat.T, r, precision=hi)
        dx = -jnp.linalg.solve(h, g)
        # guard: a diverged/singular solve must not poison the poses
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return x + dx

    x_final = jax.lax.fori_loop(0, cfg.iterations, gn_step, x0)
    agents_final, _ = unpack(x_final)

    refined = jnp.stack(
        [agents_final[:, 0] + ego_xy[0], agents_final[:, 1] + ego_xy[1],
         jnp.rad2deg(limit_period(agents_final[:, 2], 0.5, 2 * np.pi))],
        axis=-1)
    noisy_xyyaw = jnp.stack(
        [noisy_pose[:, 0], noisy_pose[:, 1], noisy_pose[:, 4]], axis=-1)
    use_refined = (~abandoned) & agent_mask
    return jnp.where(use_refined[:, None], refined, noisy_xyyaw)


def align_poses_batch(box_poses_agent, box_mask, uncertainty, noisy_pose,
                      agent_mask, cfg: BoxAlignConfig = BoxAlignConfig()):
    """vmap of :func:`box_alignment_relative_sample` over the batch.

    Inputs are batched with a leading B dim. Returns (B, L, 6): the noisy
    pose with (x, y, yaw) replaced by the refined values (matching the
    dataset integration, ref intermediate_fusion_dataset.py:301-328).
    """
    refined_xyyaw = jax.vmap(
        lambda bp, bm, u, p, am: box_alignment_relative_sample(
            bp, bm, u, p, am, cfg))(
        box_poses_agent, box_mask, uncertainty, noisy_pose, agent_mask)
    out = jnp.asarray(noisy_pose)
    out = out.at[..., 0].set(refined_xyyaw[..., 0])
    out = out.at[..., 1].set(refined_xyyaw[..., 1])
    out = out.at[..., 4].set(refined_xyyaw[..., 2])
    return out

"""Point -> pillar decoration and dense-BEV scatter, fused and fixed-shape.

TPU-first replacement for the reference's three-stage CPU/GPU pipeline
(spconv VoxelGeneratorV2 in dataloader workers -> PillarVFE ->
PointPillarScatter; ref opencood/data_utils/pre_processor/
sp_voxel_preprocessor.py:22, opencood/models/sub_modules/pillar_vfe.py:56,
point_pillar_scatter.py:5).

Instead of building a (M, 32, 4) padded pillar table with dynamic M, we keep
the raw padded point list (N, 4) per frame and do everything as segment
reductions keyed by the flat pillar id:

  1. pillar id per point:  iy * nx + ix  (static grid, invalid -> sentinel)
  2. per-pillar stats:     segment_sum -> cluster mean, gathered back
  3. decoration:           [x, y, z, i, dxyz_cluster, dxyz_center] (10 ch)
  4. point MLP:            Linear+BN+ReLU on (N, 10) — one big MXU matmul
  5. scatter:              segment_max of point features over pillar ids
                           directly into the dense (ny*nx, C) BEV canvas

This is mathematically the reference PillarVFE (max over points per pillar
commutes with the per-point MLP) but with no voxel-count caps, no
max-points-per-pillar truncation and no host voxelizer. The scatter grid is
y-major: BEV row = y index, col = x index (ref point_pillar_scatter.py:64).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PillarSpec(NamedTuple):
    """Static voxel-grid geometry derived from the yaml config.

    lidar_range: (x_min, y_min, z_min, x_max, y_max, z_max)
    voxel_size:  (vx, vy, vz)
    nx, ny:      BEV grid size (cols = x, rows = y)
    """

    lidar_range: tuple
    voxel_size: tuple
    nx: int
    ny: int

    @classmethod
    def from_config(cls, lidar_range, voxel_size):
        nx = int(round((lidar_range[3] - lidar_range[0]) / voxel_size[0]))
        ny = int(round((lidar_range[4] - lidar_range[1]) / voxel_size[1]))
        return cls(tuple(lidar_range), tuple(voxel_size), nx, ny)


def pillar_ids(points, mask, spec: PillarSpec):
    """Flat pillar id per point; invalid points get id == ny*nx (sentinel).

    points: (..., N, 4), mask: (..., N) bool.
    Returns (ids (..., N) int32, valid (..., N) bool).
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    r = spec.lidar_range
    ix = jnp.floor((x - r[0]) / spec.voxel_size[0]).astype(jnp.int32)
    iy = jnp.floor((y - r[1]) / spec.voxel_size[1]).astype(jnp.int32)
    valid = (
        mask
        & (x >= r[0]) & (x < r[3]) & (y >= r[1]) & (y < r[4])
        & (z >= r[2]) & (z <= r[5])
        & (ix >= 0) & (ix < spec.nx) & (iy >= 0) & (iy < spec.ny)
    )
    ids = jnp.where(valid, iy * spec.nx + ix, spec.ny * spec.nx)
    return ids, valid


def sort_points_by_pillar(points, ids, valid):
    """Co-sort (points, valid) by pillar id with ONE lax.sort network.

    TPU scatters (segment_sum/max) sort their indices internally; doing it
    once here and passing ``indices_are_sorted=True`` downstream removes a
    sort per segment op — the pillar encoder's hot spot at OPV2V scale.
    points (N, C), ids (N,), valid (N,) -> same, sorted by id.
    """
    # NOTE raced alternative: sort (id, iota) narrow + one gather to
    # reorder points measured 43.1 vs 47.2 e2e fps on a v5e — the row
    # gather costs more in-program than co-moving 6 operands through the
    # sorting network. Keep the co-sort.
    ops = (ids, valid.astype(jnp.int32)) + tuple(
        points[:, i] for i in range(points.shape[1]))
    out = jax.lax.sort(ops, dimension=0, num_keys=1)
    ids_s, valid_s = out[0], out[1].astype(bool)
    pts_s = jnp.stack(out[2:], axis=-1)
    return pts_s, ids_s, valid_s


def _forward_fill(x, keep):
    """y_i = x_i if keep_i else y_(i-1): log-depth associative scan."""
    def op(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, av), af | bf)

    vals, _ = jax.lax.associative_scan(
        op, (x, jnp.broadcast_to(keep[:, None], x.shape)), axis=0)
    return vals


def sorted_segment_stats(x, ids, valid):
    """Per-point segment sums via the cumsum trick (ids SORTED).

    Returns per-point (sum over own segment) with NO scatter/gather — the
    LSS QuickCumsum idea (ref camera_utils.py:209) applied to pillar
    decoration. x: (N, C) pre-masked (invalid rows zero).

    The two boundary broadcasts (segment-start cumsum forward, segment-end
    cumsum backward) are PACKED into one forward fill: the reverse fill of
    ``end`` rows equals the forward fill of ``start`` rows of the flipped
    array (ends of the flipped array are its starts), so one
    associative_scan over a (N, 2C) pack replaces two over (N, C) —
    measurably fewer scan passes over HBM at 30k+ points."""
    n = x.shape[0]
    start = jnp.concatenate(
        [jnp.ones((1,), bool), ids[1:] != ids[:-1]])
    end = jnp.concatenate([ids[1:] != ids[:-1], jnp.ones((1,), bool)])
    csum = jnp.cumsum(x, axis=0)
    csum_prev = jnp.concatenate([jnp.zeros_like(x[:1]), csum[:-1]], axis=0)
    c = x.shape[1]
    packed = jnp.concatenate(
        [jnp.where(start[:, None], csum_prev, 0.0),
         jnp.where(end[:, None], csum, 0.0)[::-1]], axis=1)
    keep = jnp.concatenate([start[:, None].repeat(c, 1),
                            end[::-1][:, None].repeat(c, 1)], axis=1)

    def op(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, av), af | bf)

    vals, _ = jax.lax.associative_scan(op, (packed, keep), axis=0)
    base, top = vals[:, :c], vals[:, c:][::-1]
    del n, valid
    return top - base


def decorate_points_sorted(points, ids, valid, spec: PillarSpec):
    """Scatter/gather-free pillar decoration for SORTED ids (the fast path
    of the pillar encoder; semantics identical to decorate_points).

    The running sum is taken over PILLAR-CENTERED coordinates (|value| <=
    voxel size) so the f32 cumsum over 100k+ points keeps centimeter
    precision — cumsum of raw world coordinates would drift ~3 cm."""
    ones = valid.astype(points.dtype)
    ix = (ids % spec.nx).astype(points.dtype)
    iy = jnp.minimum(ids // spec.nx, spec.ny - 1).astype(points.dtype)
    r, v = spec.lidar_range, spec.voxel_size
    cx = ix * v[0] + (v[0] / 2 + r[0])
    cy = iy * v[1] + (v[1] / 2 + r[1])
    cz = jnp.full_like(cx, v[2] / 2 + r[2])
    center = jnp.stack([cx, cy, cz], axis=-1)
    f_center = points[:, :3] - center

    rel1 = jnp.concatenate([f_center, jnp.ones_like(points[:, :1])],
                           axis=-1) * ones[:, None]
    seg = sorted_segment_stats(rel1, ids, valid)
    mean_rel = seg[:, :3] / jnp.maximum(seg[:, 3:], 1.0)
    f_cluster = f_center - mean_rel

    feats = jnp.concatenate([points, f_cluster, f_center], axis=-1)
    return feats * ones[:, None]


def decorate_points(points, ids, valid, spec: PillarSpec,
                    indices_are_sorted: bool = False):
    """Per-point 10-channel pillar decoration (ref pillar_vfe.py:118-143).

    points: (N, 4), ids: (N,), valid: (N,) for ONE frame.
    Returns (N, 10) float features, zeroed for invalid points.
    """
    num_seg = spec.ny * spec.nx + 1
    ones = valid.astype(points.dtype)
    xyz1 = jnp.concatenate([points[:, :3], jnp.ones_like(points[:, :1])],
                           axis=-1) * ones[:, None]
    seg = jax.ops.segment_sum(xyz1, ids, num_segments=num_seg,
                              indices_are_sorted=indices_are_sorted)
    mean = seg[:, :3] / jnp.maximum(seg[:, 3:], 1.0)
    f_cluster = points[:, :3] - mean[ids]

    ix = (ids % spec.nx).astype(points.dtype)
    iy = jnp.minimum(ids // spec.nx, spec.ny - 1).astype(points.dtype)
    r, v = spec.lidar_range, spec.voxel_size
    cx = ix * v[0] + (v[0] / 2 + r[0])
    cy = iy * v[1] + (v[1] / 2 + r[1])
    cz = jnp.full_like(cx, v[2] / 2 + r[2])
    f_center = points[:, :3] - jnp.stack([cx, cy, cz], axis=-1)

    feats = jnp.concatenate([points, f_cluster, f_center], axis=-1)
    return feats * ones[:, None]


def scatter_max_bev(point_feats, ids, valid, spec: PillarSpec,
                    indices_are_sorted: bool = False):
    """Max-reduce per-point features into the dense BEV canvas.

    point_feats: (N, C), ids: (N,), valid: (N,) for ONE frame.
    Returns (ny, nx, C) with empty pillars = 0 (matching the reference's
    zero-initialized scatter canvas, point_pillar_scatter.py:44).
    """
    num_seg = spec.ny * spec.nx + 1
    neg = jnp.finfo(point_feats.dtype).min
    feats = jnp.where(valid[:, None], point_feats, neg)
    bev = jax.ops.segment_max(feats, ids, num_segments=num_seg,
                              indices_are_sorted=indices_are_sorted)
    # features are post-ReLU (non-negative), so clamping maps the -inf of
    # empty pillars to the reference's zero canvas without an extra
    # occupancy scatter
    bev = jnp.maximum(bev[:-1], 0.0)
    return bev.reshape(spec.ny, spec.nx, -1)


def scatter_max_bev_sorted(point_feats, ids, valid, spec: PillarSpec):
    """Sorted-ids scatter: segmented running max + ONE unique-index
    set-scatter of the segment-end rows (features must be post-ReLU,
    like scatter_max_bev)."""
    n = point_feats.shape[0]
    feats = point_feats * valid[:, None]

    # segmented cummax: running max that resets at segment starts
    def op(a, b):
        av, aid = a
        bv, bid = b
        same = (aid == bid)
        return (jnp.where(same, jnp.maximum(av, bv), bv), bid)

    ids_b = jnp.broadcast_to(ids[:, None], feats.shape)
    cmax, _ = jax.lax.associative_scan(op, (feats, ids_b), axis=0)
    end = jnp.concatenate([ids[1:] != ids[:-1], jnp.ones((1,), bool)])
    num_seg = spec.ny * spec.nx + 1
    # only segment-end rows carry the max; route others to the sentinel
    tgt = jnp.where(end & valid, ids, num_seg - 1)
    canvas = jnp.zeros((num_seg, feats.shape[1]), feats.dtype)
    canvas = canvas.at[tgt].max(cmax, indices_are_sorted=False,
                                unique_indices=False, mode="drop")
    del n
    return canvas[:-1].reshape(spec.ny, spec.nx, -1)


def scatter_max_bev_compact(point_feats, ids, valid, spec: PillarSpec):
    """Sorted-ids canvas scatter in two small steps (device-trace driven:
    the direct ``segment_max`` into the 140k-row canvas was the single
    hottest op of the e2e program at OPV2V scale, ~1.7 ms + canvas-init
    copies on a v5e).

    1. dense-rank ``segment_max``: ids are sorted, so
       ``rank = cumsum(segment_start) - 1`` renumbers the occupied pillars
       0..M-1 and the max-reduce writes an (N, C) compact table instead of
       the (ny*nx, C) canvas (5x fewer rows at 30k points / 140k cells);
    2. one set-scatter of the compact rows at the per-rank pillar id —
       unique AND ascending (ids sorted; all-invalid points share the
       sentinel id), so XLA takes its fast unique/sorted scatter path.

    Requires ids sorted (sort_points_by_pillar) and post-ReLU
    (non-negative) features, like scatter_max_bev_sorted.
    """
    n, c = point_feats.shape
    num_seg = spec.ny * spec.nx + 1
    start = jnp.concatenate([jnp.ones((1,), bool), ids[1:] != ids[:-1]])
    rank = jnp.cumsum(start.astype(jnp.int32)) - 1        # (N,) 0..M-1
    feats = point_feats * valid[:, None]
    compact = jax.ops.segment_max(feats, rank, num_segments=n,
                                  indices_are_sorted=True)
    compact = jnp.maximum(compact, 0.0)
    # representative pillar id per rank (constant within a segment);
    # ranks past M point at the last id -> duplicates, routed to the
    # sentinel row below so uniqueness holds
    seg_ids = jax.ops.segment_max(ids, rank, num_segments=n,
                                  indices_are_sorted=True)
    occupied = jnp.arange(n) < (rank[-1] + 1)
    tgt = jnp.where(occupied, seg_ids, num_seg - 1 + jnp.arange(n))
    canvas = jnp.zeros((num_seg + n, c), point_feats.dtype)
    canvas = canvas.at[tgt].set(compact, unique_indices=True,
                                indices_are_sorted=True)
    return canvas[:num_seg - 1].reshape(spec.ny, spec.nx, -1)


def scatter_max_bev_nosentinel(point_feats, ids, valid, spec: PillarSpec):
    """Sorted-ids scatter with NO sentinel row: (N, C) -> (ny, nx, C).

    scatter_max_bev's (ny*nx+1)-row canvas forces a slice + retile of the
    whole ~90 MB batched canvas afterwards (device trace: ~1.3 ms of the
    OPV2V-scale frame). Instead invalid points keep -inf features and are
    routed to the LAST real pillar — a max ignores them, all-invalid
    pillars stay -inf and clamp to the reference's zero canvas, and ids
    stay sorted (the invalid sentinel already sorted last). Requires
    sorted ids and post-ReLU (non-negative) features.

    NOTE batch scaling: flattening the (L, N) batch into ONE global
    segment_max (ids offset per agent) raced FASTER at B=1 (5 agents) but
    2.3x SLOWER at B=4 (20 agents, 2.8M segments) — keep the per-agent
    vmap form.
    """
    cells = spec.ny * spec.nx
    neg = jnp.finfo(point_feats.dtype).min
    feats = jnp.where(valid[:, None], point_feats, neg)
    bev = jax.ops.segment_max(feats, jnp.minimum(ids, cells - 1),
                              num_segments=cells, indices_are_sorted=True)
    return jnp.maximum(bev, 0.0).reshape(spec.ny, spec.nx, -1)


def _scatter_max_fwd_impl(point_feats, ids, valid, spec: PillarSpec):
    num_seg = spec.ny * spec.nx + 1
    neg = jnp.finfo(point_feats.dtype).min
    feats = jnp.where(valid[..., None], point_feats, neg)
    if point_feats.ndim == 3:  # batched (F, N, C): ONE flat segment op
        # NO sentinel row: invalid points clamp to the frame's last cell
        # where their -inf features lose every max (empty cells stay -inf
        # -> clamped to 0 below, the reference's zero-init canvas). Keeps
        # global ids sorted AND makes the output exactly (F*cells, C) —
        # no interleaved per-frame sentinel slice (a strided 180 MB copy)
        f, n, c = point_feats.shape
        cells = num_seg - 1
        base = (jnp.arange(f, dtype=ids.dtype) * cells)[:, None]
        gids = jnp.minimum(ids, cells - 1) + base
        bev = jax.ops.segment_max(feats.reshape(f * n, c),
                                  gids.reshape(f * n),
                                  num_segments=f * cells,
                                  indices_are_sorted=True)
        bev = jnp.maximum(bev, 0.0)
        return bev.reshape(f, spec.ny, spec.nx, c)
    bev = jax.ops.segment_max(feats, ids, num_segments=num_seg,
                              indices_are_sorted=True)
    bev = jnp.maximum(bev[:-1], 0.0)
    return bev.reshape(spec.ny, spec.nx, -1)


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def scatter_max_bev_cvjp(point_feats, ids, valid, spec: PillarSpec):
    """scatter_max_bev (sorted ids) with a HAND-WRITTEN backward.

    Batch-aware: (N, C) -> (ny, nx, C) or (F, N, C) -> (F, ny, nx, C) in
    ONE flat segment op / gather with global indices — the vmapped form's
    batch-dim backward gather measured 8.2 ms at B=4 (20 frames) where
    the flat global-index gather is ~3 ms (v5e trace, 2026-08-20; same
    lowering gap as the sparse-conv gathers).

    Autodiff of the segment_max + clamp chain emits FOUR full-canvas
    gathers plus a second (winner-index) scatter per frame — device-traced
    at ~9 ms of the 82 ms OPV2V-scale train step (v5e, 2026-08-20). The
    max backward only needs: route each output cell's cotangent to the
    valid points whose feature equals the cell's max. That is exactly TWO
    row gathers (forward canvas + cotangent canvas) and no scatter.

    Tie semantics match jax's segment_max VJP (every tying point receives
    the full cotangent). The relu-clamp's exact-zero tie case (autodiff
    would halve the cotangent there) is intentionally folded into the max
    rule: a post-ReLU feature equal to 0.0 that wins its pillar gets the
    full cotangent. Train-path only; numerics verified against autodiff in
    tests/test_pillars.py.

    The two backward gathers read IDENTICAL row indices, so they are packed
    into ONE 2C-lane gather over channel-concatenated (forward ‖ cotangent)
    canvases — the same native-lane-width pair packing that won in
    ops/warp.py (C=64 -> 128 lanes). Device-traced 2026-08-20: the two
    separate 64-ch gathers were 2.24 ms EACH of the 71 ms OPV2V train step
    (latency-bound row fetches); packing halves the row fetches for one
    concat of the two canvases.
    """
    return _scatter_max_fwd_impl(point_feats, ids, valid, spec)


def _scatter_max_cvjp_fwd(point_feats, ids, valid, spec):
    bev = _scatter_max_fwd_impl(point_feats, ids, valid, spec)
    return bev, (point_feats, ids, valid, bev)


def _scatter_max_cvjp_bwd(spec, res, g):
    import numpy as _np

    point_feats, ids, valid, bev = res
    cells = spec.ny * spec.nx
    c = point_feats.shape[-1]
    safe = jnp.minimum(ids, cells - 1)
    if point_feats.ndim == 3:  # batched: flat global-index gather
        f, n, _ = point_feats.shape
        base = (jnp.arange(f, dtype=ids.dtype) * cells)[:, None]
        safe = (safe + base).reshape(f * n)
        packed = jnp.concatenate(
            [bev.reshape(f * cells, c),
             g.reshape(f * cells, c).astype(bev.dtype)], axis=-1)
        rows = jnp.take(packed, safe, axis=0).reshape(f, n, 2 * c)
    else:
        packed = jnp.concatenate(
            [bev.reshape(cells, c), g.reshape(cells, c).astype(bev.dtype)],
            axis=-1)
        rows = jnp.take(packed, safe, axis=0)
    top = rows[..., :c]
    gg = rows[..., c:].astype(g.dtype)
    win = valid[..., None] & (point_feats == top)
    gpts = jnp.where(win, gg, 0).astype(point_feats.dtype)
    f0 = jax.dtypes.float0
    return (gpts, _np.zeros(ids.shape, f0), _np.zeros(valid.shape, f0))


scatter_max_bev_cvjp.defvjp(_scatter_max_cvjp_fwd, _scatter_max_cvjp_bwd)


def pillar_count_bev(ids, valid, spec: PillarSpec):
    """(ny, nx) int32 point counts per pillar (useful for masks/debug)."""
    num_seg = spec.ny * spec.nx + 1
    cnt = jax.ops.segment_sum(valid.astype(jnp.int32), ids,
                              num_segments=num_seg)
    return cnt[:-1].reshape(spec.ny, spec.nx)

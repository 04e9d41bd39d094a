"""TPU-native sparse 3D convolution: the SECOND/VoxelNet path at real scale.

The reference's spconv backbone (ref opencood/models/sub_modules/
sparse_backbone_3d.py:33 VoxelBackBone8x, SubMConv3d/SparseConv3d) runs on
GPU rulebooks — per-kernel-offset index pair lists built by a CUDA hash
table. Neither the rulebook build nor its scattered MACs map to the MXU,
and the DENSE masked-conv replacement (models/voxel_backbone.py) that is
bit-faithful at toy scale simply does not fit at the reference's 0.1 m
voxel grids: OPV2V SECOND is a 41x832x2816 grid = 96 M cells, and XLA's
padded conv buffers asked for a 98 GB allocation on a 16 GB chip (measured
2026-08-20, BENCH family:second).

This module keeps the voxels SPARSE end to end, the TPU way:

  * a frame's active voxels live as a fixed-shape (M,) sorted-key table
    (keys = flat (iz*ny + iy)*nx + ix, invalid rows pushed to a +inf-like
    sentinel) + an (M, C) feature table — static shapes, jit-stable;
  * neighbor lookup is vectorized binary search (jnp.searchsorted) of the
    27 offset-shifted key queries against the sorted table — the rulebook
    build as a batched log2(M)-step gather instead of a serial hash walk;
  * the conv itself is implicit GEMM: ONE (27*M, C) row gather followed by
    einsum('omc,ocd->md') — 27 small matmuls the MXU tiles natively;
  * a strided conv's output active set (spconv SparseConv3d semantics: an
    output site is active iff ANY input site lands in its receptive field)
    is the sort-dedup of each input voxel's <=8 candidate output sites.

Everything is differentiable in the feature path (gather/where/einsum),
so the same ops serve train and inference. Numerics are gated against the
dense masked-conv twin at toy scale (tests/test_sparse_conv.py) — the two
formulations implement identical submanifold/dilation semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SparseGrid(NamedTuple):
    """Fixed-shape sparse occupancy of a (nz, ny, nx) voxel grid.

    keys:  (M,) int32 flat cell ids, sorted ascending; invalid rows hold
           the sentinel ``nz*ny*nx`` (sorts after every real key).
    feats: (M, C) features of the active cells (invalid rows zero).
    valid: (M,) bool.
    shape: static (nz, ny, nx) — a plain tuple, NEVER traced.

    Batched grids carry a leading frame axis on keys/feats/valid
    ((F, M) / (F, M, C)) with the same static shape; every op in this
    module dispatches on ``keys.ndim`` and vmaps itself, so flax modules
    consume batched grids without lifted transforms (weights broadcast by
    closure).
    """

    keys: jnp.ndarray
    feats: jnp.ndarray
    valid: jnp.ndarray
    shape: tuple

    @property
    def sentinel(self):
        nz, ny, nx = self.shape
        return nz * ny * nx


def _coords(keys, shape):
    nz, ny, nx = shape
    iz = keys // (ny * nx)
    iy = (keys // nx) % ny
    ix = keys % nx
    return iz, iy, ix


def _flat(iz, iy, ix, shape):
    nz, ny, nx = shape
    return (iz * ny + iy) * nx + ix


def sparse_mean_voxelize(points, mask, spec, max_voxels: int,
                         pad_z: int = 0):
    """Points ([F,] N, 4) -> SparseGrid of per-voxel MEAN features
    (MeanVFE, ref mean_vfe.py:4). Voxels beyond ``max_voxels`` are
    dropped deterministically in key order (the reference drops by point
    order at its max_voxel cap, sp_voxel_preprocessor.py:22).

    pad_z declares the grid ``pad_z`` empty z-slices taller without
    touching any key (flat ids are z-major, so extra top slices only
    enlarge the sentinel) — the spconv ``[1, 0, 0]`` z pad the dense
    twin applies after voxelizing (second_family.py _voxelize)."""
    if points.ndim == 3:
        shape = (spec.nz + pad_z, spec.ny, spec.nx)
        ks, fs, vs = jax.vmap(
            lambda p, m: sparse_mean_voxelize(p, m, spec, max_voxels,
                                              pad_z)[:3])(points, mask)
        return SparseGrid(ks, fs, vs, shape)

    from coalign_tpu.ops.voxels import voxel_ids

    ids, valid = voxel_ids(points, mask, spec)
    n = ids.shape[0]
    order = jnp.argsort(ids)
    ids_s = ids[order]
    pts_s = points[order] * valid[order][:, None].astype(points.dtype)

    start = jnp.concatenate([jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    rank = jnp.cumsum(start) - 1  # dense rank of each point's voxel
    m = max_voxels
    keep = rank < m
    seg = jnp.where(keep, rank, m)  # overflow voxels -> dropped row
    sums = jax.ops.segment_sum(pts_s, seg, num_segments=m + 1)[:m]
    cnts = jax.ops.segment_sum(keep.astype(points.dtype), seg,
                               num_segments=m + 1)[:m]
    feats = sums / jnp.maximum(cnts[:, None], 1.0)

    sentinel = spec.num_voxels
    # key of rank r = the id at the first point of that segment
    key_src = jnp.where(start & keep & (ids_s < sentinel), ids_s, sentinel)
    keys = jnp.full((m + 1,), sentinel, jnp.int32).at[seg].min(
        key_src.astype(jnp.int32), mode="drop")[:m]
    vmask = keys < sentinel
    feats = feats * vmask[:, None].astype(feats.dtype)
    if pad_z:
        # re-point invalid rows at the PADDED grid's sentinel
        keys = jnp.where(vmask, keys,
                         (spec.nz + pad_z) * spec.ny * spec.nx)
    del n
    return SparseGrid(keys=keys, feats=feats, valid=vmask,
                      shape=(spec.nz + pad_z, spec.ny, spec.nx))


def occupancy_overflow(points, mask, spec, max_voxels: int):
    """Number of DISTINCT occupied voxels a frame would silently drop at
    ``max_voxels`` ([F,] scalar int32) — run it when tuning the cap:
    :func:`sparse_mean_voxelize` truncates deterministically in key order
    (the reference drops by point arrival order, a documented divergence,
    ADVICE r4 #4), so a nonzero overflow means the high-key (high-z/high-y)
    tail of the scene is gone."""
    if points.ndim == 3:
        return jax.vmap(lambda p, m: occupancy_overflow(
            p, m, spec, max_voxels))(points, mask)
    from coalign_tpu.ops.voxels import voxel_ids

    ids, valid = voxel_ids(points, mask, spec)
    ids_s = jnp.sort(jnp.where(valid, ids, spec.num_voxels))
    uniq = jnp.concatenate([jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    n_occ = jnp.sum((uniq & (ids_s < spec.num_voxels)).astype(jnp.int32))
    return jnp.maximum(n_occ - max_voxels, 0)


def _lookup(keys, queries, valid_table):
    """Row index of each query key in the sorted table, -1 if absent."""
    idx = jnp.searchsorted(keys, queries)
    m = keys.shape[0]
    idx_c = jnp.minimum(idx, m - 1)
    found = (keys[idx_c] == queries) & valid_table[idx_c]
    return jnp.where(found, idx_c, -1), found


def _offset_grid(kernel):
    """All (dz, dy, dx) taps of a kernel, centered (pad = k//2)."""
    kz, ky, kx = kernel
    dz, dy, dx = jnp.meshgrid(jnp.arange(kz) - kz // 2,
                              jnp.arange(ky) - ky // 2,
                              jnp.arange(kx) - kx // 2, indexing="ij")
    return dz.reshape(-1), dy.reshape(-1), dx.reshape(-1)


def gather_neighbors(grid: SparseGrid, out_keys, out_valid, in_coord_of_out,
                     kernel):
    """(K, Mout, C) neighbor features for every kernel tap of every output
    site. ``in_coord_of_out``: (iz, iy, ix) of each output site's receptive-
    field CENTER in input-grid coordinates."""
    nz, ny, nx = grid.shape
    dz, dy, dx = _offset_grid(kernel)  # (K,)
    cz, cy, cx = in_coord_of_out  # (Mout,)
    qz = cz[None, :] + dz[:, None]
    qy = cy[None, :] + dy[:, None]
    qx = cx[None, :] + dx[:, None]
    inb = ((qz >= 0) & (qz < nz) & (qy >= 0) & (qy < ny)
           & (qx >= 0) & (qx < nx) & out_valid[None, :])
    q = jnp.where(inb, _flat(qz, qy, qx, grid.shape), grid.sentinel + 1)
    idx, found = _lookup(grid.keys, q.reshape(-1), grid.valid)
    rows = jnp.take(grid.feats, jnp.maximum(idx, 0), axis=0)
    rows = rows * found[:, None].astype(rows.dtype)
    k = dz.shape[0]
    return rows.reshape(k, out_keys.shape[0], -1)


def _vmap_grid(fn, *grids):
    """Apply a single-frame grid op across a leading frame axis. The
    output's STATIC shape can differ from the inputs' (a downsample
    shrinks the grid); it is captured from the traced op — identical for
    every frame, so recording it once during trace is sound."""
    shapes = [g.shape for g in grids]
    out_shape = {}

    def one(*flat):
        gs = [SparseGrid(k, f, v, s) for (k, f, v), s in
              zip(zip(flat[0::3], flat[1::3], flat[2::3]), shapes)]
        out = fn(*gs)
        out_shape["s"] = out.shape
        return out.keys, out.feats, out.valid

    flat = []
    for g in grids:
        flat += [g.keys, g.feats, g.valid]
    ks, fs, vs = jax.vmap(one)(*flat)
    return SparseGrid(ks, fs, vs, out_shape["s"])


def subm_conv(grid: SparseGrid, weights):
    """Submanifold sparse conv (SubMConv3d): outputs live at the INPUT
    active sites; missing neighbors contribute zero.

    weights: (kz, ky, kx, Cin, Cout) — nn.Conv kernel layout."""
    if grid.keys.ndim == 2:
        return _vmap_grid(lambda g: subm_conv(g, weights), grid)
    kernel = weights.shape[:3]
    taps = gather_neighbors(grid, grid.keys, grid.valid,
                            _coords(grid.keys, grid.shape), kernel)
    w = weights.reshape(-1, weights.shape[3], weights.shape[4])
    out = jnp.einsum("omc,ocd->md", taps.astype(w.dtype), w)
    out = out * grid.valid[:, None].astype(out.dtype)
    return grid._replace(feats=out)


def downsample_active(grid: SparseGrid, kernel=(3, 3, 3), stride=(2, 2, 2),
                      pad=(1, 1, 1), max_out: int | None = None):
    """Active set of a strided sparse conv's OUTPUT grid (spconv
    SparseConv3d index semantics == the dense twin's occupancy max-pool):
    output j is active iff any active input i satisfies
    j*s - p <= i <= j*s - p + k - 1. Each input contributes to at most
    ceil(k/s)^3 candidate outputs; the union is sort + dedup, compacted to
    a fixed ``max_out`` rows (overflow drops the largest keys — count it
    with ``occupancy_overflow`` if tuning)."""
    if grid.keys.ndim == 2:
        return _vmap_grid(lambda g: downsample_active(
            g, kernel, stride, pad, max_out), grid)
    nz, ny, nx = grid.shape
    oshape = tuple((d + 2 * p - k) // s + 1 for d, k, s, p in
                   zip(grid.shape, kernel, stride, pad))
    m = grid.keys.shape[0]
    max_out = max_out or m

    iz, iy, ix = _coords(grid.keys, grid.shape)

    def cand_1d(i, k, s, p, size):
        # output range covering input i: ceil((i+p-k+1)/s) .. floor((i+p)/s)
        lo = -(-(i + p - k + 1) // s)
        hi = (i + p) // s
        n_cand = -(-k // s)  # ceil(k/s)
        j = lo[:, None] + jnp.arange(n_cand)[None, :]
        ok = (j <= hi[:, None]) & (j >= 0) & (j < size)
        return j, ok

    jz, okz = cand_1d(iz, kernel[0], stride[0], pad[0], oshape[0])
    jy, oky = cand_1d(iy, kernel[1], stride[1], pad[1], oshape[1])
    jx, okx = cand_1d(ix, kernel[2], stride[2], pad[2], oshape[2])

    sentinel = oshape[0] * oshape[1] * oshape[2]
    cz, cy, cx = jz.shape[1], jy.shape[1], jx.shape[1]
    j_z = jz[:, :, None, None]
    j_y = jy[:, None, :, None]
    j_x = jx[:, None, None, :]
    ok = (okz[:, :, None, None] & oky[:, None, :, None]
          & okx[:, None, None, :] & grid.valid[:, None, None, None])
    cand = jnp.where(ok, _flat(j_z, j_y, j_x, oshape), sentinel)
    cand = cand.reshape(-1)

    cand = jnp.sort(cand)
    first = jnp.concatenate([jnp.ones((1,), bool), cand[1:] != cand[:-1]])
    uniq = first & (cand < sentinel)
    rank = jnp.cumsum(uniq) - 1
    tgt = jnp.where(uniq & (rank < max_out), rank, max_out)
    keys = jnp.full((max_out + 1,), sentinel, jnp.int32).at[tgt].min(
        cand.astype(jnp.int32), mode="drop")[:max_out]
    vmask = keys < sentinel
    del cz, cy, cx, m
    return SparseGrid(keys=keys,
                      feats=jnp.zeros((max_out, grid.feats.shape[1]),
                                      grid.feats.dtype),
                      valid=vmask, shape=oshape)


def strided_conv(grid: SparseGrid, weights, out_grid: SparseGrid,
                 stride=(2, 2, 2), pad=(1, 1, 1)):
    """Strided sparse conv (SparseConv3d) from ``grid`` onto the active
    set ``out_grid`` (from :func:`downsample_active`).

    weights: (kz, ky, kx, Cin, Cout). Output site j reads input sites
    j*s - p + (0..k-1); expressed as center + centered offsets so
    :func:`gather_neighbors` serves both conv kinds."""
    if grid.keys.ndim == 2:
        return _vmap_grid(lambda g, o: strided_conv(g, weights, o, stride,
                                                    pad), grid, out_grid)
    kernel = weights.shape[:3]
    oz, oy, ox = _coords(out_grid.keys, out_grid.shape)
    center = tuple(o * s - p + k // 2 for o, s, p, k in
                   zip((oz, oy, ox), stride, pad, kernel))
    taps = gather_neighbors(grid, out_grid.keys, out_grid.valid, center,
                            kernel)
    w = weights.reshape(-1, weights.shape[3], weights.shape[4])
    out = jnp.einsum("omc,ocd->md", taps.astype(w.dtype), w)
    out = out * out_grid.valid[:, None].astype(out.dtype)
    return out_grid._replace(feats=out)


def to_dense(grid: SparseGrid):
    """SparseGrid -> dense ([F,] nz, ny, nx, C) (zeros at inactive
    sites)."""
    if grid.keys.ndim == 2:
        return jax.vmap(lambda k, f, v: to_dense(
            SparseGrid(k, f, v, grid.shape)))(grid.keys, grid.feats,
                                              grid.valid)
    nz, ny, nx = grid.shape
    c = grid.feats.shape[1]
    canvas = jnp.zeros((nz * ny * nx + 1, c), grid.feats.dtype)
    tgt = jnp.where(grid.valid, grid.keys, nz * ny * nx)
    canvas = canvas.at[tgt].set(grid.feats, mode="drop",
                                unique_indices=False)
    return canvas[:-1].reshape(nz, ny, nx, c)


def from_dense(x, max_voxels: int):
    """Dense (nz, ny, nx, C) -> SparseGrid (occupied = any nonzero
    channel). Test/interop helper — production paths start sparse."""
    nz, ny, nx, c = x.shape
    occ = jnp.abs(x).sum(-1).reshape(-1) > 0
    n = nz * ny * nx
    keys = jnp.where(occ, jnp.arange(n, dtype=jnp.int32), n)
    order = jnp.argsort(keys)[:max_voxels]
    keys = keys[order]
    vmask = keys < n
    feats = x.reshape(n, c)[jnp.minimum(order, n - 1)]
    feats = feats * vmask[:, None].astype(feats.dtype)
    return SparseGrid(keys=keys, feats=feats, valid=vmask,
                      shape=(nz, ny, nx))

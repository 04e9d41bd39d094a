"""Pallas TPU kernel: tiled pairwise rotated-box intersection-over-union.

The XLA path (utils/iou.rotated_iou_corners) materializes several
(N, M, 24, *) candidate tensors in HBM; this kernel computes the
Sutherland-Hodgman intersection entirely in VMEM per (TN, TM) tile, in
STRUCTURE-OF-ARRAYS layout — coordinates live in separate (S, TN, TM)
arrays so the minor (lane) dimension is the 128-wide tile axis instead of
the 2-wide xy axis, which would waste 64/65 lanes.

The clipper is the duplicate-fill Sutherland-Hodgman of utils/iou.py
(branch-free: no sorts, no gathers) with the ring fill unrolled to
log2(S) shift+select steps — everything lowers to Mosaic-supported ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8


def _shift_down(x, k):
    """x[i] <- x[i-k] along axis 0, zero-filled."""
    pad = jnp.zeros_like(x[:k])
    return jnp.concatenate([pad, x[:-k]], axis=0)


def _fill_ring_soa(px, py, valid):
    """Replace invalid ring slots with the previous valid vertex (cyclic);
    px/py (S, ...), valid (S, ...) bool. Unrolled log-depth fill."""
    s = px.shape[0]
    vx, vy, vf = px, py, valid
    k = 1
    while k < s:
        sx, sy, sf = _shift_down(vx, k), _shift_down(vy, k), \
            _shift_down(vf, k)
        vx = jnp.where(vf, vx, sx)
        vy = jnp.where(vf, vy, sy)
        vf = vf | sf
        k *= 2
    # wrap: slots before the first valid take the overall last valid
    vx = jnp.where(vf, vx, vx[-1:])
    vy = jnp.where(vf, vy, vy[-1:])
    return vx, vy


def _roll_up(x):
    """x[i] <- x[i+1] cyclically along axis 0."""
    return jnp.concatenate([x[1:], x[:1]], axis=0)


def sh_intersection_area_soa(q1x, q1y, q2x, q2y):
    """Intersection area, SoA: q1x/q1y (4, ...), q2x/q2y (4, ...).

    Returns (...,) areas. Same math as utils/iou.quad_intersection_area.
    """
    signed2 = 0.5 * jnp.sum(
        q2x * _roll_up(q2y) - _roll_up(q2x) * q2y, axis=0)
    sign2 = jnp.where(signed2 >= 0, 1.0, -1.0)

    px, py = q1x, q1y
    alive = jnp.ones(px.shape[1:], dtype=bool)
    for k in range(4):
        ax, ay = q2x[k], q2y[k]
        bx, by = q2x[(k + 1) % 4], q2y[(k + 1) % 4]
        ex, ey = bx - ax, by - ay
        d = (ex * (py - ay) - ey * (px - ax)) * sign2      # (S, ...)
        inside = d >= -_EPS
        nx_, ny_ = _roll_up(px), _roll_up(py)
        dn = _roll_up(d)
        denom = d - dn
        denom_safe = jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
        t = d / denom_safe
        cx = px + t * (nx_ - px)
        cy = py + t * (ny_ - py)
        cross_ok = (inside != _roll_up(inside)) & (jnp.abs(denom) >= _EPS)

        s = px.shape[0]
        out_shape = (2 * s,) + px.shape[1:]
        px = jnp.stack([px, cx], axis=1).reshape(out_shape)
        py = jnp.stack([py, cy], axis=1).reshape(out_shape)
        ov = jnp.stack([inside, cross_ok], axis=1).reshape(out_shape)
        alive = alive & jnp.any(ov, axis=0)
        px, py = _fill_ring_soa(px, py, ov)

    area = 0.5 * jnp.abs(jnp.sum(px * _roll_up(py) - _roll_up(px) * py,
                                 axis=0))
    return jnp.where(alive, area, 0.0)


def _sh_area_list(q1x, q1y, q2x, q2y):
    """List-based Sutherland-Hodgman: every ring slot is a separate 2D
    (TN, TM) array and all loops unroll at trace time — Mosaic supports
    plain 2D vector ops but not 3D multi-reductions / leading-dim rolls.
    q1x..q2y: lists of 4 (TN, TM) arrays. Returns (inter, a1, a2)."""
    def ring_area(xs, ys):
        s = len(xs)
        tot = 0.0
        for i in range(s):
            j = (i + 1) % s
            tot = tot + (xs[i] * ys[j] - xs[j] * ys[i])
        return 0.5 * jnp.abs(tot)

    signed2 = 0.0
    for i in range(4):
        j = (i + 1) % 4
        signed2 = signed2 + (q2x[i] * q2y[j] - q2x[j] * q2y[i])
    sign2 = jnp.where(signed2 >= 0, 1.0, -1.0)

    px, py = list(q1x), list(q1y)
    alive = None
    for k in range(4):
        ax, ay = q2x[k], q2y[k]
        bx, by = q2x[(k + 1) % 4], q2y[(k + 1) % 4]
        ex, ey = bx - ax, by - ay
        s = len(px)
        d = [(ex * (py[i] - ay) - ey * (px[i] - ax)) * sign2
             for i in range(s)]
        inside = [di >= -_EPS for di in d]
        nxt_x, nxt_y, out_v = [], [], []
        for i in range(s):
            j = (i + 1) % s
            denom = d[i] - d[j]
            denom_safe = jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
            t = d[i] / denom_safe
            cx = px[i] + t * (px[j] - px[i])
            cy = py[i] + t * (py[j] - py[i])
            cok = (inside[i] != inside[j]) & (jnp.abs(denom) >= _EPS)
            nxt_x.extend([px[i], cx])
            nxt_y.extend([py[i], cy])
            out_v.extend([inside[i], cok])
        any_v = out_v[0]
        for v in out_v[1:]:
            any_v = any_v | v
        alive = any_v if alive is None else (alive & any_v)

        # duplicate-fill: forward-propagate the last valid slot (log steps)
        s2 = len(nxt_x)
        vx, vy, vf = nxt_x, nxt_y, out_v
        shift = 1
        while shift < s2:
            vx = [jnp.where(vf[i], vx[i], vx[i - shift]) if i >= shift
                  else vx[i] for i in range(s2)]
            vy = [jnp.where(vf[i], vy[i], vy[i - shift]) if i >= shift
                  else vy[i] for i in range(s2)]
            vf = [vf[i] | vf[i - shift] if i >= shift else vf[i]
                  for i in range(s2)]
            shift *= 2
        last_x, last_y = vx[-1], vy[-1]
        px = [jnp.where(vf[i], vx[i], last_x) for i in range(s2)]
        py = [jnp.where(vf[i], vy[i], last_y) for i in range(s2)]

    inter = jnp.where(alive, ring_area(px, py), 0.0)
    return inter, ring_area(q1x, q1y), ring_area(q2x, q2y)


def _ring_area_list(xs, ys):
    s = len(xs)
    tot = 0.0
    for i in range(s):
        j = (i + 1) % s
        tot = tot + (xs[i] * ys[j] - xs[j] * ys[i])
    return 0.5 * jnp.abs(tot)


def _pseudo_angle(dx, dy):
    """Monotone surrogate of atan2 in [-1, 3): cheap, transcendental-free,
    sufficient for ordering candidate vertices around the centroid."""
    denom = jnp.abs(dx) + jnp.abs(dy) + 1e-12
    p = dy / denom
    return jnp.where(dx >= 0, p, 2.0 - p)


def _bitonic_cosort(keys, xs, ys, valid):
    """In-place unrolled bitonic sort of parallel lists of 2D arrays by
    ``keys`` (ascending). Length must be a power of two."""
    n = len(keys)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            for i in range(n):
                l = i ^ j
                if l > i:
                    up = (i & k) == 0
                    swap = (keys[i] > keys[l]) if up else (keys[i] < keys[l])
                    for arr in (keys, xs, ys, valid):
                        ai, al = arr[i], arr[l]
                        arr[i] = jnp.where(swap, al, ai)
                        arr[l] = jnp.where(swap, ai, al)
            j //= 2
        k *= 2


def _points_in_quad_list(ptx, pty, qx, qy):
    """Membership of each (ptx[i], pty[i]) in the quad given by lists
    qx/qy (len 4); arbitrary winding."""
    out = []
    for i in range(len(ptx)):
        pos = None
        neg = None
        for k in range(4):
            k2 = (k + 1) % 4
            ex, ey = qx[k2] - qx[k], qy[k2] - qy[k]
            cr = ex * (pty[i] - qy[k]) - ey * (ptx[i] - qx[k])
            p = cr >= -1e-6
            m = cr <= 1e-6
            pos = p if pos is None else (pos & p)
            neg = m if neg is None else (neg & m)
        out.append(pos | neg)
    return out


def _iou_kernel(c1_ref, c2_ref, out_ref):
    """One (TN, TM) tile: candidate-vertex rotated IoU with an unrolled
    bitonic co-sort (24 candidates padded to 32) — bounded VMEM live set,
    no dynamic-shape ops, no gathers, no transcendentals.

    c1_ref: (TN, 8) rows [x0..x3, y0..y3]; c2_ref: (TM, 8)."""
    c1 = c1_ref[:]
    c2 = c2_ref[:]
    tn, tm = c1.shape[0], c2.shape[0]
    q1x = [jnp.broadcast_to(c1[:, k][:, None], (tn, tm)) for k in range(4)]
    q1y = [jnp.broadcast_to(c1[:, 4 + k][:, None], (tn, tm))
           for k in range(4)]
    q2x = [jnp.broadcast_to(c2[:, k][None, :], (tn, tm)) for k in range(4)]
    q2y = [jnp.broadcast_to(c2[:, 4 + k][None, :], (tn, tm))
           for k in range(4)]

    # candidates: A corners in B, B corners in A, 16 edge crossings
    xs = list(q1x) + list(q2x)
    ys = list(q1y) + list(q2y)
    valid = (_points_in_quad_list(q1x, q1y, q2x, q2y)
             + _points_in_quad_list(q2x, q2y, q1x, q1y))
    for a in range(4):
        a2 = (a + 1) % 4
        rx, ry = q1x[a2] - q1x[a], q1y[a2] - q1y[a]
        for b in range(4):
            b2 = (b + 1) % 4
            sx, sy = q2x[b2] - q2x[b], q2y[b2] - q2y[b]
            denom = rx * sy - ry * sx
            qpx, qpy = q2x[b] - q1x[a], q2y[b] - q1y[a]
            dsafe = jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
            t = (qpx * sy - qpy * sx) / dsafe
            u = (qpx * ry - qpy * rx) / dsafe
            ok = ((jnp.abs(denom) >= 1e-9)
                  & (t >= -1e-9) & (t <= 1 + 1e-9)
                  & (u >= -1e-9) & (u <= 1 + 1e-9))
            xs.append(q1x[a] + t * rx)
            ys.append(q1y[a] + t * ry)
            valid.append(ok)

    count = 0.0
    cx = 0.0
    cy = 0.0
    for i in range(24):
        vf = valid[i].astype(xs[i].dtype)
        count = count + vf
        cx = cx + xs[i] * vf
        cy = cy + ys[i] * vf
    cx = cx / jnp.maximum(count, 1.0)
    cy = cy / jnp.maximum(count, 1.0)

    big = jnp.full((tn, tm), 1e30, xs[0].dtype)
    keys = [jnp.where(valid[i], _pseudo_angle(xs[i] - cx, ys[i] - cy), big)
            for i in range(24)]
    # pad to 32 for the bitonic network
    for _ in range(8):
        keys.append(big)
        xs.append(xs[0])
        ys.append(ys[0])
        valid.append(jnp.zeros_like(valid[0]))
    _bitonic_cosort(keys, xs, ys, valid)

    # fill the invalid tail with the FIRST vertex: the ring closes itself
    # and duplicates contribute zero to the shoelace sum
    for i in range(1, 32):
        inprefix = jnp.asarray(i, count.dtype) < count
        xs[i] = jnp.where(inprefix, xs[i], xs[0])
        ys[i] = jnp.where(inprefix, ys[i], ys[0])

    inter = _ring_area_list(xs[:32], ys[:32])
    inter = jnp.where(count >= 3, inter, 0.0)
    a1 = _ring_area_list(q1x, q1y)
    a2 = _ring_area_list(q2x, q2y)
    union = a1 + a2 - inter
    out_ref[:] = jnp.where(union > 1e-9, inter / union, 0.0)


def _round_up(x, m):
    return (x + m - 1) // m * m


@partial(jax.jit, static_argnames=("tn", "tm", "interpret"))
def rotated_iou_pallas(corners1, corners2, tn: int = 8, tm: int = 128,
                       interpret: bool = False):
    """Pairwise rotated IoU via the Pallas tile kernel.

    corners1 (N, 4, 2), corners2 (M, 4, 2) -> (N, M). Pads N/M up to tile
    multiples; padded entries produce zeros (degenerate boxes).
    """
    n, m = corners1.shape[0], corners2.shape[0]
    np_, mp = _round_up(n, tn), _round_up(m, tm)
    c1 = jnp.pad(corners1, ((0, np_ - n), (0, 0), (0, 0)))
    c2 = jnp.pad(corners2, ((0, mp - m), (0, 0), (0, 0)))
    # row layout [x0..x3, y0..y3]: corner planes index STATICALLY in-kernel
    c1p = jnp.concatenate([c1[..., 0], c1[..., 1]], axis=-1)  # (N, 8)
    c2p = jnp.concatenate([c2[..., 0], c2[..., 1]], axis=-1)

    grid = (np_ // tn, mp // tm)
    out = pl.pallas_call(
        _iou_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp), corners1.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(c1p, c2p)
    return out[:n, :m]

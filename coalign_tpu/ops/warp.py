"""Differentiable BEV affine warping (torch affine_grid + grid_sample parity).

Replaces opencood/models/sub_modules/torch_transformation_utils.py:322
(warp_affine_simple) with a pure-XLA bilinear gather over NHWC feature maps.
Semantics match ``F.affine_grid(M, align_corners=False)`` +
``F.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False)`` — the exact convention the normalized pairwise
affines (utils/transforms.py normalize_pairwise_tfm) are built for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp_affine(src, affine, out_hw=None):
    """Warp a single NHWC feature map by a 2x3 normalized affine.

    src:    (H, W, C)
    affine: (2, 3) mapping normalized OUTPUT coords -> normalized SRC coords
            (x right along W, y down along H, align_corners=False).
    out_hw: optional (H_out, W_out), defaults to src H, W.
    Returns (H_out, W_out, C); out-of-bounds samples are zero.
    """
    h, w, _ = src.shape
    oh, ow = out_hw or (h, w)
    # coordinates ALWAYS in f32: pixel coords reach the grid width (e.g.
    # 352/704) and bf16 only resolves integers up to 256 — computing these
    # in a bf16 compute dtype quantizes the sample positions by 2 pixels
    # on the right half of the map. Only the 4 tap weights are cast back.
    affine = affine.astype(jnp.float32)
    # normalized output pixel centers, align_corners=False
    ys = (2.0 * jnp.arange(oh, dtype=jnp.float32) + 1.0) / oh - 1.0
    xs = (2.0 * jnp.arange(ow, dtype=jnp.float32) + 1.0) / ow - 1.0
    gx = affine[0, 0] * xs[None, :] + affine[0, 1] * ys[:, None] + affine[0, 2]
    gy = affine[1, 0] * xs[None, :] + affine[1, 1] * ys[:, None] + affine[1, 2]
    # normalized -> source pixel coords (align_corners=False unnormalize)
    fx = ((gx + 1.0) * w - 1.0) / 2.0
    fy = ((gy + 1.0) * h - 1.0) / 2.0
    return _bilinear_gather(src, fx, fy)


def _bilinear_gather(src, fx, fy):
    """Zero-padded bilinear sampling of (H, W, C) at float coords (..., ).

    HYBRID dispatch, raced inside the FULL e2e program on the v5e (device
    traces show these gathers are the program's single largest cost —
    ~5 ms of a 24 ms frame at OPV2V scale with the 4-tap form):

      * 2C <= 128 lanes (the C=64 scale-0 maps, where most of the pixels
        are): the paired-channel 2-gather form — packs both x-neighbors
        into one native-width row, halving gathered rows;
      * wider maps (C >= 128): four independent C-wide row gathers — the
        2C-wide packed form at C=128 repeatably faults the TPU worker at
        B=4 (examples/probe_warp_variants.py, 2026-08).
    """
    if 2 * src.shape[-1] <= 128:
        return _bilinear_gather_pair(src, fx, fy)
    return _bilinear_gather_split4(src, fx, fy)


def _bilinear_gather_split4(src, fx, fy):
    """Four independent C-wide row gathers from one zero-framed
    (h*(w+2), C) table — one gather per bilinear tap. Safe at every
    production shape (no packed row exceeds the native 128-lane width)."""
    h, w, c = src.shape
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # sp[y, p] for p in [0, w+1]: zero | src row | zero; index p = x0 + 1
    # covers the boundary taps (x0 == -1 / x0 == w) with zeros.
    sp = jnp.pad(src, ((0, 0), (1, 1), (0, 0)))
    flat = sp.reshape(h * (w + 2), c)
    p = jnp.clip(x0i + 1, 0, w)

    def tap(yi, dx):
        """(..., c) = src[yi, x0 - 1 + dx], zero when yi out of bounds."""
        iny = (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * (w + 2) + p + dx
        vals = flat[idx.reshape(-1)].reshape(idx.shape + (c,))
        return vals * iny[..., None].astype(src.dtype)

    m0 = ((x0i >= 0) & (x0i < w))[..., None].astype(src.dtype)
    m1 = ((x0i + 1 >= 0) & (x0i + 1 < w))[..., None].astype(src.dtype)
    wx0 = (1 - tx)[..., None].astype(src.dtype) * m0
    wx1 = tx[..., None].astype(src.dtype) * m1
    ty_ = ty[..., None].astype(src.dtype)
    top_v = tap(y0i, 0) * wx0 + tap(y0i, 1) * wx1
    bot_v = tap(y0i + 1, 0) * wx0 + tap(y0i + 1, 1) * wx1
    return top_v * (1 - ty_) + bot_v * ty_


def _bilinear_gather_pair(src, fx, fy):
    """Paired-channel form: the two x-neighbors PACKED into one 2C-wide
    row, 2 gathers total. Production for 2C <= 128 (native lane width);
    the 256-lane packed rows at C=128 (scale 1) repeatably fault the v5e
    TPU worker at B=4 (padrow / halfw variants of the same packing fault
    identically — see examples/probe_warp_variants.py), so wider maps
    take _bilinear_gather_split4."""
    h, w, c = src.shape
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    sp = jnp.pad(src, ((0, 0), (1, 1), (0, 0)))
    pair = jnp.concatenate([sp[:, :-1], sp[:, 1:]], axis=-1)  # (h, w+1, 2c)
    flat = pair.reshape(h * (w + 1), 2 * c)
    p = jnp.clip(x0i + 1, 0, w)

    def tap2(yi):
        """(..., 2c) = [src[yi, x0] | src[yi, x0+1]], zero when yi OOB."""
        iny = (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * (w + 1) + p
        vals = flat[idx.reshape(-1)].reshape(idx.shape + (2 * c,))
        return vals * iny[..., None].astype(src.dtype)

    top = tap2(y0i)
    bot = tap2(y0i + 1)
    m0 = ((x0i >= 0) & (x0i < w))[..., None].astype(src.dtype)
    m1 = ((x0i + 1 >= 0) & (x0i + 1 < w))[..., None].astype(src.dtype)
    wx0 = (1 - tx)[..., None].astype(src.dtype) * m0
    wx1 = tx[..., None].astype(src.dtype) * m1
    ty_ = ty[..., None].astype(src.dtype)
    top_v = top[..., :c] * wx0 + top[..., c:] * wx1
    bot_v = bot[..., :c] * wx0 + bot[..., c:] * wx1
    return top_v * (1 - ty_) + bot_v * ty_


def _bilinear_gather_quad(src, fx, fy):
    """One-gather bilinear: the full 2x2 patch is packed into a 4C-wide
    row (256 lanes at C=64). Trades a 4x table materialization for a
    single row gather. RACED AND REJECTED: at OPV2V scale this
    formulation repeatably faulted the v5e TPU worker inside the full
    e2e program (axon stack, 2026-08); the paired-channel 2-gather form
    is the production path. Kept as a tested reference point."""
    h, w, c = src.shape
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    sp = jnp.pad(src, ((1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate([sp[:-1, :-1], sp[:-1, 1:],
                            sp[1:, :-1], sp[1:, 1:]], axis=-1)
    flat = quad.reshape((h + 1) * (w + 1), 4 * c)
    p = jnp.clip(x0i + 1, 0, w)
    q = jnp.clip(y0i + 1, 0, h)
    idx = q * (w + 1) + p
    vals = flat[idx.reshape(-1)].reshape(idx.shape + (4 * c,))

    dt = src.dtype
    mx0 = ((x0i >= 0) & (x0i < w))[..., None].astype(dt)
    mx1 = ((x0i + 1 >= 0) & (x0i + 1 < w))[..., None].astype(dt)
    my0 = ((y0i >= 0) & (y0i < h))[..., None].astype(dt)
    my1 = ((y0i + 1 >= 0) & (y0i + 1 < h))[..., None].astype(dt)
    wx0 = (1 - tx)[..., None].astype(dt) * mx0
    wx1 = tx[..., None].astype(dt) * mx1
    wy0 = (1 - ty)[..., None].astype(dt) * my0
    wy1 = ty[..., None].astype(dt) * my1
    return ((vals[..., 0 * c:1 * c] * wx0 + vals[..., 1 * c:2 * c] * wx1)
            * wy0
            + (vals[..., 2 * c:3 * c] * wx0 + vals[..., 3 * c:4 * c] * wx1)
            * wy1)


def warp_agents_to_ego(features, affines, agent_mask):
    """Warp every agent's BEV map into the ego frame, batched.

    features:   (B, L, H, W, C) per-agent NHWC feature maps.
    affines:    (B, L, 2, 3) normalized affines ego->agent_j (i.e. row 0 of
                the normalized pairwise matrix, ref fusion_in_one.py:36-40 —
                grid_sample needs the output->source mapping). CONTRACT:
                ``affines[:, 0]`` is the ego diagonal of the pairwise
                matrix (identity up to float eps) — it is not sampled.
    agent_mask: (B, L) bool; invalid agents produce all-zero maps.
    Returns (B, L, H, W, C).
    """
    b, l, h, w, c = features.shape
    # ego (l = 0) warps with its own identity affine: bilinear sampling at
    # exact pixel centers is the identity map (the reference grid_samples
    # ego through the same identity, fusion_in_one.py:36-40), so skip its
    # gathers — 1/L of the warp cost, the program's largest gather bill
    if b <= 8 and jax.default_backend() == "tpu":
        # UNROLL over frames, TPU ONLY: at the single-frame gather-table
        # size ((l-1, h, w, c) ≈ 36 MB packed at OPV2V scale 0) XLA promotes
        # the table into VMEM (S(1) scoped allocation) and the row gather
        # runs ~3.6x faster than from HBM. One batched gather over
        # B frames exceeds the promotion budget and every row comes from
        # HBM — device-traced at B=4: 7.3 ms vs 4 x ~1.0 ms for the SAME
        # bytes (2026-08-20, v5e). Frame unrolling keeps every table
        # individually promotable; vmap is kept above B=8 where program
        # size would grow unreasonably. On CPU the unroll is a pure loss
        # (no VMEM to promote into, B× the program size): it blew the
        # 8-device virtual-mesh dryrun from 78 s to 322 s and timed out
        # MULTICHIP_r04 — hence the backend gate (VERDICT r4 #1).
        neigh = jnp.stack([
            jax.vmap(warp_affine)(features[i, 1:], affines[i, 1:])
            for i in range(b)])
    else:
        neigh = jax.vmap(warp_affine)(
            features[:, 1:].reshape(b * (l - 1), h, w, c),
            affines[:, 1:].reshape(b * (l - 1), 2, 3)
        ).reshape(b, l - 1, h, w, c)
    # ONE flat batch dim inside each gather: a nested vmap here lowers the
    # bilinear gather to a multi-batch-dim XLA gather that is
    # catastrophically slow on TPU (measured 5.5 ms vs 0.02 ms for the same
    # work at 100x352x64xL5 on a v5e — and some shapes fault the device).
    warped = jnp.concatenate([features[:, :1], neigh], axis=1)
    return warped * agent_mask[..., None, None, None].astype(features.dtype)

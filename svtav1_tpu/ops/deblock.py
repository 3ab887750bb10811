"""Batched AV1 deblocking (loop) filter — spec §7.14; reference kernels
/root/reference/Source/Lib/Common/Codec/EbDeblockingCommon.c:141-560, edge
parameter selection Decoder/Codec/EbDecLF.c dec_set_lpf_parameters.

All edges with the same geometry are filtered as one vectorized tensor op:
gather the 14-pixel neighborhoods across every edge of a pass, evaluate the
masks + all filter variants branchlessly, scatter back.  Vertical pass over
the whole plane, then horizontal (spec order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def thresholds(lvl: int, sharpness: int = 0):
    """(mblim, lim, hev_thr) per spec §7.14.4 (av1_update_sharpness)."""
    inside = lvl >> ((sharpness > 0) + (sharpness > 4))
    if sharpness > 0:
        inside = min(inside, 9 - sharpness)
    inside = max(1, inside)
    return 2 * (lvl + 2) + inside, inside, lvl >> 4


def _filter_core(px, filter_length: int, mblim: int, lim: int, thr: int,
                 bd: int = 8):
    """px [..., 14] int32 = p6..p0,q0..q6 across the edge → filtered [..., 14].

    Only the taps the chosen filter writes are modified.  For bd > 8 the
    limits, the signed-clamp range, and the flatness threshold scale by
    1 << (bd-8) — the reference highbd kernels
    (EbDeblockingCommon.c svt_aom_highbd_lpf_*; spec §7.14.6)."""
    sh = bd - 8
    off = 128 << sh
    mblim, lim, thr = mblim << sh, lim << sh, thr << sh
    flat_thr = 1 << sh
    _sc = lambda x: jnp.clip(x, -off, off - 1)
    p = {i: px[..., 6 - i] for i in range(7)}
    q = {i: px[..., 7 + i] for i in range(7)}

    ab = lambda a, b: jnp.abs(a - b)

    # masks
    if filter_length == 4:
        mask = ((ab(p[1], p[0]) <= lim) & (ab(q[1], q[0]) <= lim) &
                (ab(p[0], q[0]) * 2 + ab(p[1], q[1]) // 2 <= mblim))
    elif filter_length == 6:
        mask = ((ab(p[2], p[1]) <= lim) & (ab(p[1], p[0]) <= lim) &
                (ab(q[1], q[0]) <= lim) & (ab(q[2], q[1]) <= lim) &
                (ab(p[0], q[0]) * 2 + ab(p[1], q[1]) // 2 <= mblim))
    else:
        mask = ((ab(p[3], p[2]) <= lim) & (ab(p[2], p[1]) <= lim) &
                (ab(p[1], p[0]) <= lim) & (ab(q[1], q[0]) <= lim) &
                (ab(q[2], q[1]) <= lim) & (ab(q[3], q[2]) <= lim) &
                (ab(p[0], q[0]) * 2 + ab(p[1], q[1]) // 2 <= mblim))

    # filter4 (branchless)
    hev = (ab(p[1], p[0]) > thr) | (ab(q[1], q[0]) > thr)
    ps1, ps0 = p[1] - off, p[0] - off
    qs0, qs1 = q[0] - off, q[1] - off
    f = jnp.where(hev, _sc(ps1 - qs1), 0)
    f = jnp.where(mask, _sc(f + 3 * (qs0 - ps0)), 0)
    f1 = _sc(f + 4) >> 3
    f2 = _sc(f + 3) >> 3
    n_q0 = _sc(qs0 - f1) + off
    n_p0 = _sc(ps0 + f2) + off
    f3 = jnp.where(hev, 0, (f1 + 1) >> 1)
    n_q1 = _sc(qs1 - f3) + off
    n_p1 = _sc(ps1 + f3) + off

    out = px
    upd = lambda arr, idx, val: arr.at[..., idx].set(val)
    if filter_length == 4:
        out = upd(out, 5, n_p1)
        out = upd(out, 6, n_p0)
        out = upd(out, 7, n_q0)
        out = upd(out, 8, n_q1)
        return out

    r2 = lambda v: (v + 4) >> 3
    if filter_length == 6:
        flat = ((ab(p[1], p[0]) <= flat_thr) & (ab(q[1], q[0]) <= flat_thr) &
                (ab(p[2], p[0]) <= flat_thr) & (ab(q[2], q[0]) <= flat_thr))
        sm = flat & mask
        s_p1 = r2(p[2] * 3 + p[1] * 2 + p[0] * 2 + q[0])
        s_p0 = r2(p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1])
        s_q0 = r2(p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2])
        s_q1 = r2(p[0] + q[0] * 2 + q[1] * 2 + q[2] * 3)
        out = upd(out, 5, jnp.where(sm, s_p1, n_p1))
        out = upd(out, 6, jnp.where(sm, s_p0, n_p0))
        out = upd(out, 7, jnp.where(sm, s_q0, n_q0))
        out = upd(out, 8, jnp.where(sm, s_q1, n_q1))
        return out

    flat = ((ab(p[1], p[0]) <= flat_thr) & (ab(q[1], q[0]) <= flat_thr) &
            (ab(p[2], p[0]) <= flat_thr) & (ab(q[2], q[0]) <= flat_thr) &
            (ab(p[3], p[0]) <= flat_thr) & (ab(q[3], q[0]) <= flat_thr))
    sm = flat & mask
    e_p2 = r2(p[3] * 3 + p[2] * 2 + p[1] + p[0] + q[0])
    e_p1 = r2(p[3] * 2 + p[2] + p[1] * 2 + p[0] + q[0] + q[1])
    e_p0 = r2(p[3] + p[2] + p[1] + p[0] * 2 + q[0] + q[1] + q[2])
    e_q0 = r2(p[2] + p[1] + p[0] + q[0] * 2 + q[1] + q[2] + q[3])
    e_q1 = r2(p[1] + p[0] + q[0] + q[1] * 2 + q[2] + q[3] * 2)
    e_q2 = r2(p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 3)
    f8 = {2: jnp.where(sm, e_p2, p[2]), 1: jnp.where(sm, e_p1, n_p1),
          0: jnp.where(sm, e_p0, n_p0)}
    g8 = {0: jnp.where(sm, e_q0, n_q0), 1: jnp.where(sm, e_q1, n_q1),
          2: jnp.where(sm, e_q2, q[2])}
    if filter_length == 8:
        out = upd(out, 4, f8[2])
        out = upd(out, 5, f8[1])
        out = upd(out, 6, f8[0])
        out = upd(out, 7, g8[0])
        out = upd(out, 8, g8[1])
        out = upd(out, 9, g8[2])
        return out

    # filter_length == 14
    flat2 = ((ab(p[6], p[0]) <= flat_thr) & (ab(p[5], p[0]) <= flat_thr) &
             (ab(p[4], p[0]) <= flat_thr) & (ab(q[4], q[0]) <= flat_thr) &
             (ab(q[5], q[0]) <= flat_thr) & (ab(q[6], q[0]) <= flat_thr))
    wide = flat2 & sm
    r4 = lambda v: (v + 8) >> 4
    w_p5 = r4(p[6] * 7 + p[5] * 2 + p[4] * 2 + p[3] + p[2] + p[1] + p[0] + q[0])
    w_p4 = r4(p[6] * 5 + p[5] * 2 + p[4] * 2 + p[3] * 2 + p[2] + p[1] + p[0] +
              q[0] + q[1])
    w_p3 = r4(p[6] * 4 + p[5] + p[4] * 2 + p[3] * 2 + p[2] * 2 + p[1] + p[0] +
              q[0] + q[1] + q[2])
    w_p2 = r4(p[6] * 3 + p[5] + p[4] + p[3] * 2 + p[2] * 2 + p[1] * 2 + p[0] +
              q[0] + q[1] + q[2] + q[3])
    w_p1 = r4(p[6] * 2 + p[5] + p[4] + p[3] + p[2] * 2 + p[1] * 2 + p[0] * 2 +
              q[0] + q[1] + q[2] + q[3] + q[4])
    w_p0 = r4(p[6] + p[5] + p[4] + p[3] + p[2] + p[1] * 2 + p[0] * 2 +
              q[0] * 2 + q[1] + q[2] + q[3] + q[4] + q[5])
    w_q0 = r4(p[5] + p[4] + p[3] + p[2] + p[1] + p[0] * 2 + q[0] * 2 +
              q[1] * 2 + q[2] + q[3] + q[4] + q[5] + q[6])
    w_q1 = r4(p[4] + p[3] + p[2] + p[1] + p[0] + q[0] * 2 + q[1] * 2 +
              q[2] * 2 + q[3] + q[4] + q[5] + q[6] * 2)
    w_q2 = r4(p[3] + p[2] + p[1] + p[0] + q[0] + q[1] * 2 + q[2] * 2 +
              q[3] * 2 + q[4] + q[5] + q[6] * 3)
    w_q3 = r4(p[2] + p[1] + p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 2 +
              q[4] * 2 + q[5] + q[6] * 4)
    w_q4 = r4(p[1] + p[0] + q[0] + q[1] + q[2] + q[3] * 2 + q[4] * 2 +
              q[5] * 2 + q[6] * 5)
    w_q5 = r4(p[0] + q[0] + q[1] + q[2] + q[3] + q[4] * 2 + q[5] * 2 +
              q[6] * 7)
    out = upd(out, 1, jnp.where(wide, w_p5, p[5]))
    out = upd(out, 2, jnp.where(wide, w_p4, p[4]))
    out = upd(out, 3, jnp.where(wide, w_p3, p[3]))
    out = upd(out, 4, jnp.where(wide, w_p2, f8[2]))
    out = upd(out, 5, jnp.where(wide, w_p1, f8[1]))
    out = upd(out, 6, jnp.where(wide, w_p0, f8[0]))
    out = upd(out, 7, jnp.where(wide, w_q0, g8[0]))
    out = upd(out, 8, jnp.where(wide, w_q1, g8[1]))
    out = upd(out, 9, jnp.where(wide, w_q2, g8[2]))
    out = upd(out, 10, jnp.where(wide, w_q3, q[3]))
    out = upd(out, 11, jnp.where(wide, w_q4, q[4]))
    out = upd(out, 12, jnp.where(wide, w_q5, q[5]))
    return out


from functools import partial



# tap window each filter length actually writes within the 14-wide strip
# (writing the full strip back would clobber neighbors when edge spacing
# is tighter than 14 — e.g. chroma 8-px edges under split partitions)
_WRITE_WIN = {4: (5, 9), 6: (5, 9), 8: (4, 10), 14: (1, 13)}


def _thresholds_t(lvl, sharpness: int = 0):
    """thresholds() for a traced level scalar (sharpness stays static)."""
    lvl = jnp.asarray(lvl, jnp.int32)
    inside = lvl >> ((sharpness > 0) + (sharpness > 4))
    if sharpness > 0:
        inside = jnp.minimum(inside, 9 - sharpness)
    inside = jnp.maximum(1, inside)
    return 2 * (lvl + 2) + inside, inside, lvl >> 4


@partial(jax.jit, static_argnames=("spacing", "filter_length",
                                   "sharpness", "bd", "valid_h"))
def deblock_plane_uniform(plane, spacing: int, filter_length: int,
                          level_v, level_h, sharpness: int = 0,
                          bd: int = 8, valid_h: int = None):
    """Deblock a plane with uniform TX grid `spacing` (our fixed-block intra
    frame): vertical-edge pass then horizontal-edge pass.

    level_v/level_h are traced scalars (0 disables the pass via masking)
    so per-frame filter-level changes — and the DLF level RDO search —
    reuse one compilation.

    valid_h: true (unpadded) frame height — horizontal edges at rows
    >= valid_h are outside the frame and never filtered (the spec loops
    mi rows only to MiRows; the plane itself is SB-padded)."""
    h, w = plane.shape[-2], plane.shape[-1]
    vh = h if valid_h is None else valid_h
    x = jnp.asarray(plane).astype(jnp.int32)
    level_v = jnp.asarray(level_v, jnp.int32)
    level_h = jnp.asarray(level_h, jnp.int32)

    mblim, lim, thr = _thresholds_t(level_v, sharpness)
    xs = np.arange(spacing, w, spacing)
    cols = xs[:, None] + np.arange(-7, 7)[None, :]       # [E, 14]
    px = x[..., :, cols]                                 # [..., h, E, 14]
    filt = _filter_core(px, filter_length, mblim, lim, thr, bd)
    px = jnp.where(level_v > 0, filt, px)
    lo, hi = _WRITE_WIN[filter_length]
    x = x.at[..., :, cols[:, lo:hi]].set(px[..., lo:hi])

    mblim, lim, thr = _thresholds_t(level_h, sharpness)
    ys = np.arange(spacing, h, spacing)
    ys = ys[ys < vh]
    rows = ys[:, None] + np.arange(-7, 7)[None, :]
    px = jnp.swapaxes(x, -1, -2)[..., :, rows]
    filt = _filter_core(px, filter_length, mblim, lim, thr, bd)
    px = jnp.where(level_h > 0, filt, px)
    lo, hi = _WRITE_WIN[filter_length]
    x = jnp.swapaxes(
        jnp.swapaxes(x, -1, -2).at[..., :, rows[:, lo:hi]].set(
            px[..., lo:hi]), -1, -2)
    return x


@partial(jax.jit, static_argnames=("spacing", "filter_length",
                                   "sharpness", "bd", "valid_h"))
def deblock_plane_part(plane, part, spacing: int, filter_length: int,
                       level_v, level_h, sharpness: int = 0,
                       bd: int = 8, part_sb=None, valid_h: int = None):
    """Partition-aware deblock: edges on the `spacing` grid always filter;
    half-spacing edges filter only inside blocks marked split in
    `part` [..., h//spacing, w//spacing].  Filter taps are unchanged
    (16/32 luma TX both take the 14-tap path, 8/16 chroma the 6-tap path,
    EbDecLF.c dec_set_lpf_parameters), so only the edge set varies.

    part_sb [..., h//(2*spacing), w//(2*spacing)] (0 = whole-SB block,
    1 = split) adds the superblock depth: `spacing` edges that are not on
    the 2*spacing grid — and all half-spacing edges — filter only inside
    split SBs (a 64x64 NONE block is one TX with no interior tx edges).

    valid_h: true (unpadded) frame height — horizontal edges at rows
    >= valid_h are outside the frame (spec loops mi rows to MiRows) and
    are never filtered."""
    h, w = plane.shape[-2], plane.shape[-1]
    vh = h if valid_h is None else valid_h
    x = jnp.asarray(plane).astype(jnp.int32)
    part = jnp.asarray(part)
    level_v = jnp.asarray(level_v, jnp.int32)
    level_h = jnp.asarray(level_h, jnp.int32)
    hs = spacing // 2
    sp2 = spacing * 2
    ys_blk = np.arange(h) // spacing
    ys_sb = np.arange(h) // sp2
    xs_all = np.arange(hs, w, hs)
    on_grid = (xs_all % spacing) == 0
    xb = xs_all // spacing

    mblim, lim, thr = _thresholds_t(level_v, sharpness)
    cols = xs_all[:, None] + np.arange(-7, 7)[None, :]
    px = x[..., :, cols]                             # [..., h, E, 14]
    act = (part[..., ys_blk, :][..., :, xb] == 1) | \
        jnp.asarray(on_grid)
    if part_sb is not None:
        psb = jnp.asarray(part_sb)
        on_sb = (xs_all % sp2) == 0
        sb_split = psb[..., ys_sb, :][..., :, xs_all // sp2] == 1
        act = jnp.asarray(on_sb) | (act & sb_split)
    act = act & (level_v > 0)
    filt = _filter_core(px, filter_length, mblim, lim, thr, bd)
    px = jnp.where(act[..., None], filt, px)
    lo, hi = _WRITE_WIN[filter_length]
    x = x.at[..., :, cols[:, lo:hi]].set(px[..., lo:hi])

    mblim, lim, thr = _thresholds_t(level_h, sharpness)
    ys_all = np.arange(hs, h, hs)
    ys_all = ys_all[ys_all < vh]
    on_grid_h = (ys_all % spacing) == 0
    yb = ys_all // spacing
    xs_blk = np.arange(w) // spacing
    rows = ys_all[:, None] + np.arange(-7, 7)[None, :]
    xt = jnp.swapaxes(x, -1, -2)                     # [..., w, h]
    px = xt[..., :, rows]                            # [..., w, E, 14]
    act = (jnp.swapaxes(part, -1, -2)[..., xs_blk, :][..., :, yb]
           == 1) | jnp.asarray(on_grid_h)
    if part_sb is not None:
        psb = jnp.asarray(part_sb)
        on_sb_h = (ys_all % sp2) == 0
        sb_split_h = jnp.swapaxes(psb, -1, -2)[
            ..., np.arange(w) // sp2, :][..., :, ys_all // sp2] == 1
        act = jnp.asarray(on_sb_h) | (act & sb_split_h)
    act = act & (level_h > 0)
    filt = _filter_core(px, filter_length, mblim, lim, thr, bd)
    px = jnp.where(act[..., None], filt, px)
    lo, hi = _WRITE_WIN[filter_length]
    x = jnp.swapaxes(xt.at[..., :, rows[:, lo:hi]].set(px[..., lo:hi]),
                     -1, -2)
    return x


@partial(jax.jit, static_argnames=("spacing", "filter_length",
                                   "sharpness", "bd", "valid_h"))
def dlf_sse_part(plane, src, part, levels, spacing: int,
                 filter_length: int, sharpness: int = 0, bd: int = 8,
                 part_sb=None, valid_h: int = None):
    """Frame-level DLF level search (reference: EbDeblockingFilter.c
    filter-level RDO): deblock `plane` at each candidate level in
    `levels` [nlev] (applied to both edge directions) and return the
    SSE vs `src` per candidate [nlev].  One compilation serves every
    frame/qindex — levels are traced."""
    src = jnp.asarray(src).astype(jnp.int32)
    vh = plane.shape[-2] if valid_h is None else valid_h
    sses = []
    for i in range(levels.shape[0]):
        out = deblock_plane_part(plane, part, spacing, filter_length,
                                 levels[i], levels[i], sharpness, bd,
                                 part_sb, valid_h=valid_h)
        d = (out[..., :vh, :] - src[..., :vh, :]).astype(jnp.float32)
        sses.append(jnp.sum(d * d))
    return jnp.stack(sses)

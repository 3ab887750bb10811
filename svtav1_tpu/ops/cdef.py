"""Batched CDEF (Constrained Directional Enhancement Filter) — spec §7.15.

Reference behavior: /root/reference/Source/Lib/Common/Codec/EbCdef.c
(svt_aom_cdef_find_dir_c :151, svt_cdef_filter_block_c :253).

TPU-native formulation:
- direction search: the 8 directional partial-sum projections become one
  [64 → 8x15] indicator matmul per block batch (MXU), costs reduced with the
  normative div_table weights;
- the filter: 16 fixed tap offsets per direction — a gather over a padded
  plane + constrain() arithmetic, fully vectorized over all 8x8 blocks.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

CDEF_VERY_LARGE = 0x7F7F

# (dy, dx) tap offsets per direction (Cdef_Directions, spec §7.15.3)
DIRECTIONS = [
    [(-1, 1), (-2, 2)], [(0, 1), (-1, 2)], [(0, 1), (0, 2)],
    [(0, 1), (1, 2)], [(1, 1), (2, 2)], [(1, 0), (2, 1)],
    [(1, 0), (2, 0)], [(1, 0), (2, -1)],
]

PRI_TAPS = [[4, 2], [3, 3]]
SEC_TAPS = [[2, 1], [2, 1]]

_DIV_TABLE = np.array([0, 840, 420, 280, 210, 168, 140, 120, 105], np.int64)


@lru_cache(maxsize=None)
def _partial_mats():
    """[8, 64, 15] indicator matrices: partial[d] = M_d.T @ x_flat."""
    M = np.zeros((8, 64, 15), np.int32)
    for i in range(8):
        for j in range(8):
            f = i * 8 + j
            M[0, f, i + j] = 1
            M[1, f, i + j // 2] = 1
            M[2, f, i] = 1
            M[3, f, 3 + i - j // 2] = 1
            M[4, f, 7 + i - j] = 1
            M[5, f, 3 - i // 2 + j] = 1
            M[6, f, j] = 1
            M[7, f, i // 2 + j] = 1
    return M


def find_dir(blocks, coeff_shift: int = 0):
    """blocks [B, 8, 8] uint16/int32 → (dir [B], var [B]) per spec."""
    x = (blocks.astype(jnp.int32) >> coeff_shift) - 128
    flat = x.reshape(x.shape[:-2] + (64,))
    M = jnp.asarray(_partial_mats())                      # [8, 64, 15]
    partial = jnp.einsum("bf,dfk->bdk", flat, M)          # [B, 8, 15]
    # int32 wraparound matches the reference C exactly (cost is int32 there)
    p2 = partial.astype(jnp.int32) ** 2

    div = jnp.asarray(_DIV_TABLE)
    cost = []
    for d in (0, 4):
        c = jnp.sum(p2[:, d, :7] * div[1:8][None, :], axis=-1) \
            + jnp.sum(p2[:, d, 8:15] * div[1:8][None, ::-1], axis=-1) \
            + p2[:, d, 7] * div[8]
        cost.append(c)
    c2 = jnp.sum(p2[:, 2, :8], axis=-1) * div[8]
    c6 = jnp.sum(p2[:, 6, :8], axis=-1) * div[8]
    odd = []
    for d in (1, 3, 5, 7):
        c = jnp.sum(p2[:, d, 3:8], axis=-1) * div[8]
        c = c + jnp.sum((p2[:, d, 0:3] + p2[:, d, 8:11][:, ::-1]) *
                        div[2:8:2][None, :], axis=-1)
        odd.append(c)
    costs = jnp.stack([cost[0], odd[0], c2, odd[1], cost[1], odd[2], c6,
                       odd[3]], axis=-1)                  # [B, 8]
    best_dir = jnp.argmax(costs, axis=-1).astype(jnp.int32)
    best_cost = jnp.max(costs, axis=-1)
    ortho = jnp.take_along_axis(costs, ((best_dir + 4) & 7)[:, None],
                                axis=-1)[:, 0]
    var = ((best_cost - ortho) >> 10).astype(jnp.int32)
    return best_dir, var


def _constrain(diff, strength: int, damping: int):
    if strength == 0:
        return jnp.zeros_like(diff)
    # shift = max(0, damping - get_msb(strength))
    shift = max(0, damping - (int(strength).bit_length() - 1))
    ad = jnp.abs(diff)
    return jnp.sign(diff) * jnp.minimum(
        ad, jnp.maximum(0, strength - (ad >> shift)))


def cdef_filter_plane(padded, dirs, pri_strength: int, sec_strength: int,
                      pri_damping: int, sec_damping: int,
                      coeff_shift: int = 0):
    """Filter all 8x8 blocks of a plane.

    padded: [H+4, W+4] int32 with CDEF_VERY_LARGE outside the frame
            (2-pixel border); interior = pre-CDEF (post-deblock) pixels.
    dirs:   [H//8, W//8] int32 directions per block (from find_dir).
    Returns the filtered [H, W] plane (int32).
    """
    H = padded.shape[-2] - 4
    W = padded.shape[-1] - 4
    x = padded[..., 2:2 + H, 2:2 + W]
    pri_idx = (pri_strength >> coeff_shift) & 1
    pri_taps = PRI_TAPS[pri_idx]
    sec_taps = SEC_TAPS[pri_idx]

    # per-pixel direction map
    dmap = jnp.repeat(jnp.repeat(dirs, 8, axis=-2), 8, axis=-1)   # [H, W]

    def shifted(dy, dx):
        return padded[..., 2 + dy:2 + dy + H, 2 + dx:2 + dx + W]

    sum_ = jnp.zeros_like(x)
    mx = x
    mn = x
    for d in range(8):
        sel = dmap == d
        for k in range(2):
            contrib = jnp.zeros_like(x)
            cmx, cmn = x, x
            # primary taps along d
            for sgn in (1, -1):
                dy, dx = DIRECTIONS[d][k]
                p = shifted(sgn * dy, sgn * dx)
                if pri_strength:
                    contrib = contrib + pri_taps[k] * _constrain(
                        p - x, pri_strength, pri_damping)
                cmx = jnp.maximum(cmx, jnp.where(p == CDEF_VERY_LARGE, cmx, p))
                cmn = jnp.minimum(cmn, p)
            # secondary taps along d±2
            for dd in ((d + 2) & 7, (d - 2) & 7):
                for sgn in (1, -1):
                    dy, dx = DIRECTIONS[dd][k]
                    s = shifted(sgn * dy, sgn * dx)
                    if sec_strength:
                        contrib = contrib + sec_taps[k] * _constrain(
                            s - x, sec_strength, sec_damping)
                    cmx = jnp.maximum(cmx,
                                      jnp.where(s == CDEF_VERY_LARGE, cmx, s))
                    cmn = jnp.minimum(cmn, s)
            sum_ = jnp.where(sel, sum_ + contrib, sum_)
            mx = jnp.where(sel, jnp.maximum(mx, cmx), mx)
            mn = jnp.where(sel, jnp.minimum(mn, cmn), mn)

    y = x + ((8 + sum_ - (sum_ < 0)) >> 4)
    return jnp.clip(y, mn, mx)


def pad_plane(plane) -> np.ndarray:
    """2-pixel CDEF_VERY_LARGE border around the frame."""
    H, W = plane.shape[-2], plane.shape[-1]
    out = np.full(plane.shape[:-2] + (H + 4, W + 4), CDEF_VERY_LARGE,
                  np.int32)
    out[..., 2:2 + H, 2:2 + W] = np.asarray(plane)
    return out


def pad_plane_j(plane):
    """jnp version of pad_plane (traceable)."""
    return jnp.pad(jnp.asarray(plane).astype(jnp.int32),
                   [(0, 0)] * (plane.ndim - 2) + [(2, 2), (2, 2)],
                   constant_values=CDEF_VERY_LARGE)


def _msb(v):
    """floor(log2(v)) for v >= 1 (get_msb), elementwise int32."""
    v = v.astype(jnp.int32)
    r = jnp.zeros_like(v)
    for s in (16, 8, 4, 2, 1):
        hit = (v >> s) > 0
        r = r + jnp.where(hit, s, 0)
        v = jnp.where(hit, v >> s, v)
    return r


def adjust_strength_map(strength, var):
    """Per-block variance-adjusted luma primary strength
    (EbCdef.c:130 adjust_strength)."""
    v6 = var >> 6
    i = jnp.where(v6 > 0, jnp.minimum(_msb(jnp.maximum(v6, 1)), 12), 0)
    return jnp.where(var != 0, (strength * (4 + i) + 8) >> 4, 0)


def _constrain_map(diff, strength, damping: int):
    """constrain() with a per-pixel traced strength map."""
    shift = jnp.maximum(0, damping - _msb(jnp.maximum(strength, 1)))
    ad = jnp.abs(diff)
    c = jnp.minimum(ad, jnp.maximum(0, strength - (ad >> shift)))
    return jnp.sign(diff) * jnp.where(strength > 0, c, 0)


def cdef_filter_plane_map(padded, dmap, pri_map, sec_map,
                          pri_damping: int, sec_damping: int, block: int,
                          coeff_shift: int = 0):
    """Filter all `block`x`block` blocks with PER-BLOCK strength maps.

    padded: [..., H+4, W+4] int32 (CDEF_VERY_LARGE outside the frame);
    dmap/pri_map/sec_map: [..., H//block, W//block] int32 — direction and
    the FINAL primary/secondary strengths (post variance adjustment and
    << coeff_shift).  block = 8 (luma) or 4 (4:2:0 chroma, same tap
    offsets per the spec).  Damping values are the already-adjusted
    per-plane ones (EbCdef.c:349-352).  Returns [..., H, W] int32."""
    H = padded.shape[-2] - 4
    W = padded.shape[-1] - 4
    x = padded[..., 2:2 + H, 2:2 + W]

    rep = lambda m: jnp.repeat(jnp.repeat(m, block, axis=-2), block,
                               axis=-1)
    dpix = rep(dmap)
    pri = rep(pri_map)
    sec = rep(sec_map)
    # tap parity from the (adjusted) strength — EbCdef.c:253 pri_taps
    parity = (pri >> coeff_shift) & 1
    pri_tap = (jnp.where(parity == 1, 3, 4),
               jnp.where(parity == 1, 3, 2))

    def shifted(dy, dx):
        return padded[..., 2 + dy:2 + dy + H, 2 + dx:2 + dx + W]

    sum_ = jnp.zeros_like(x)
    mx = x
    mn = x
    for d in range(8):
        sel = dpix == d
        for k in range(2):
            contrib = jnp.zeros_like(x)
            cmx, cmn = x, x
            for sgn in (1, -1):
                dy, dx = DIRECTIONS[d][k]
                p = shifted(sgn * dy, sgn * dx)
                contrib = contrib + pri_tap[k] * _constrain_map(
                    p - x, pri, pri_damping)
                cmx = jnp.maximum(cmx,
                                  jnp.where(p == CDEF_VERY_LARGE, cmx, p))
                cmn = jnp.minimum(cmn, p)
            for dd in ((d + 2) & 7, (d - 2) & 7):
                for sgn in (1, -1):
                    dy, dx = DIRECTIONS[dd][k]
                    s = shifted(sgn * dy, sgn * dx)
                    contrib = contrib + SEC_TAPS[0][k] * _constrain_map(
                        s - x, sec, sec_damping)
                    cmx = jnp.maximum(
                        cmx, jnp.where(s == CDEF_VERY_LARGE, cmx, s))
                    cmn = jnp.minimum(cmn, s)
            sum_ = jnp.where(sel, sum_ + contrib, sum_)
            mx = jnp.where(sel, jnp.maximum(mx, cmx), mx)
            mn = jnp.where(sel, jnp.minimum(mn, cmn), mn)

    y = x + ((8 + sum_ - (sum_ < 0)) >> 4)
    return jnp.clip(y, mn, mx)


def find_dir_plane(plane, coeff_shift: int = 0):
    """Per-8x8 direction/variance over a [..., H, W] plane →
    (dir [..., H//8, W//8], var [..., H//8, W//8])."""
    H, W = plane.shape[-2], plane.shape[-1]
    lead = plane.shape[:-2]
    bh, bw = H // 8, W // 8
    blocks = jnp.asarray(plane).reshape(lead + (bh, 8, bw, 8))
    blocks = jnp.swapaxes(blocks, -3, -2).reshape((-1, 8, 8))
    d, v = find_dir(blocks, coeff_shift)
    return d.reshape(lead + (bh, bw)), v.reshape(lead + (bh, bw))


def cdef_apply_frame(y, u, v, skip8, idx8, y_pri, y_sec, uv_pri, uv_sec,
                     damping: int, bd: int = 8):
    """Normative frame CDEF (decode-side semantics, EbDecCdef.c:120-230 /
    EbCdef.c:339-432): filter every non-skip 8x8 luma block and its
    co-located 4x4 chroma blocks from the PRE-CDEF (post-deblock) planes.

    y [H,W], u/v [H/2,W/2] int; skip8 [H/8,W/8] bool (True = coded skip);
    idx8 [H/8,W/8] int32 — per-8x8 cdef_idx (the per-64x64 signal,
    broadcast); y_pri/y_sec/uv_pri/uv_sec: [n_strengths] int32 tables
    (sec already 3→4 decoded); damping = cdef_damping (header value).
    Returns filtered (y, u, v) int32."""
    cs = bd - 8
    y = jnp.asarray(y).astype(jnp.int32)
    u = jnp.asarray(u).astype(jnp.int32)
    v = jnp.asarray(v).astype(jnp.int32)
    dirs, var = find_dir_plane(y, cs)

    yp = jnp.asarray(y_pri)[idx8] << cs
    ys = jnp.asarray(y_sec)[idx8] << cs
    pri_adj = adjust_strength_map(yp, var)
    dir_y = jnp.where(yp > 0, dirs, 0)
    y_f = cdef_filter_plane_map(pad_plane_j(y), dir_y, pri_adj, ys,
                                damping + cs, damping + cs, 8, cs)

    up = jnp.asarray(uv_pri)[idx8] << cs
    us = jnp.asarray(uv_sec)[idx8] << cs
    dir_c = jnp.where(up > 0, dirs, 0)
    u_f = cdef_filter_plane_map(pad_plane_j(u), dir_c, up, us,
                                damping + cs - 1, damping + cs - 1, 4, cs)
    v_f = cdef_filter_plane_map(pad_plane_j(v), dir_c, up, us,
                                damping + cs - 1, damping + cs - 1, 4, cs)

    skip = jnp.asarray(skip8)
    rep8 = jnp.repeat(jnp.repeat(skip, 8, axis=-2), 8, axis=-1)
    rep4 = jnp.repeat(jnp.repeat(skip, 4, axis=-2), 4, axis=-1)
    return (jnp.where(rep8, y, y_f), jnp.where(rep4, u, u_f),
            jnp.where(rep4, v, v_f))


from functools import partial as _partial
import jax as _jax


@_partial(_jax.jit, static_argnames=("bd",))
def _cdef_apply_jit(y, u, v, skip8, idx8, yp, ys, up, us, damping,
                    bd: int = 8):
    return cdef_apply_frame(y, u, v, skip8, idx8, yp, ys, up, us, damping,
                            bd)


def cdef_apply_params(rec, skip8, params, bd: int = 8):
    """Apply a chosen CDEF parameter set (shared by encoder in-loop and
    decoder).  rec = (y, u, v) planes; params as produced by
    cdef_search_frame / header parse: {damping, bits, y_strengths,
    uv_strengths, idx_map} with strengths (pri, sec) and sec ∈ {0,1,2,4}.
    Returns filtered (y, u, v) jnp int32 planes."""
    idx8 = jnp.asarray(np.repeat(np.repeat(params["idx_map"], 8, 0), 8, 1))
    yp = jnp.asarray(np.array([p for p, _ in params["y_strengths"]],
                              np.int32))
    ys = jnp.asarray(np.array([s for _, s in params["y_strengths"]],
                              np.int32))
    up = jnp.asarray(np.array([p for p, _ in params["uv_strengths"]],
                              np.int32))
    us = jnp.asarray(np.array([s for _, s in params["uv_strengths"]],
                              np.int32))
    return _cdef_apply_jit(jnp.asarray(rec[0]), jnp.asarray(rec[1]),
                           jnp.asarray(rec[2]), jnp.asarray(skip8), idx8,
                           yp, ys, up, us, jnp.int32(params["damping"]),
                           bd)

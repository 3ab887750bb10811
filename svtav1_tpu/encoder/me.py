"""Batched hierarchical motion estimation (device, one jit per frame batch).

Reference behavior being matched (not ported): the HME/ME pyramid of
EbMotionEstimation.c — hme_level_0/1/2 (:821-1026) downsampled coarse
search, integer refinement (integer_search_b64 :1250), then subpel.  The
TPU shape: every 32x32 block of every frame in the batch is searched
simultaneously — SAD fields are dense tensors, refinement steps are static
slices, and the subpel stage reuses the normative dynamic-phase MC kernel
so candidate costs are computed on bit-final predictions.

Output mvs are quarter-pel (even 1/8-pel units), ready for NEWMV coding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mc import MV_PRED_PAD, interp_block_dyn, pad_plane
from ..ops.convolve import kernels
from ..ops.metrics import downsample2x

BLK = 32
L2_RANGE = 16        # ±16 at 1/4 res → ±64 full-pel


def _gather_regions(padded, y0, x0, size: int, pad: int):
    """padded [B, Hp, Wp]; y0/x0 [B, N] plane-coord starts (can be < 0) →
    [B, N, size, size]."""
    B = padded.shape[0]
    ar = jnp.arange(size)
    rows = jnp.clip(y0[..., None] + pad + ar, 0, padded.shape[-2] - 1)
    cols = jnp.clip(x0[..., None] + pad + ar, 0, padded.shape[-1] - 1)
    bi = jnp.arange(B)[:, None, None, None]
    return padded[bi, rows[:, :, :, None], cols[:, :, None, :]]


def _blocks(plane, bs: int):
    """[B, H, W] → [B, N, bs, bs] raster blocks."""
    B, H, W = plane.shape
    bh, bw = H // bs, W // bs
    x = plane.reshape(B, bh, bs, bw, bs).transpose(0, 1, 3, 2, 4)
    return x.reshape(B, bh * bw, bs, bs)


def _sad_exhaustive(src_b, regions, bs: int, rng: int):
    """Dense SAD field: src [B,N,bs,bs] vs regions [B,N,bs+2r,bs+2r] →
    [B,N,2r+1,2r+1] (shift-and-add over block positions)."""
    n = 2 * rng + 1
    acc = None
    for i in range(bs):
        for j in range(bs):
            d = jnp.abs(regions[..., i:i + n, j:j + n] -
                        src_b[..., i, j, None, None])
            acc = d if acc is None else acc + d
    return acc


def _sad_refine(src_b, regions, bs: int, r: int):
    """SAD at the (2r+1)² integer offsets of regions [B,N,bs+2r,bs+2r]."""
    sads = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            d = regions[..., dy:dy + bs, dx:dx + bs] - src_b
            sads.append(jnp.sum(jnp.abs(d), axis=(-1, -2)))
    return jnp.stack(sads, axis=-1)           # [B, N, (2r+1)^2]


def _argmin_offset(sads, r: int):
    idx = jnp.argmin(sads, axis=-1)
    n = 2 * r + 1
    return idx // n - r, idx % n - r


L3_RANGE = 12        # ±12 at 1/8 res → ±96 full-pel (long-range refs)


@partial(jax.jit, static_argnames=("bs", "long_range"))
def motion_estimate(src, ref, bs: int = BLK, long_range: bool = False):
    """src/ref [B, H, W] (uint8/int32 luma) → mv8 [B, bh, bw, 2] int32
    quarter-pel motion vectors (even 1/8-pel units), plus the full-pel SAD
    [B, bh, bw] of the chosen position (analysis signal).

    long_range adds an HME level at 1/8 resolution (reference
    hme_level_0's large search area, EbMotionEstimation.c:821) for
    distant pyramid references — its winner competes with the ±64
    standard path at the 1/4-res stage."""
    B, H, W = src.shape
    bh, bw = H // bs, W // bs
    N = bh * bw
    src = src.astype(jnp.int32)
    ref = ref.astype(jnp.int32)

    # block origins
    r_idx = (jnp.arange(N) // bw * bs)[None, :].repeat(B, 0)
    c_idx = (jnp.arange(N) % bw * bs)[None, :].repeat(B, 0)

    # --- HME L2: exhaustive at 1/4 resolution -------------------------- #
    src2 = downsample2x(downsample2x(src))
    ref2 = downsample2x(downsample2x(ref))
    bs2 = bs // 4
    pad2 = 4 * L3_RANGE + L2_RANGE + 4
    ref2p = pad_plane(ref2, pad2)
    s2 = _blocks(src2, bs2)
    reg2 = _gather_regions(ref2p, r_idx // 4 - L2_RANGE,
                           c_idx // 4 - L2_RANGE,
                           bs2 + 2 * L2_RANGE, pad2)
    sad2 = _sad_exhaustive(s2, reg2, bs2, L2_RANGE)
    # center-bias MV cost (the reference full-pel search's mv rate term,
    # EbMotionEstimation.c fp_mv_cost): on (near-)periodic content the
    # raw-SAD argmin aliases to distant false matches; a small |mv|
    # penalty keeps the nearest of equivalent matches
    ME_PEN = 3
    off2 = jnp.arange(-L2_RANGE, L2_RANGE + 1)
    pen2 = ME_PEN * (jnp.abs(off2)[:, None] + jnp.abs(off2)[None, :])
    sad2 = sad2 + pen2[None, None]
    idx = jnp.argmin(sad2.reshape(B, N, -1), axis=-1)
    n2 = 2 * L2_RANGE + 1
    mv2y = idx // n2 - L2_RANGE
    mv2x = idx % n2 - L2_RANGE
    if long_range:
        # HME L3: exhaustive at 1/8 res, refined ±2 at 1/4, competing
        # with the standard-path winner by penalized 1/4-res SAD
        best2 = jnp.min(sad2.reshape(B, N, -1), axis=-1)
        src3 = downsample2x(src2)
        ref3 = downsample2x(ref2)
        bs3 = bs // 8
        pad3 = L3_RANGE + 4
        ref3p = pad_plane(ref3, pad3)
        s3 = _blocks(src3, bs3)
        reg3 = _gather_regions(ref3p, r_idx // 8 - L3_RANGE,
                               c_idx // 8 - L3_RANGE,
                               bs3 + 2 * L3_RANGE, pad3)
        sad3 = _sad_exhaustive(s3, reg3, bs3, L3_RANGE)
        off3 = jnp.arange(-L3_RANGE, L3_RANGE + 1)
        # 1/8-res offsets are 2x the 1/4-res scale; SADs are 1/4 area
        pen3 = (ME_PEN * 2 // 4 + 1) * (jnp.abs(off3)[:, None] +
                                        jnp.abs(off3)[None, :])
        sad3 = sad3 + pen3[None, None]
        idx3 = jnp.argmin(sad3.reshape(B, N, -1), axis=-1)
        n3 = 2 * L3_RANGE + 1
        mv3y = idx3 // n3 - L3_RANGE
        mv3x = idx3 % n3 - L3_RANGE
        y2 = r_idx // 4 + 2 * mv3y - 2
        x2 = c_idx // 4 + 2 * mv3x - 2
        reg2b = _gather_regions(ref2p, y2, x2, bs2 + 4, pad2)
        sref2 = _sad_refine(s2, reg2b, bs2, 2)
        dy2, dx2 = _argmin_offset(sref2, 2)
        cand_y = 2 * mv3y + dy2
        cand_x = 2 * mv3x + dx2
        cand_sad = jnp.min(sref2, axis=-1) + ME_PEN * (
            jnp.abs(cand_y) + jnp.abs(cand_x))
        take = cand_sad < best2
        mv2y = jnp.where(take, cand_y, mv2y)
        mv2x = jnp.where(take, cand_x, mv2x)

    # --- HME L1: ±2 refinement at 1/2 resolution ----------------------- #
    src1 = downsample2x(src)
    ref1 = downsample2x(ref)
    bs1 = bs // 2
    pad1 = 2 * L2_RANGE + 8 + (8 * L3_RANGE if long_range else 0)
    ref1p = pad_plane(ref1, pad1)
    s1 = _blocks(src1, bs1)
    y1 = r_idx // 2 + 2 * mv2y - 2
    x1 = c_idx // 2 + 2 * mv2x - 2
    reg1 = _gather_regions(ref1p, y1, x1, bs1 + 4, pad1)
    dy, dx = _argmin_offset(_sad_refine(s1, reg1, bs1, 2), 2)
    mv1y = 2 * mv2y + dy
    mv1x = 2 * mv2x + dx

    # --- full-pel: ±2 refinement at full resolution -------------------- #
    pad0 = 4 * L2_RANGE + 16 + (16 * L3_RANGE if long_range else 0)
    ref0p = pad_plane(ref, pad0)
    s0 = _blocks(src, bs)
    y0f = r_idx + 2 * mv1y - 2
    x0f = c_idx + 2 * mv1x - 2
    reg0 = _gather_regions(ref0p, y0f, x0f, bs + 4, pad0)
    sref = _sad_refine(s0, reg0, bs, 2)
    dy, dx = _argmin_offset(sref, 2)
    mvy = 2 * mv1y + dy
    mvx = 2 * mv1x + dx
    best_sad = jnp.min(sref, axis=-1)

    # clamp full-pel mv so the normative UMV clamp can never alter it
    mvy = jnp.clip(mvy, -(r_idx + 32), (H - bs - r_idx) + 32)
    mvx = jnp.clip(mvx, -(c_idx + 32), (W - bs - c_idx) + 32)

    # --- subpel: half then quarter diamond on normative predictions ---- #
    kern = jnp.asarray(kernels(0))
    refp = pad_plane(ref, MV_PRED_PAD)

    def subpel_cost(mv8y, mv8x):
        q4r, q4c = 2 * mv8y, 2 * mv8x
        iy = r_idx + (q4r >> 4)
        ix = c_idx + (q4c >> 4)
        ky = kern[q4r & 15]
        kx = kern[q4c & 15]
        win = _gather_regions(refp, iy - 3, ix - 3, bs + 7, MV_PRED_PAD)
        pred = interp_block_dyn(win, kx, ky)
        return jnp.sum(jnp.abs(pred - s0), axis=(-1, -2))

    mv8y, mv8x = 8 * mvy, 8 * mvx
    for step in (4, 2):                        # half-pel, then quarter-pel
        best_c = subpel_cost(mv8y, mv8x)
        best_dy = jnp.zeros_like(mv8y)
        best_dx = jnp.zeros_like(mv8x)
        for oy in (-step, 0, step):
            for ox in (-step, 0, step):
                if oy == 0 and ox == 0:
                    continue
                c = subpel_cost(mv8y + oy, mv8x + ox)
                take = c < best_c
                best_c = jnp.where(take, c, best_c)
                best_dy = jnp.where(take, oy, best_dy)
                best_dx = jnp.where(take, ox, best_dx)
        mv8y = mv8y + best_dy
        mv8x = mv8x + best_dx

    mv8 = jnp.stack([mv8y, mv8x], axis=-1)
    return (mv8.reshape(B, bh, bw, 2),
            best_sad.reshape(B, bh, bw))

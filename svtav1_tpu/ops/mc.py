"""Batched inter prediction (motion compensation) — spec §7.11.3.

Reference behavior: svtav1_dec svt_make_inter_predictor
(/root/reference/Source/Lib/Decoder/Codec/EbDecInterPrediction.c:418-520):
mv is scaled to 1/16-plane-pel (q4), clamped to the UMV border
(dec_clamp_mv_to_umv_border_sb, :42-64), the integer part selects the
reference window and the 4-bit phase selects the 8-tap kernel.  Out-of-frame
reads replicate edge pixels (extend_mc_border) — realised here by gathering
from an edge-padded reference plane.

Unlike ops/convolve.py (static phase), these run with *per-block dynamic*
mvs: kernels are gathered by traced phase, so one jitted computation covers
every block of a frame batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .convolve import FILTER_BITS, ROUND0, ROUND1, kernels

MV_PRED_PAD = 48      # padded-plane margin covering the UMV clamp range


def pad_plane(plane, pad: int = MV_PRED_PAD):
    """Edge-replicate padding ([..., H, W] → [..., H+2p, W+2p]) — the
    normative out-of-frame extension."""
    cfg = [(0, 0)] * (plane.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(plane, cfg, mode="edge")


def _clamp_q4(q4, lo, hi):
    return jnp.clip(q4, lo, hi)


def _dyn_tap(x, kern, axis):
    """8-tap filter along `axis` with per-item kernels kern [..., 8]
    broadcast over the two trailing spatial dims of x."""
    n = x.shape[axis] - 7
    out = None
    for k in range(8):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + n)
        kk = kern[..., k, None, None]
        term = kk * x[tuple(sl)]
        out = term if out is None else out + term
    return out


def interp_block_dyn(windows, kx, ky, bd: int = 8):
    """Normative 2D subpel filter with dynamic kernels.
    windows [..., bs+7, bs+7] int32; kx/ky [..., 8] → [..., bs, bs]."""
    x = windows.astype(jnp.int32)
    hsum = _dyn_tap(x, kx, axis=-1) + (1 << (bd + FILTER_BITS - 1))
    im = (hsum + (1 << (ROUND0 - 1))) >> ROUND0
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    vsum = _dyn_tap(im, ky, axis=-2) + (1 << offset_bits)
    res = ((vsum + (1 << (ROUND1 - 1))) >> ROUND1) - \
        ((1 << (offset_bits - ROUND1)) + (1 << (offset_bits - ROUND1 - 1)))
    return jnp.clip(res, 0, (1 << bd) - 1)


COMPOUND_ROUND1 = 7     # convolve.h COMPOUND_ROUND1_BITS


def interp_block_dyn_mid(windows, kx, ky, bd: int = 8):
    """Compound intermediate: the 2D filter result before the final
    compound rounding (ConvBufType res of svt_av1_jnt_convolve_2d_c,
    EbInterPrediction.c:503 — round_0=3, round_1=COMPOUND_ROUND1)."""
    x = windows.astype(jnp.int32)
    hsum = _dyn_tap(x, kx, axis=-1) + (1 << (bd + FILTER_BITS - 1))
    im = (hsum + (1 << (ROUND0 - 1))) >> ROUND0
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    vsum = _dyn_tap(im, ky, axis=-2) + (1 << offset_bits)
    return (vsum + (1 << (COMPOUND_ROUND1 - 1))) >> COMPOUND_ROUND1


def compound_average(res0, res1, bd: int = 8):
    """COMPOUND_AVERAGE combine of two intermediates (do_average path of
    svt_av1_jnt_convolve_2d_c without jnt weights)."""
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    round_offset = ((1 << (offset_bits - COMPOUND_ROUND1)) +
                    (1 << (offset_bits - COMPOUND_ROUND1 - 1)))
    round_bits = 2 * FILTER_BITS - ROUND0 - COMPOUND_ROUND1
    tmp = ((res0 + res1) >> 1) - round_offset
    out = (tmp + (1 << (round_bits - 1))) >> round_bits
    return jnp.clip(out, 0, (1 << bd) - 1)


@partial(jax.jit, static_argnames=("bs", "ss", "bd", "filt"))
def predict_inter_blocks(ref_padded, y0, x0, mv8, frame_h: int, frame_w: int,
                         bs: int, ss: int = 0, bd: int = 8, filt: int = 0):
    """Motion-compensated prediction for a batch of blocks.

    ref_padded [B, H/2^ss + 2*PAD, ...] edge-padded plane;
    y0/x0 [B, N] plane-coord block origins; mv8 [B, N, 2] luma 1/8-pel mvs;
    frame_h/frame_w are LUMA dims.  Returns [B, N, bs, bs] predictions,
    bit-exact with the normative path (incl. the UMV border clamp)."""
    kern = jnp.asarray(kernels(filt))                  # [16, 8]
    bs_l = bs << ss                                    # luma-scale block dims
    # luma-unit block position (for the mb_to_edge computation)
    ly0, lx0 = y0 << ss, x0 << ss
    # q4: 1/16-plane-pel
    q4r = mv8[..., 0] * (1 << (1 - ss))
    q4c = mv8[..., 1] * (1 << (1 - ss))
    spel = (4 + bs) << 4
    mb_to_left = -(lx0 * 8) * (1 << (1 - ss))
    mb_to_right = ((frame_w - bs_l - lx0) * 8) * (1 << (1 - ss))
    mb_to_top = -(ly0 * 8) * (1 << (1 - ss))
    mb_to_bottom = ((frame_h - bs_l - ly0) * 8) * (1 << (1 - ss))
    q4c = _clamp_q4(q4c, mb_to_left - spel, mb_to_right + spel - 16)
    q4r = _clamp_q4(q4r, mb_to_top - spel, mb_to_bottom + spel - 16)

    iy = y0 + (q4r >> 4)                               # window start - 3 below
    ix = x0 + (q4c >> 4)
    ky = kern[q4r & 15]                                # [B, N, 8]
    kx = kern[q4c & 15]

    B = ref_padded.shape[0]
    ar = jnp.arange(bs + 7)
    rows = iy[..., None] + (MV_PRED_PAD - 3) + ar      # [B, N, bs+7]
    cols = ix[..., None] + (MV_PRED_PAD - 3) + ar
    rows = jnp.clip(rows, 0, ref_padded.shape[-2] - 1)
    cols = jnp.clip(cols, 0, ref_padded.shape[-1] - 1)
    bi = jnp.arange(B)[:, None, None, None]
    win = ref_padded[bi, rows[:, :, :, None], cols[:, :, None, :]]
    return interp_block_dyn(win, kx, ky, bd)


def _mc_window(ref_padded, y0, x0, mv8, frame_h: int, frame_w: int,
               bs: int, ss: int, kern):
    """Shared UMV clamp + window gather of predict_inter_blocks;
    returns (win [B,N,bs+7,bs+7], kx, ky)."""
    bs_l = bs << ss
    ly0, lx0 = y0 << ss, x0 << ss
    q4r = mv8[..., 0] * (1 << (1 - ss))
    q4c = mv8[..., 1] * (1 << (1 - ss))
    spel = (4 + bs) << 4
    mb_to_left = -(lx0 * 8) * (1 << (1 - ss))
    mb_to_right = ((frame_w - bs_l - lx0) * 8) * (1 << (1 - ss))
    mb_to_top = -(ly0 * 8) * (1 << (1 - ss))
    mb_to_bottom = ((frame_h - bs_l - ly0) * 8) * (1 << (1 - ss))
    q4c = _clamp_q4(q4c, mb_to_left - spel, mb_to_right + spel - 16)
    q4r = _clamp_q4(q4r, mb_to_top - spel, mb_to_bottom + spel - 16)
    iy = y0 + (q4r >> 4)
    ix = x0 + (q4c >> 4)
    ky = kern[q4r & 15]
    kx = kern[q4c & 15]
    B = ref_padded.shape[0]
    ar = jnp.arange(bs + 7)
    rows = iy[..., None] + (MV_PRED_PAD - 3) + ar
    cols = ix[..., None] + (MV_PRED_PAD - 3) + ar
    rows = jnp.clip(rows, 0, ref_padded.shape[-2] - 1)
    cols = jnp.clip(cols, 0, ref_padded.shape[-1] - 1)
    bi = jnp.arange(B)[:, None, None, None]
    win = ref_padded[bi, rows[:, :, :, None], cols[:, :, None, :]]
    return win, kx, ky


@partial(jax.jit, static_argnames=("bs", "ss", "bd", "filt"))
def predict_inter_blocks_compound(ref0p, ref1p, y0, x0, mv8a, mv8b,
                                  frame_h: int, frame_w: int, bs: int,
                                  ss: int = 0, bd: int = 8,
                                  filt: int = 0):
    """COMPOUND_AVERAGE prediction from two references (normative
    intermediate precision, EbInterPrediction.c jnt convolve path)."""
    kern = jnp.asarray(kernels(filt))
    w0, kx0, ky0 = _mc_window(ref0p, y0, x0, mv8a, frame_h, frame_w, bs,
                              ss, kern)
    w1, kx1, ky1 = _mc_window(ref1p, y0, x0, mv8b, frame_h, frame_w, bs,
                              ss, kern)
    r0 = interp_block_dyn_mid(w0, kx0, ky0, bd)
    r1 = interp_block_dyn_mid(w1, kx1, ky1, bd)
    return compound_average(r0, r1, bd)


def predict_inter_block_np(ref_padded: np.ndarray, y0: int, x0: int,
                           mv8, frame_h: int, frame_w: int, bs: int,
                           ss: int = 0, bd: int = 8, filt: int = 0,
                           pad: int = MV_PRED_PAD) -> np.ndarray:
    """Host (numpy) twin of predict_inter_blocks for one block — used by
    the sequential research decoder.  Bit-exact with the jitted path."""
    kern = kernels(filt)
    bs_l = bs << ss
    ly0, lx0 = y0 << ss, x0 << ss
    q4r = int(mv8[0]) * (1 << (1 - ss))
    q4c = int(mv8[1]) * (1 << (1 - ss))
    spel = (4 + bs) << 4
    mb_to_left = -(lx0 * 8) * (1 << (1 - ss))
    mb_to_right = ((frame_w - bs_l - lx0) * 8) * (1 << (1 - ss))
    mb_to_top = -(ly0 * 8) * (1 << (1 - ss))
    mb_to_bottom = ((frame_h - bs_l - ly0) * 8) * (1 << (1 - ss))
    q4c = min(max(q4c, mb_to_left - spel), mb_to_right + spel - 16)
    q4r = min(max(q4r, mb_to_top - spel), mb_to_bottom + spel - 16)
    iy = y0 + (q4r >> 4)
    ix = x0 + (q4c >> 4)
    ky = kern[q4r & 15].astype(np.int64)
    kx = kern[q4c & 15].astype(np.int64)
    win = _win_np(ref_padded, iy, ix, bs, pad)
    hsum = sum(int(kx[k]) * win[:, k:k + bs] for k in range(8)) + \
        (1 << (bd + FILTER_BITS - 1))
    im = (hsum + (1 << (ROUND0 - 1))) >> ROUND0
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    vsum = sum(int(ky[k]) * im[k:k + bs, :] for k in range(8)) + \
        (1 << offset_bits)
    res = ((vsum + (1 << (ROUND1 - 1))) >> ROUND1) - \
        ((1 << (offset_bits - ROUND1)) + (1 << (offset_bits - ROUND1 - 1)))
    return np.clip(res, 0, (1 << bd) - 1).astype(np.int32)


def _win_np(ref_padded, iy, ix, bs, pad):
    """Window gather with index clamping (same as the jitted path's
    jnp.clip): reads past the padded border land on the border replica
    row/col, which has identical values by edge extension."""
    rows = np.clip(np.arange(iy + pad - 3, iy + pad + bs + 4),
                   0, ref_padded.shape[0] - 1)
    cols = np.clip(np.arange(ix + pad - 3, ix + pad + bs + 4),
                   0, ref_padded.shape[1] - 1)
    return ref_padded[np.ix_(rows, cols)].astype(np.int64)


def _predict_mid_np(ref_padded, y0, x0, mv8, frame_h, frame_w, bs,
                    ss, bd, pad, filt=0):
    """Compound intermediate for one block (numpy twin of
    interp_block_dyn_mid)."""
    kern = kernels(filt)
    bs_l = bs << ss
    ly0, lx0 = y0 << ss, x0 << ss
    q4r = int(mv8[0]) * (1 << (1 - ss))
    q4c = int(mv8[1]) * (1 << (1 - ss))
    spel = (4 + bs) << 4
    mb_to_left = -(lx0 * 8) * (1 << (1 - ss))
    mb_to_right = ((frame_w - bs_l - lx0) * 8) * (1 << (1 - ss))
    mb_to_top = -(ly0 * 8) * (1 << (1 - ss))
    mb_to_bottom = ((frame_h - bs_l - ly0) * 8) * (1 << (1 - ss))
    q4c = min(max(q4c, mb_to_left - spel), mb_to_right + spel - 16)
    q4r = min(max(q4r, mb_to_top - spel), mb_to_bottom + spel - 16)
    iy = y0 + (q4r >> 4)
    ix = x0 + (q4c >> 4)
    ky = kern[q4r & 15].astype(np.int64)
    kx = kern[q4c & 15].astype(np.int64)
    win = _win_np(ref_padded, iy, ix, bs, pad)
    hsum = sum(int(kx[k]) * win[:, k:k + bs] for k in range(8)) + \
        (1 << (bd + FILTER_BITS - 1))
    im = (hsum + (1 << (ROUND0 - 1))) >> ROUND0
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    vsum = sum(int(ky[k]) * im[k:k + bs, :] for k in range(8)) + \
        (1 << offset_bits)
    return (vsum + (1 << (COMPOUND_ROUND1 - 1))) >> COMPOUND_ROUND1


def predict_inter_block_np_compound(ref0p, ref1p, y0, x0, mv8a, mv8b,
                                    frame_h, frame_w, bs, ss=0, bd=8,
                                    pad=MV_PRED_PAD, filt=0):
    """Host twin of predict_inter_blocks_compound (COMPOUND_AVERAGE)."""
    r0 = _predict_mid_np(ref0p, y0, x0, mv8a, frame_h, frame_w, bs, ss,
                         bd, pad, filt)
    r1 = _predict_mid_np(ref1p, y0, x0, mv8b, frame_h, frame_w, bs, ss,
                         bd, pad, filt)
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    round_offset = ((1 << (offset_bits - COMPOUND_ROUND1)) +
                    (1 << (offset_bits - COMPOUND_ROUND1 - 1)))
    round_bits = 2 * FILTER_BITS - ROUND0 - COMPOUND_ROUND1
    tmp = ((r0 + r1) >> 1) - round_offset
    out = (tmp + (1 << (round_bits - 1))) >> round_bits
    return np.clip(out, 0, (1 << bd) - 1).astype(np.int32)


def pad_plane_np(plane: np.ndarray, pad: int = MV_PRED_PAD) -> np.ndarray:
    return np.pad(plane, pad, mode="edge")

"""Film grain synthesis core — AV1 spec §7.18.3; reference
/root/reference/Source/Lib/Common/Codec/grainSynthesis.c.

Components (each bit-exact vs the reference, tests/test_film_grain.py):
- the 16-bit LFSR random generator and gaussian sequence draw;
- AR-filtered luma/chroma grain template generation (host numpy — the
  template is one small 73x82 block per grain table, inherently sequential);
- piecewise-linear scaling LUTs and the per-block noise blending
  (vectorized — this is the per-pixel hot part).

Whole-frame assembly with subblock overlap lands with the film-grain
encoder integration (next round).
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np


@lru_cache(maxsize=None)
def gaussian_sequence() -> np.ndarray:
    d = np.load(Path(__file__).parent.parent / "spec/data/film_grain.npz")
    return d["gaussian_sequence"].astype(np.int32)


class GrainRng:
    """16-bit LFSR (grainSynthesis.c:360-378)."""

    def __init__(self, seed: int):
        self.reg = seed & 0xFFFF

    def reseed_line(self, luma_line: int, seed: int):
        self.reg = seed & 0xFFFF
        luma_num = luma_line >> 5
        self.reg ^= ((luma_num * 37 + 178) & 255) << 8
        self.reg ^= (luma_num * 173 + 105) & 255

    def bits(self, n: int) -> int:
        r = self.reg
        bit = ((r >> 0) ^ (r >> 1) ^ (r >> 3) ^ (r >> 12)) & 1
        r = ((r >> 1) | (bit << 15)) & 0xFFFF
        self.reg = r
        return (r >> (16 - n)) & ((1 << n) - 1)


def _pred_pos(lag: int):
    pos = []
    for row in range(-lag, 0):
        for col in range(-lag, lag + 1):
            pos.append((row, col, 0))
    for col in range(-lag, 0):
        pos.append((0, col, 0))
    return pos


def generate_luma_grain(params: dict) -> np.ndarray:
    """73x82 luma grain template (8-bit geometry), int32."""
    bd = params["bit_depth"]
    if params["num_y_points"] == 0:
        return np.zeros((73, 82), np.int32)
    gauss_shift = 12 - bd + params["grain_scale_shift"]
    lag = params["ar_coeff_lag"]
    coeffs = params["ar_coeffs_y"]
    shift = params["ar_coeff_shift"]
    gmin = -(128 << (bd - 8))
    gmax = (256 << (bd - 8)) - 1 - (128 << (bd - 8))
    h, w = 73, 82
    rng = GrainRng(params["random_seed"])
    gs = gaussian_sequence()
    blk = np.empty((h, w), np.int32)
    for i in range(h):
        for j in range(w):
            blk[i, j] = (int(gs[rng.bits(11)]) +
                         ((1 << gauss_shift) >> 1)) >> gauss_shift
    pos = _pred_pos(lag)
    rnd = 1 << (shift - 1)
    for i in range(3, h):
        for j in range(3, w - 3):
            wsum = 0
            for p, (dr, dc, _) in enumerate(pos):
                wsum += coeffs[p] * blk[i + dr, j + dc]
            blk[i, j] = min(max(blk[i, j] + ((wsum + rnd) >> shift), gmin),
                            gmax)
    return blk


def generate_chroma_grain(params: dict, luma_blk: np.ndarray,
                          subsamp: int = 1):
    """(cb, cr) grain templates for 4:2:0 (subsamp 1): 38x44."""
    bd = params["bit_depth"]
    gauss_shift = 12 - bd + params["grain_scale_shift"]
    lag = params["ar_coeff_lag"]
    shift = params["ar_coeff_shift"]
    gmin = -(128 << (bd - 8))
    gmax = (256 << (bd - 8)) - 1 - (128 << (bd - 8))
    # chroma block geometry for 4:2:0: 3+3+32 = 38 rows, 3+3+32+3+3 = 44 cols
    h, w = 38, 44
    gs = gaussian_sequence()
    cb = np.zeros((h, w), np.int32)
    cr = np.zeros((h, w), np.int32)
    if params["num_cb_points"] or params["chroma_scaling_from_luma"]:
        rng = GrainRng(0)
        rng.reseed_line(7 << 5, params["random_seed"])
        for i in range(h):
            for j in range(w):
                cb[i, j] = (int(gs[rng.bits(11)]) +
                            ((1 << gauss_shift) >> 1)) >> gauss_shift
    if params["num_cr_points"] or params["chroma_scaling_from_luma"]:
        rng = GrainRng(0)
        rng.reseed_line(11 << 5, params["random_seed"])
        for i in range(h):
            for j in range(w):
                cr[i, j] = (int(gs[rng.bits(11)]) +
                            ((1 << gauss_shift) >> 1)) >> gauss_shift
    pos = _pred_pos(lag)
    has_luma = params["num_y_points"] > 0
    rnd = 1 << (shift - 1)
    apply_cb = params["num_cb_points"] or params["chroma_scaling_from_luma"]
    apply_cr = params["num_cr_points"] or params["chroma_scaling_from_luma"]
    for i in range(3, h):
        for j in range(3, w - 3):
            wcb = wcr = 0
            for p, (dr, dc, _) in enumerate(pos):
                wcb += params["ar_coeffs_cb"][p] * cb[i + dr, j + dc]
                wcr += params["ar_coeffs_cr"][p] * cr[i + dr, j + dc]
            if has_luma:
                ly = ((i - 3) << subsamp) + 3
                lx = ((j - 3) << subsamp) + 3
                av = int(luma_blk[ly:ly + subsamp + 1,
                                  lx:lx + subsamp + 1].sum())
                av = (av + ((1 << (2 * subsamp)) >> 1)) >> (2 * subsamp)
                p_idx = len(pos)
                wcb += params["ar_coeffs_cb"][p_idx] * av
                wcr += params["ar_coeffs_cr"][p_idx] * av
            if apply_cb:
                cb[i, j] = min(max(cb[i, j] + ((wcb + rnd) >> shift), gmin),
                               gmax)
            if apply_cr:
                cr[i, j] = min(max(cr[i, j] + ((wcr + rnd) >> shift), gmin),
                               gmax)
    return cb, cr


def init_scaling_lut(points) -> np.ndarray:
    """Piecewise-linear scaling LUT (grainSynthesis.c:506-530)."""
    lut = np.zeros(256, np.int32)
    n = len(points)
    if n == 0:
        return lut
    lut[:points[0][0]] = points[0][1]
    for p in range(n - 1):
        dy = points[p + 1][1] - points[p][1]
        dx = points[p + 1][0] - points[p][0]
        delta = dy * ((65536 + (dx >> 1)) // dx)
        for x in range(dx):
            lut[points[p][0] + x] = points[p][1] + ((x * delta + 32768) >> 16)
    lut[points[n - 1][0]:] = points[n - 1][1]
    return lut


def add_noise_to_block(params: dict, luma, cb, cr, luma_grain, cb_grain,
                       cr_grain, luts, subsamp: int = 1):
    """Vectorized add_noise_to_block (8-bit, grainSynthesis.c:541-640);
    mutates nothing — returns (luma', cb', cr')."""
    lut_y, lut_cb, lut_cr = luts
    sh = params["scaling_shift"]
    rnd = 1 << (sh - 1)
    if params["clip_to_restricted_range"]:
        min_l, max_l, min_c, max_c = 16, 235, 16, 240
    else:
        min_l, max_l, min_c, max_c = 0, 255, 0, 255
    if params["chroma_scaling_from_luma"]:
        cb_mult, cb_lmult, cb_off = 0, 64, 0
        cr_mult, cr_lmult, cr_off = 0, 64, 0
    else:
        cb_mult = params["cb_mult"] - 128
        cb_lmult = params["cb_luma_mult"] - 128
        cb_off = params["cb_offset"] - 256
        cr_mult = params["cr_mult"] - 128
        cr_lmult = params["cr_luma_mult"] - 128
        cr_off = params["cr_offset"] - 256

    luma = luma.astype(np.int32)
    out_l = luma
    if params["num_y_points"] > 0:
        s = lut_y[luma]
        out_l = np.clip(luma + ((s * luma_grain + rnd) >> sh), min_l, max_l)

    if subsamp:
        avg = (luma[::2, ::2] + luma[::2, 1::2] + 1) >> 1
    else:
        avg = luma
    res = [out_l]
    for plane, grain, mult, lmult, off, lut, apply in (
            (cb, cb_grain, cb_mult, cb_lmult, cb_off, lut_cb,
             params["num_cb_points"] or params["chroma_scaling_from_luma"]),
            (cr, cr_grain, cr_mult, cr_lmult, cr_off, lut_cr,
             params["num_cr_points"] or params["chroma_scaling_from_luma"])):
        plane = plane.astype(np.int32)
        if apply:
            idx = np.clip(((avg * lmult + mult * plane) >> 6) + off, 0, 255)
            s = lut[idx]
            plane = np.clip(plane + ((s * grain + rnd) >> sh), min_c, max_c)
        res.append(plane)
    return tuple(res)

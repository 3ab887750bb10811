"""Batched AV1 subpel convolution (motion compensation) — spec §7.11.3.

Reference behavior: /root/reference/Source/Lib/Common/Codec/
EbInterPrediction.c:320-427 (svt_av1_convolve_2d_sr_c / x_sr / y_sr).

Batched tap-shift formulation: the 8-tap separable filter is 8 shifted adds
per axis over the whole block batch (no per-pixel loops) — fuses into a
handful of VPU ops under XLA; the intermediate keeps the spec's exact
integer rounding offsets.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import jax.numpy as jnp
import numpy as np

FILTER_BITS = 7
ROUND0 = 3
ROUND1 = 11

EIGHTTAP_REGULAR, EIGHTTAP_SMOOTH, MULTITAP_SHARP, BILINEAR = range(4)
_NAMES = {0: "regular", 1: "smooth", 2: "sharp", 3: "bilinear"}


@lru_cache(maxsize=None)
def kernels(filter_type: int) -> np.ndarray:
    """[16 phases, 8 taps] int16 (normative subpel filter kernels)."""
    d = np.load(Path(__file__).parent.parent / "spec/data/interp_filters.npz")
    return d[_NAMES[filter_type]].astype(np.int32)


def _tap_sum(x, kern, axis):
    """8-tap filter along `axis`; x must have 7 extra samples along it."""
    n = x.shape[axis] - 7
    out = None
    for k in range(8):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + n)
        term = int(kern[k]) * x[tuple(sl)]
        out = term if out is None else out + term
    return out


def convolve_2d(src, filter_x: int, filter_y: int, subpel_x: int,
                subpel_y: int, bd: int = 8):
    """src [..., h+7, w+7] int32 (3 pixels above/left of the block start,
    4 after) → [..., h, w] prediction.

    subpel_x/y are 4-bit phases (0 = integer position; note the reference
    still runs the [0,0,0,128,...] kernel in the 2D path when phase 0).
    """
    kx = kernels(filter_x)[subpel_x & 15]
    ky = kernels(filter_y)[subpel_y & 15]
    x = src.astype(jnp.int32)

    # horizontal on all h+7 rows
    hsum = _tap_sum(x, kx, axis=-1) + (1 << (bd + FILTER_BITS - 1))
    im = (hsum + (1 << (ROUND0 - 1))) >> ROUND0

    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    vsum = _tap_sum(im, ky, axis=-2) + (1 << offset_bits)
    res = ((vsum + (1 << (ROUND1 - 1))) >> ROUND1) - \
        ((1 << (offset_bits - ROUND1)) + (1 << (offset_bits - ROUND1 - 1)))
    bits = 2 * FILTER_BITS - ROUND0 - ROUND1
    if bits > 0:
        res = (res + (1 << (bits - 1))) >> bits
    return jnp.clip(res, 0, (1 << bd) - 1)


def convolve_x(src, filter_x: int, subpel_x: int, bd: int = 8):
    """Horizontal-only subpel (src [..., h, w+7])."""
    kx = kernels(filter_x)[subpel_x & 15]
    res = _tap_sum(src.astype(jnp.int32), kx, axis=-1)
    res = (res + (1 << (ROUND0 - 1))) >> ROUND0
    bits = FILTER_BITS - ROUND0
    res = (res + (1 << (bits - 1))) >> bits
    return jnp.clip(res, 0, (1 << bd) - 1)


def convolve_y(src, filter_y: int, subpel_y: int, bd: int = 8):
    """Vertical-only subpel (src [..., h+7, w])."""
    ky = kernels(filter_y)[subpel_y & 15]
    res = _tap_sum(src.astype(jnp.int32), ky, axis=-2)
    res = (res + (1 << (FILTER_BITS - 1))) >> FILTER_BITS
    return jnp.clip(res, 0, (1 << bd) - 1)

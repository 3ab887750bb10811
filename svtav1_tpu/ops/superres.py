"""Batched super-resolution horizontal upscale — AV1 spec §7.16; reference
/root/reference/Source/Lib/Common/Codec/EbSuperRes.c:53-92
(av1_convolve_horiz_rs_c, normative 8-tap 1/64-phase resampler).

The fractional stepping (x_step_qn) produces per-output-column static
(source base, filter phase) maps — the whole upscale is 8 gathers + FMA
over all rows/frames at once.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import jax.numpy as jnp
import numpy as np

RS_SCALE_SUBPEL_BITS = 14
RS_SCALE_SUBPEL_MASK = (1 << RS_SCALE_SUBPEL_BITS) - 1
RS_SCALE_EXTRA_BITS = RS_SCALE_SUBPEL_BITS - 6   # RS_SUBPEL_BITS = 6
RS_SCALE_EXTRA_OFF = 1 << (RS_SCALE_EXTRA_BITS - 1)
TAPS = 8
FILTER_BITS = 7
SCALE_NUMERATOR = 8


@lru_cache(maxsize=None)
def filters() -> np.ndarray:
    d = np.load(Path(__file__).parent.parent / "spec/data/superres.npz")
    return d["resize_filter_normative"].astype(np.int32)


def upscale_step_x0(in_w: int, out_w: int):
    """(x_step_qn, x0_qn) per spec (EbSuperRes.c:43-53)."""
    step = ((in_w << RS_SCALE_SUBPEL_BITS) + out_w // 2) // out_w
    err = out_w * step - (in_w << RS_SCALE_SUBPEL_BITS)
    x0 = (-((out_w - in_w) << (RS_SCALE_SUBPEL_BITS - 1)) + out_w // 2) \
        // out_w + RS_SCALE_EXTRA_OFF - err // 2
    return step, x0 & RS_SCALE_SUBPEL_MASK


@lru_cache(maxsize=None)
def _maps(in_w: int, out_w: int):
    step, x0 = upscale_step_x0(in_w, out_w)
    xq = x0 + step * np.arange(out_w)
    base = (xq >> RS_SCALE_SUBPEL_BITS) - (TAPS // 2 - 1)   # leftmost tap
    phase = (xq & RS_SCALE_SUBPEL_MASK) >> RS_SCALE_EXTRA_BITS
    weights = filters()[phase]                               # [out_w, 8]
    return base.astype(np.int64), weights


def upscale_horiz_normative(src, out_w: int, pad: int = 8, bd: int = 8):
    """src [..., h, in_w + 2*pad] int32, edge-replicated by `pad` on both
    sides → upscaled [..., h, out_w]."""
    in_w = src.shape[-1] - 2 * pad
    base, weights = _maps(in_w, out_w)
    x = src.astype(jnp.int32)
    acc = None
    for k in range(TAPS):
        idx = jnp.asarray(base + pad + k)
        v = jnp.take(x, idx, axis=-1)
        term = v * jnp.asarray(weights[:, k])
        acc = term if acc is None else acc + term
    out = (acc + (1 << (FILTER_BITS - 1))) >> FILTER_BITS
    return jnp.clip(out, 0, (1 << bd) - 1)

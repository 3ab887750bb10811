"""Batched CCSO (Cross-Component Sample Offset) — the fork's grafted AV2/AVM
coding tool (SURVEY.md §2.6; reference
/root/reference/Source/Lib/Common/Codec/EbCcso.c:204-296).

For each filtered pixel: take the co-located luma sample, classify the two
filter-support neighbor differences into edge classes, bucket the luma into
a band, and add the signaled LUT offset.  One gather + compare network over
the whole plane.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# (dy, dx) neighbor pair per ext_filter_support (EbCcso.c:204-234)
SAMPLE_POS = [
    ((-1, 0), (1, 0)), ((-1, -1), (1, 1)), ((0, -1), (0, 1)),
    ((1, -1), (-1, 1)), ((0, -3), (0, 3)), ((0, -5), (0, 5)),
]

CCSO_PAD = 5  # luma border needed for the widest support


def ccso_filter_plane(dst, src_y_ext, offset_lut, *, filter_support: int,
                      quant_step: int, max_band_log2: int, edge_clf: int = 0,
                      bo_only: bool = False, y_uv_scale: int = 0,
                      bit_depth: int = 8):
    """Apply CCSO to a plane.

    dst        [..., h, w] int32 — plane being corrected (post-CDEF recon).
    src_y_ext  [..., H+2*PAD, W+2*PAD] int32 — extended luma recon where
               (H, W) = (h, w) << y_uv_scale (420 chroma → scale 1).
    offset_lut [128] int8-ish — (band << 4) + (c0 << 2) + c1 indexed offsets.
    """
    h, w = dst.shape[-2], dst.shape[-1]
    sc = y_uv_scale
    ys = np.arange(h) << sc
    xs = np.arange(w) << sc

    def luma_at(dy, dx):
        return src_y_ext[..., CCSO_PAD + dy + ys[:, None],
                         CCSO_PAD + dx + xs[None, :]]

    center = luma_at(0, 0)
    if bo_only:
        c0 = jnp.zeros_like(center)
        c1 = jnp.zeros_like(center)
    else:
        (dy0, dx0), (dy1, dx1) = SAMPLE_POS[filter_support]
        cls = []
        for dy, dx in ((dy0, dx0), (dy1, dx1)):
            d = luma_at(dy, dx) - center
            if edge_clf == 0:
                c = jnp.where(d > quant_step, 2,
                              jnp.where(d < -quant_step, 0, 1))
            else:
                c = jnp.where(d < -quant_step, 0, 1)
            cls.append(c)
        c0, c1 = cls

    shift_bits = bit_depth - max_band_log2
    band = jnp.zeros_like(center) if max_band_log2 == 0 else \
        center >> shift_bits
    lut_idx = (band << 4) + (c0 << 2) + c1
    off = jnp.take(jnp.asarray(offset_lut, jnp.int32), lut_idx)
    return jnp.clip(dst + off, 0, (1 << bit_depth) - 1)

"""Batched alpha-64 blending (compound/masked/OBMC prediction building block).

Reference: /root/reference/Source/Lib/Common/Codec/EbBlend_a64_mask.c.
blend(m, a, b) = round2(m*a + (64-m)*b, 6), with optional 2x-subsampled
mask averaging for chroma planes.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_ALPHA = 64
ROUND_BITS = 6


def _blend(m, a, b):
    return (m * a + (MAX_ALPHA - m) * b + (1 << (ROUND_BITS - 1))) \
        >> ROUND_BITS


def blend_a64_mask(src0, src1, mask, subw: int = 0, subh: int = 0):
    """src0/src1 [..., h, w] int32; mask [..., h<<subh, w<<subw] → blended."""
    a = src0.astype(jnp.int32)
    b = src1.astype(jnp.int32)
    m = mask.astype(jnp.int32)
    if subw == 0 and subh == 0:
        mm = m
    elif subw == 1 and subh == 1:
        mm = (m[..., ::2, ::2] + m[..., 1::2, ::2] + m[..., ::2, 1::2] +
              m[..., 1::2, 1::2] + 2) >> 2
    elif subw == 1 and subh == 0:
        mm = (m[..., :, ::2] + m[..., :, 1::2] + 1) >> 1
    else:
        mm = (m[..., ::2, :] + m[..., 1::2, :] + 1) >> 1
    return _blend(mm, a, b)


def blend_a64_hmask(src0, src1, mask_row):
    """Horizontal 1D mask [w] applied to all rows."""
    return _blend(mask_row.astype(jnp.int32)[None, :], src0.astype(jnp.int32),
                  src1.astype(jnp.int32))


def blend_a64_vmask(src0, src1, mask_col):
    """Vertical 1D mask [h] applied to all columns."""
    return _blend(mask_col.astype(jnp.int32)[:, None], src0.astype(jnp.int32),
                  src1.astype(jnp.int32))

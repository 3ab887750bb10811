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

# quantizer step per signaled quant_idx (EbCcso.c ccso_frame quant_sz)
CCSO_QUANT_SZ = (16, 8, 32, 64)

# signalable per-class offsets (EbEntropyCoding.c:2366 ccso_offset)
CCSO_OFFSETS = (0, 1, -1, 3, -3, 7, -7, -10)

CCSO_UNIT_LOG2 = 8  # 256x256 luma px per on/off flag (CCSO_BLK_SIZE 7 + 1)


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


def ccso_apply_frame(planes, pre_cdef_y, info, bit_depth: int = 8):
    """Whole-frame CCSO apply with per-256x256-luma-unit on/off masking.

    Shared by the encoder in-loop path and the decoder (reference dataflow:
    EbCdefProcess.c:497 captures the pre-CDEF luma into ext_rec_y, then
    ccso_frame/EbCcso.c:626 corrects the post-CDEF planes; per-unit flags
    live in the mi grid, EbCcso.c:312-320).

    planes      (y, u, v) post-CDEF recon, numpy int arrays.
    pre_cdef_y  post-deblock (pre-CDEF) luma recon — the classifier input.
    info        {'planes': [None | {'quant_idx', 'support', 'edge_clf',
                 'max_band_log2', 'bo_only', 'lut'[128], 'flags'[uh,uw]}]}.
    """
    ext = np.pad(np.asarray(pre_cdef_y, np.int64).astype(np.int32),
                 CCSO_PAD, mode="edge")
    ext_j = jnp.asarray(ext, jnp.int32)
    out = []
    for p, plane in enumerate(planes):
        pi = info["planes"][p] if info else None
        if pi is None:
            out.append(plane)
            continue
        sc = 0 if p == 0 else 1
        pl = np.asarray(plane)
        filt = np.asarray(ccso_filter_plane(
            jnp.asarray(pl, jnp.int32), ext_j,
            np.asarray(pi["lut"], np.int32),
            filter_support=int(pi["support"]),
            quant_step=CCSO_QUANT_SZ[int(pi["quant_idx"])],
            max_band_log2=int(pi["max_band_log2"]),
            edge_clf=int(pi["edge_clf"]),
            bo_only=bool(pi.get("bo_only", 0)),
            y_uv_scale=sc, bit_depth=bit_depth))
        u = 1 << (CCSO_UNIT_LOG2 - sc)
        h, w = pl.shape
        m = np.repeat(np.repeat(np.asarray(pi["flags"], bool), u, 0),
                      u, 1)[:h, :w]
        out.append(np.where(m, filt, pl).astype(pl.dtype))
    return tuple(out)

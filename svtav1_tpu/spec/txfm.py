"""Normative AV1 transform configuration (spec §7.13.2-7.13.3).

Geometry, 1D-type mapping, shifts, cos bits and the butterfly stage networks
for every transform size/type.  The stage networks are normative — every
conforming AV1 codec reproduces them bit-exactly including intermediate
roundings — and are stored as data in ``data/txfm_stages.json`` (structure
verified against the reference implementation,
/root/reference/Source/Lib/Common/Codec/EbInvTransforms.c and
.../Encoder/Codec/EbTransforms.c).

The runtime representation is batched-array friendly: each stage becomes five
numpy vectors (ia, wa, ib, wb, mode) so a whole stage is one gather + fused
multiply-add over an arbitrary batch of vectors — the TPU-native shape of this
math (the reference instead has ~30k LoC of per-ISA scalar/SIMD variants).
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

import numpy as np

# ---------------------------------------------------------------------------
# TX size / type enums (AV1 spec §6.8.21, §8.3.1)
# ---------------------------------------------------------------------------

TX_4X4, TX_8X8, TX_16X16, TX_32X32, TX_64X64 = 0, 1, 2, 3, 4
TX_4X8, TX_8X4, TX_8X16, TX_16X8, TX_16X32 = 5, 6, 7, 8, 9
TX_32X16, TX_32X64, TX_64X32, TX_4X16, TX_16X4 = 10, 11, 12, 13, 14
TX_8X32, TX_32X8, TX_16X64, TX_64X16 = 15, 16, 17, 18
TX_SIZES_ALL = 19

TX_W = [4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32, 32, 64, 4, 16, 8, 32, 16, 64]
TX_H = [4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16, 64, 32, 16, 4, 32, 8, 64, 16]

# Transform types (spec §6.8.21)
(DCT_DCT, ADST_DCT, DCT_ADST, ADST_ADST, FLIPADST_DCT, DCT_FLIPADST,
 FLIPADST_FLIPADST, ADST_FLIPADST, FLIPADST_ADST, IDTX, V_DCT, H_DCT,
 V_ADST, H_ADST, V_FLIPADST, H_FLIPADST) = range(16)
TX_TYPES = 16

# 1D transform kinds
DCT_1D, ADST_1D, FLIPADST_1D, IDTX_1D = range(4)

# chroma-intra implied transform type per uv_mode (spec compute_tx_type /
# reference intra_mode_to_tx_type, EbCommonUtils.h:67-87): chroma intra
# txbs do NOT signal a tx type — it derives from the uv prediction mode,
# clamped to DCT_DCT when the (sqr-up) tx size exceeds 16x16 or the set
# disallows it.  All DTT4 members share the default scan and the 2D
# coefficient-context class, so entropy coding is unaffected.
UV_MODE_TX_TYPE = (DCT_DCT,    # DC
                   ADST_DCT,   # V
                   DCT_ADST,   # H
                   DCT_DCT,    # D45
                   ADST_ADST,  # D135
                   ADST_DCT,   # D113
                   DCT_ADST,   # D157
                   DCT_ADST,   # D203
                   ADST_DCT,   # D67
                   ADST_ADST,  # SMOOTH
                   ADST_DCT,   # SMOOTH_V
                   DCT_ADST,   # SMOOTH_H
                   ADST_ADST)  # PAETH


def uv_intra_tx_type(uv_mode: int, tx_size: int) -> int:
    """Implied chroma-intra tx type, with the size clamp (sqr-up > 16x16
    or a set without the type -> DCT_DCT)."""
    from . import tables as _tbl
    if _tbl.txsize_sqr_up(tx_size) > TX_16X16:
        return DCT_DCT
    return UV_MODE_TX_TYPE[uv_mode]

# vertical (column) / horizontal (row) 1D kind per 2D type
VTX_TAB = [DCT_1D, ADST_1D, DCT_1D, ADST_1D, FLIPADST_1D, DCT_1D,
           FLIPADST_1D, ADST_1D, FLIPADST_1D, IDTX_1D, DCT_1D, IDTX_1D,
           ADST_1D, IDTX_1D, FLIPADST_1D, IDTX_1D]
HTX_TAB = [DCT_1D, DCT_1D, ADST_1D, ADST_1D, DCT_1D, FLIPADST_1D,
           FLIPADST_1D, FLIPADST_1D, ADST_1D, IDTX_1D, IDTX_1D, DCT_1D,
           IDTX_1D, ADST_1D, IDTX_1D, FLIPADST_1D]

# Per-size inverse shifts [row, col] (spec Transform_Row_Shift; values match
# EbInvTransforms.c:17-35) and forward shifts [pre-col, post-col, post-row]
# (EbTransforms.h:26-44).
INV_SHIFT = {
    (4, 4): (0, -4), (8, 8): (-1, -4), (16, 16): (-2, -4), (32, 32): (-2, -4),
    (64, 64): (-2, -4), (4, 8): (0, -4), (8, 4): (0, -4), (8, 16): (-1, -4),
    (16, 8): (-1, -4), (16, 32): (-1, -4), (32, 16): (-1, -4),
    (32, 64): (-1, -4), (64, 32): (-1, -4), (4, 16): (-1, -4),
    (16, 4): (-1, -4), (8, 32): (-2, -4), (32, 8): (-2, -4),
    (16, 64): (-2, -4), (64, 16): (-2, -4),
}
FWD_SHIFT = {
    (4, 4): (2, 0, 0), (8, 8): (2, -1, 0), (16, 16): (2, -2, 0),
    (32, 32): (2, -4, 0), (64, 64): (0, -2, -2), (4, 8): (2, -1, 0),
    (8, 4): (2, -1, 0), (8, 16): (2, -2, 0), (16, 8): (2, -2, 0),
    (16, 32): (2, -4, 0), (32, 16): (2, -4, 0), (32, 64): (0, -2, -2),
    (64, 32): (2, -4, -2), (4, 16): (2, -1, 0), (16, 4): (2, -1, 0),
    (8, 32): (2, -2, 0), (32, 8): (2, -2, 0), (16, 64): (0, -2, 0),
    (64, 16): (2, -4, 0),
}

INV_COS_BIT = 12
# forward cos bits indexed [log2(w)-2][log2(h)-2] (EbTransforms.h:46-49)
FWD_COS_BIT_COL = [[13, 13, 13, 0, 0], [13, 13, 13, 12, 0],
                   [13, 13, 13, 12, 13], [0, 13, 13, 12, 13],
                   [0, 0, 13, 12, 13]]
FWD_COS_BIT_ROW = [[13, 13, 12, 0, 0], [13, 13, 13, 12, 0],
                   [13, 13, 12, 13, 12], [0, 12, 13, 12, 11],
                   [0, 0, 12, 11, 10]]

NEW_SQRT2 = 5793       # 2^12 * sqrt(2)
NEW_INV_SQRT2 = 2896   # 2^12 / sqrt(2)
NEW_SQRT2_BITS = 12


@lru_cache(maxsize=None)
def _trig():
    return np.load(Path(__file__).parent / "data" / "trig_tables.npz")


def cospi_arr(cos_bit: int) -> np.ndarray:
    """cospi[i] ≈ cos(i*pi/128) * 2^cos_bit, i = 0..63 (normative constants)."""
    return _trig()["cospi"][cos_bit - 10].astype(np.int64)


def sinpi_arr(cos_bit: int) -> np.ndarray:
    """sinpi[i] ≈ sqrt2*sin(i*pi/9)*2/3 * 2^cos_bit (normative constants;
    note these are NOT pure roundings at every cos_bit — use the tables)."""
    return _trig()["sinpi"][cos_bit - 10].astype(np.int64)


def tx_flip(tx_type: int):
    """(ud_flip, lr_flip)."""
    return VTX_TAB[tx_type] == FLIPADST_1D, HTX_TAB[tx_type] == FLIPADST_1D


def rect_type_log_ratio(w: int, h: int) -> int:
    import math
    return int(math.log2(w)) - int(math.log2(h))


# ---------------------------------------------------------------------------
# Stage network compilation
# ---------------------------------------------------------------------------

MODE_ADD_CLAMP = 0   # out = clamp(wa*x[ia] + wb*x[ib])
MODE_BTF = 1         # out = round2(wa*x[ia] + wb*x[ib], cos_bit)
MODE_LIN = 2         # out = wa*x[ia] + wb*x[ib]   (no clamp, no round)

_DATA = Path(__file__).parent / "data" / "txfm_stages.json"


@lru_cache(maxsize=None)
def _raw_stages():
    return json.loads(_DATA.read_text())


_NAME = {
    ("dct", 4, "inv"): "svt_av1_idct4_new", ("dct", 8, "inv"): "svt_av1_idct8_new",
    ("dct", 16, "inv"): "svt_av1_idct16_new", ("dct", 32, "inv"): "svt_av1_idct32_new",
    ("dct", 64, "inv"): "svt_av1_idct64_new",
    ("adst", 8, "inv"): "svt_av1_iadst8_new", ("adst", 16, "inv"): "svt_av1_iadst16_new",
    ("dct", 4, "fwd"): "svt_av1_fdct4_new", ("dct", 8, "fwd"): "svt_av1_fdct8_new",
    ("dct", 16, "fwd"): "svt_av1_fdct16_new", ("dct", 32, "fwd"): "svt_av1_fdct32_new",
    ("dct", 64, "fwd"): "svt_av1_fdct64_new",
    ("adst", 8, "fwd"): "svt_av1_fadst8_new", ("adst", 16, "fwd"): "svt_av1_fadst16_new",
}


@lru_cache(maxsize=None)
def compiled_stages(kind: str, n: int, direction: str, cos_bit: int):
    """Compile the stage network to per-stage arrays (ia, wa, ib, wb, mode).

    Returns a tuple of stages; each stage is a 5-tuple of int32 np.ndarrays of
    length n (mode is int8).
    """
    rows_all = _raw_stages()[_NAME[(kind, n, direction)]]
    cospi = cospi_arr(cos_bit)
    out = []
    for stage in rows_all:
        ia = np.zeros(n, np.int32)
        wa = np.zeros(n, np.int32)
        ib = np.zeros(n, np.int32)
        wb = np.zeros(n, np.int32)
        mode = np.zeros(n, np.int8)
        for r, op in enumerate(stage):
            tag = op[0]
            if tag == "btf":
                (sa, ka), i0, (sb, kb), i1 = op[1], op[2], op[3], op[4]
                ia[r], ib[r] = i0, i1
                wa[r] = int(cospi[ka]) * (-1 if sa == "-c" else 1)
                wb[r] = int(cospi[kb]) * (-1 if sb == "-c" else 1)
                mode[r] = MODE_BTF
            elif tag == "add":
                _, s0, i0, s1, i1 = op
                ia[r], wa[r], ib[r], wb[r] = i0, s0, i1, s1
                mode[r] = MODE_ADD_CLAMP
            elif tag == "addnc":
                _, s0, i0, s1, i1 = op
                ia[r], wa[r], ib[r], wb[r] = i0, s0, i1, s1
                mode[r] = MODE_LIN
            elif tag == "pass":
                ia[r], wa[r] = op[1], 1
                mode[r] = MODE_LIN
            elif tag == "neg":
                ia[r], wa[r] = op[1], -1
                mode[r] = MODE_LIN
            else:
                raise ValueError(tag)
        out.append((ia, wa, ib, wb, mode))
    return tuple(out)


def opt_range(bd: int, is_col: bool) -> int:
    """Inverse-transform per-stage clamp range (EbInvTransforms.c:42-84)."""
    if bd == 8:
        return 16
    if bd == 10:
        return 16 if is_col else 18
    return 18 if is_col else 20

"""Inter-frame tile entropy coding (host pass over device MD results).

Role of the reference's entropy coding kernel for non-key frames
(EbEntropyCodingProcess.c:208 → svt_aom_write_sb → write_modes_b inter
path, EbEntropyCoding.c:5440): walks SBs in raster order, quads in
z-order, maintaining the mi grid, MV-prediction stacks and coefficient
contexts, and emits the arithmetic-coded tile.

Mode selection against the MV stack happens here: the device pass chooses
a motion vector; this pass codes it as NEARESTMV / NEARMV / GLOBALMV when
the value matches the corresponding predictor, NEWMV otherwise.
"""

from __future__ import annotations

import numpy as np

from ..ec import inter_modes as IM
from ..ec import modes as M
from ..ec.coeffs import write_coeffs_txb
from ..ec.mvpred import MiGrid, find_mv_stack
from ..ec.range_coder import RangeEncoder
from ..spec import mv as MV
from ..spec.cdf import CdfContext
from ..spec.txfm import TX_16X16, TX_32X32, DCT_DCT

BLK = 32
SB = 64


def choose_inter_mode(mv, res, gm=(0, 0)):
    """Match the block's mv against the stack predictors (the inverse of
    the decoder's assign_mv).  gm: the frame's TRANSLATION global mv for
    this ref (identity → (0,0)) — GLOBALMV decodes to it."""
    if tuple(mv) == res.nearest_mv:
        return MV.NEARESTMV, None
    if tuple(mv) == res.near_mv:
        return MV.NEARMV, None
    if tuple(mv) == tuple(gm):
        return MV.GLOBALMV, None
    # NEWMV predictor: precision-lowered stack[0] (spec assign_mv applies
    # lower_mv_precision to PredMv) == res.nearest_mv.
    return MV.NEWMV, res.nearest_mv


def _dc_sign_ctx(a_cul, a_avail, l_cul, l_avail) -> int:
    signs = 0
    for culs, avail in ((a_cul, a_avail), (l_cul, l_avail)):
        for c, av in zip(culs, avail):
            if av:
                s = int(c) >> 6
                signs += (1 if s == 2 else (-1 if s == 1 else 0))
    return 2 if signs > 0 else (1 if signs < 0 else 0)


def encode_inter_tile(width: int, height: int, qindex: int, cdf_update: bool,
                      y_cand, y_lev, u_lev, v_lev, mv8, cands, n_intra: int,
                      cdf_init=None, true_h: int = None, gm_mv=(0, 0)):
    """y_cand [bh,bw] candidate indices (>= n_intra → inter: n_intra=NEWMV,
    n_intra+1=GLOBALMV); mv8 [bh,bw,2] per-block ME mvs; cands = intra
    (mode, delta) list.  cdf_init: a CdfContext snapshot to start from
    (primary-ref inheritance) — defaults load from the standard tables.
    true_h: signaled frame height when `height` is the SB-padded plane
    height (bottom-edge partition rules, encoder/geometry.py FLAT_OK_M).
    Returns (payload bytes, frame-end CdfContext snapshot)."""
    true_h = height if true_h is None else true_h
    mi_cols, mi_rows = width // 4, true_h // 4
    sb_cols, sb_rows = width // SB, height // SB
    enc = RangeEncoder()
    cdf = (cdf_init.clone() if cdf_init is not None
           else CdfContext(qindex, update=cdf_update))
    grid = MiGrid(mi_rows, mi_cols)

    above_part = np.zeros(mi_cols, np.uint8)
    skip_grid = np.zeros((mi_rows, mi_cols), np.uint8)
    above_cul = {0: np.zeros(width // 4, np.uint8),
                 1: np.zeros(width // 8, np.uint8),
                 2: np.zeros(width // 8, np.uint8)}
    above_avail = {p: np.zeros_like(above_cul[p], bool) for p in range(3)}
    part_above_v, part_left_v = M.partition_ctx_value(BLK, BLK)

    for sb_r in range(sb_rows):
        left_part = np.zeros(SB // 4, np.uint8)
        left_cul = {0: np.zeros(SB // 4, np.uint8),
                    1: np.zeros(SB // 8, np.uint8),
                    2: np.zeros(SB // 8, np.uint8)}
        left_avail = {p: np.zeros_like(left_cul[p], bool) for p in range(3)}
        for sb_c in range(sb_cols):
            mi_c0 = sb_c * 16
            ctx = M.partition_plane_ctx(int(above_part[mi_c0]),
                                        int(left_part[0]), SB)
            if sb_r * 16 + 8 < mi_rows:
                M.write_partition(enc, cdf, ctx, M.PARTITION_SPLIT, SB)
            else:
                M.write_partition_edge(enc, cdf, ctx, True, SB,
                                       False, True)
            for qr, qc in ((0, 0), (0, 1), (1, 0), (1, 1)):
                br, bc = sb_r * 2 + qr, sb_c * 2 + qc
                bmi_r, bmi_c = br * 8, bc * 8
                if bmi_r >= mi_rows:
                    continue             # quad below the frame bottom
                ctx = M.partition_plane_ctx(
                    int(above_part[bmi_c]), int(left_part[qr * 8]), BLK)
                M.write_partition(enc, cdf, ctx, M.PARTITION_NONE, BLK)
                _encode_block(enc, cdf, grid, br, bc, y_cand, y_lev, u_lev,
                              v_lev, mv8, cands, n_intra, skip_grid,
                              above_cul, left_cul, above_avail, left_avail,
                              gm_mv)
                above_part[bmi_c:bmi_c + 8] = part_above_v
                left_part[qr * 8:qr * 8 + 8] = part_left_v
    return enc.done(), cdf


def _encode_block(enc, cdf, grid, br, bc, y_cand, y_lev_a, u_lev_a, v_lev_a,
                  mv8, cands, n_intra, skip_grid, above_cul, left_cul,
                  above_avail, left_avail, gm_mv=(0, 0)):
    mi_r, mi_c = br * 8, bc * 8
    mi_rows, mi_cols = grid.mi_rows, grid.mi_cols
    have_above, have_left = mi_r > 0, mi_c > 0

    idx = int(y_cand[br, bc])
    is_inter = idx >= n_intra
    y_lev = y_lev_a[br, bc]
    u_lev = u_lev_a[br, bc]
    v_lev = v_lev_a[br, bc]
    skip = int(not (y_lev.any() or u_lev.any() or v_lev.any()))

    a_skip = int(skip_grid[mi_r - 1, mi_c]) if have_above else 0
    l_skip = int(skip_grid[mi_r, mi_c - 1]) if have_left else 0
    M.write_skip(enc, cdf, a_skip + l_skip, skip)

    above_inter = grid.is_inter(mi_r - 1, mi_c) if have_above else None
    left_inter = grid.is_inter(mi_r, mi_c - 1) if have_left else None
    IM.write_is_inter(enc, cdf, IM.intra_inter_ctx(above_inter, left_inter),
                      is_inter)

    if is_inter:
        a_ref = int(grid.ref0[mi_r - 1, mi_c]) if have_above else None
        l_ref = int(grid.ref0[mi_r, mi_c - 1]) if have_left else None
        counts = IM.neighbor_ref_counts(
            a_ref if (a_ref or 0) >= 1 else None,
            l_ref if (l_ref or 0) >= 1 else None)
        IM.write_ref_frame_last(enc, cdf, counts)
        mv = ((int(mv8[br, bc, 0]), int(mv8[br, bc, 1]))
              if idx == n_intra else tuple(gm_mv))
        res = find_mv_stack(grid, mi_r, mi_c, 8, 8, gm_mv=gm_mv)
        mode, ref_mv = choose_inter_mode(mv, res, gm=gm_mv)
        IM.write_inter_mode(enc, cdf, mode, res.mode_context)
        if mode in (MV.NEWMV, MV.NEARMV):
            IM.write_drl_idx(enc, cdf, mode, res.stack, res.num_found)
        if mode == MV.NEWMV:
            IM.write_mv(enc, cdf, mv, ref_mv)
        grid.set_block(mi_r, mi_c, 8, 8, MV.LAST_FRAME, mode, mv[0], mv[1])
    else:
        mode, delta = cands[idx]
        IM.write_y_mode_inter(enc, cdf, mode)
        if M.is_directional(mode):
            M.write_angle_delta(enc, cdf, mode, delta)
        M.write_uv_mode(enc, cdf, True, mode, 0)        # uv DC
        grid.set_block(mi_r, mi_c, 8, 8, MV.INTRA_FRAME, mode)

    # residuals (identical context machinery to the intra tile)
    if not skip:
        for plane, lev, txs in ((0, y_lev, TX_32X32), (1, u_lev, TX_16X16),
                                (2, v_lev, TX_16X16)):
            shift = 0 if plane == 0 else 1
            units = (BLK >> shift) // 4
            # frame-bottom overhang context rules (EbDecParseBlock.c
            # :2117-2133 read clamp, :1644-1654 zero beyond-edge)
            row_px = (br * BLK) >> shift
            valid_px = (mi_rows * 4) >> shift
            units_v = min(units, max(0, (valid_px - row_px) // 4))
            au0 = (bc * BLK >> shift) // 4
            lu0 = ((br * BLK >> shift) // 4) % (16 >> shift)
            if plane == 0:
                txb_skip_ctx = 0
            else:
                a_nz = (above_cul[plane][au0:au0 + units] &
                        0x3F)[above_avail[plane][au0:au0 + units]]
                l_nz = (left_cul[plane][lu0:lu0 + units_v] &
                        0x3F)[left_avail[plane][lu0:lu0 + units_v]]
                ctx_base = int((a_nz != 0).any()) + int((l_nz != 0).any())
                txb_skip_ctx = 7 + ctx_base
            dc_sign_ctx = _dc_sign_ctx(
                above_cul[plane][au0:au0 + units],
                above_avail[plane][au0:au0 + units],
                left_cul[plane][lu0:lu0 + units_v],
                left_avail[plane][lu0:lu0 + units_v])
            cul = write_coeffs_txb(enc, cdf, lev, txs, DCT_DCT,
                                   min(plane, 1), txb_skip_ctx, dc_sign_ctx,
                                   is_inter=is_inter)
            above_cul[plane][au0:au0 + units] = cul
            above_avail[plane][au0:au0 + units] = True
            left_cul[plane][lu0:lu0 + units_v] = cul
            left_cul[plane][lu0 + units_v:lu0 + units] = 0
            left_avail[plane][lu0:lu0 + units] = True
    else:
        for plane in range(3):
            shift = 0 if plane == 0 else 1
            units = (BLK >> shift) // 4
            au0 = (bc * BLK >> shift) // 4
            lu0 = ((br * BLK >> shift) // 4) % (16 >> shift)
            above_cul[plane][au0:au0 + units] = 0
            above_avail[plane][au0:au0 + units] = True
            left_cul[plane][lu0:lu0 + units] = 0
            left_avail[plane][lu0:lu0 + units] = True

    skip_grid[mi_r:mi_r + 8, mi_c:mi_c + 8] = skip

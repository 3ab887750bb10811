"""Unified tile entropy coder: key + inter frames, 32x32 NONE or SPLIT
into 16x16 leaves (chroma 8x8 under split).

Generalizes encoder/tile_inter.py (which remains as the flat-32 inter
path) to the two-depth partition tree; the reference analogue is
svt_aom_write_sb's recursive partition walk (EbEntropyCoding.c:5440).
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
from ..spec.txfm import TX_8X8, TX_16X16, TX_32X32, DCT_DCT
from .tile_inter import choose_inter_mode
from .wavefront2 import TX_SEARCH_TYPES

SB = 64

# size_group_lookup per luma block size (intra y-mode cdf bucket)
SIZE_GROUP = {64: 3, 32: 3, 16: 2}


class TileCoder:
    """One tile's encoding pass (single tile per frame)."""

    def __init__(self, width, height, qindex, cdf_update, kf: bool,
                 cdf_init=None, mi_col_off: int = 0,
                 frame_mi_cols: int = None, cdef_bits: int = 0,
                 cdef_idx=None, comp: bool = False, true_h: int = None,
                 gm_mv=(0, 0)):
        """width/height are the padded (SB-aligned) plane dims the block
        maps were produced at; true_h (≤ height, %8) is the signaled
        frame height — blocks whose top-left falls outside it are not
        coded, blocks crossing it use the spec's inferred edge
        partitions (split_or_horz), and the last partial 16-row is
        coded as PARTITION_HORZ 16x8 blocks ("the strip")."""
        self.w, self.h = width, height
        self.kf = kf
        self.true_h = true_h if true_h is not None else height
        self.mi_col_off = mi_col_off
        self.frame_mi_cols = frame_mi_cols or width // 4
        self.mi_cols, self.mi_rows = width // 4, self.true_h // 4
        self.strip = None              # set via set_strip()
        self.enc = RangeEncoder()
        self.cdf = (cdf_init.clone() if cdf_init is not None
                    else CdfContext(qindex, update=cdf_update))
        self.grid = MiGrid(self.mi_rows, self.mi_cols)
        self.above_part = np.zeros(self.mi_cols, np.uint8)
        self.skip_grid = np.zeros((self.mi_rows, self.mi_cols), np.uint8)
        self.mode_grid = np.zeros((self.mi_rows, self.mi_cols), np.uint8)
        self.above_cul = {0: np.zeros(width // 4, np.uint8),
                          1: np.zeros(width // 8, np.uint8),
                          2: np.zeros(width // 8, np.uint8)}
        self.above_av = {p: np.zeros_like(self.above_cul[p], bool)
                         for p in range(3)}
        # cdef_idx [sb_rows, sb_cols] (tile-local): literal emitted at the
        # first non-skip block of each 64x64 (EbEntropyCoding.c:3968
        # write_cdef); None → frame has no CDEF syntax
        self.cdef_idx = cdef_idx
        self.cdef_bits = cdef_bits
        self._cdef_pending = False
        # CCSO (fork graft): per-plane frame-level unit-flag grids
        # [uh, uw] (256x256 luma units); one CDF2 symbol per enabled plane
        # at the first block of each aligned unit (EbEntropyCoding.c:4008
        # write_ccso)
        self.ccso_info = None
        # compound frame (REFERENCE_MODE_SELECT, pair = LAST+ALTREF):
        # inter candidate lanes are [single NEWMV, single zero,
        # comp NEW_NEW, comp zero]; mv arrays carry 4 components
        self.comp = comp
        # TRANSLATION global motion for LAST (1/8-pel, identity → (0,0));
        # GLOBALMV blocks predict with and store this mv
        self.gm_mv = tuple(gm_mv)
        # loop restoration: lr_types per plane (frame restoration type),
        # lr_units per plane = dict of [sb_rows, sb_cols(,k)] arrays
        # (type/eps/xqd/taps_v/taps_h), tile-local SB coords.  Coded at
        # SB start (spec decode_tile read_lr; EbEntropyCoding.c:4150)
        self.lr_types = (0, 0, 0)
        self.lr_units = None
        self._lr_ref = None

    def set_strip(self, mi, lev_y, lev_u, lev_v, mv=None):
        """Bottom-strip 16x8 blocks (true_h %16 == 8): arrays indexed by
        16-column — mi [w/16], lev_y [w/16, 8, 16], lev_u/v [w/16, 4, 8],
        mv [w/16, 2 or 4]."""
        self.strip = dict(mi=mi, lev_y=lev_y, lev_u=lev_u, lev_v=lev_v,
                          mv=mv)

    def set_lr(self, lr_types, lr_units):
        from ..ec.lr_syntax import default_ref_state
        self.lr_types = tuple(lr_types)
        self.lr_units = lr_units
        self._lr_ref = [default_ref_state() for _ in range(3)]

    def _write_lr_sb(self, sb_r, sb_c):
        if self.lr_units is None:
            return
        from ..ec import lr_syntax as LRS
        for p in range(3):
            if self.lr_types[p] == LRS.RESTORE_NONE:
                continue
            u = self.lr_units[p]
            unit = {"eps": u["eps"][sb_r, sb_c],
                    "xqd": u["xqd"][sb_r, sb_c],
                    "taps_v": list(u["taps_v"][sb_r, sb_c]),
                    "taps_h": list(u["taps_h"][sb_r, sb_c])}
            LRS.write_lr_unit(self.enc, self.cdf, self.lr_types[p],
                              int(u["type"][sb_r, sb_c]), unit,
                              self._lr_ref[p], p > 0)

    def encode(self, part, mi_top, lev_top_y, lev_top_u, lev_top_v,
               mi_sub, lev_sub_y, lev_sub_u, lev_sub_v, mv_top, mv_sub,
               cands_top, cands_sub, n_i_top, n_i_sub, stx_sub=None,
               part_sb=None, mi_sb=None, lev_sb_y=None, lev_sb_u=None,
               lev_sb_v=None, mv_sb=None, uv_top=None, uv_sub=None,
               uv_sb=None):
        """part [bh,bw] 0/1; *_top at 32-block granularity; *_sub indexed
        [bh,bw,4(z),...]; mv_top [bh,bw,2]; mv_sub [bh,bw,4,2].  For key
        frames the inter params may be None.

        part_sb [sbh,sbw] (0=64x64 NONE, 1=split) adds the superblock
        depth: NONE SBs code one 64x64 block — y TXB is TX_64X64 whose
        coded area is the 32x32 low band lev_sb_y, chroma TX_32X32
        (lev_sb_u/v), mv from mv_sb (same lane space as mv_top).

        uv_top [bh,bw] / uv_sub [bh,bw,4] / uv_sb [sbh,sbw]: searched
        chroma mode ids for intra blocks (None → DC)."""
        self._uv_top, self._uv_sub, self._uv_sb = uv_top, uv_sub, uv_sb
        enc, cdf = self.enc, self.cdf
        sb_cols = self.w // SB
        sb_rows = (self.mi_rows + 15) // 16
        for sb_r in range(sb_rows):
            self.left_part = np.zeros(SB // 4, np.uint8)
            self.left_cul = {0: np.zeros(SB // 4, np.uint8),
                             1: np.zeros(SB // 8, np.uint8),
                             2: np.zeros(SB // 8, np.uint8)}
            self.left_av = {p: np.zeros_like(self.left_cul[p], bool)
                            for p in range(3)}
            for sb_c in range(sb_cols):
                self._cdef_pending = self.cdef_idx is not None
                self._write_lr_sb(sb_r, sb_c)
                ctx = M.partition_plane_ctx(int(self.above_part[sb_c * 16]),
                                            int(self.left_part[0]), SB)
                sb_has_rows = sb_r * 16 + 8 < self.mi_rows
                sb_none = (part_sb is not None and
                           not part_sb[sb_r, sb_c] and sb_has_rows)
                if sb_none:
                    from ..spec.txfm import TX_64X64
                    M.write_partition(enc, cdf, ctx, M.PARTITION_NONE, SB)
                    mv = mv_sb[sb_r, sb_c] if mv_sb is not None else None
                    self._code_block(sb_r * 16, sb_c * 16, 64,
                                     int(mi_sb[sb_r, sb_c]), n_i_top,
                                     cands_top, lev_sb_y[sb_r, sb_c],
                                     lev_sb_u[sb_r, sb_c],
                                     lev_sb_v[sb_r, sb_c], mv,
                                     TX_64X64, TX_32X32,
                                     uv_mode=(int(uv_sb[sb_r, sb_c])
                                              if uv_sb is not None else 0))
                    a, l = M.partition_ctx_value(64, 64)
                    self.above_part[sb_c * 16:sb_c * 16 + 16] = a
                    self.left_part[:] = l
                    continue
                if sb_has_rows:
                    M.write_partition(enc, cdf, ctx, M.PARTITION_SPLIT, SB)
                else:
                    M.write_partition_edge(enc, cdf, ctx, True, SB,
                                           False, True)
                for qr, qc in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    br, bc = sb_r * 2 + qr, sb_c * 2 + qc
                    if br * 8 >= self.mi_rows:
                        continue       # 32-quad entirely below the frame
                    self._code_32(br, bc, qr, part, mi_top, lev_top_y,
                                  lev_top_u, lev_top_v, mi_sub, lev_sub_y,
                                  lev_sub_u, lev_sub_v, mv_top, mv_sub,
                                  cands_top, cands_sub, n_i_top, n_i_sub,
                                  stx_sub)
        return enc.done(), cdf

    # ---------------------------------------------------------------- #

    def _code_32(self, br, bc, qr, part, mi_top, ly, lu, lv, mi_sub, sly,
                 slu, slv, mv_top, mv_sub, cands_top, cands_sub, n_i_top,
                 n_i_sub, stx_sub=None):
        enc, cdf = self.enc, self.cdf
        mi_r, mi_c = br * 8, bc * 8
        ctx = M.partition_plane_ctx(int(self.above_part[mi_c]),
                                    int(self.left_part[qr * 8]), 32)
        has_rows32 = mi_r + 4 < self.mi_rows
        split = bool(part[br, bc]) if part is not None else False
        if not split and has_rows32:
            M.write_partition(enc, cdf, ctx, M.PARTITION_NONE, 32)
            idx = int(mi_top[br, bc])
            mv = (mv_top[br, bc] if mv_top is not None else None)
            self._code_block(mi_r, mi_c, 32, idx, n_i_top, cands_top,
                             ly[br, bc], lu[br, bc], lv[br, bc], mv,
                             TX_32X32, TX_16X16,
                             uv_mode=(int(self._uv_top[br, bc])
                                      if self._uv_top is not None else 0))
            a, l = M.partition_ctx_value(32, 32)
            self.above_part[mi_c:mi_c + 8] = a
            self.left_part[qr * 8:qr * 8 + 8] = l
            return
        if has_rows32:
            M.write_partition(enc, cdf, ctx, M.PARTITION_SPLIT, 32)
        else:
            M.write_partition_edge(enc, cdf, ctx, True, 32, False, True)
        for z, (sr, sc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            smr, smc = mi_r + sr * 4, mi_c + sc * 4
            if smr >= self.mi_rows:
                continue               # 16-leaf below the frame
            lctx = M.partition_plane_ctx(
                int(self.above_part[smc]),
                int(self.left_part[qr * 8 + sr * 4]), 16)
            if smr + 2 < self.mi_rows:
                M.write_partition(enc, cdf, lctx, M.PARTITION_NONE, 16)
                idx = int(mi_sub[br, bc, z])
                mv = (mv_sub[br, bc, z] if mv_sub is not None else None)
                stx = (TX_SEARCH_TYPES[int(stx_sub[br, bc, z])]
                       if stx_sub is not None else DCT_DCT)
                self._code_block(smr, smc, 16, idx, n_i_sub, cands_sub,
                                 sly[br, bc, z], slu[br, bc, z],
                                 slv[br, bc, z], mv, TX_16X16, TX_8X8,
                                 y_tx_type=stx,
                                 uv_mode=(int(self._uv_sub[br, bc, z])
                                          if self._uv_sub is not None
                                          else 0))
                a, l = M.partition_ctx_value(16, 16)
            else:
                # partial 16: PARTITION_HORZ → one 16x8 strip block
                M.write_partition_edge(enc, cdf, lctx, False, 16,
                                       False, True)
                st = self.strip
                c16 = smc // 4
                smv = (st["mv"][c16] if st["mv"] is not None else None)
                self._code_block(smr, smc, 16, int(st["mi"][c16]),
                                 n_i_sub, cands_sub, st["lev_y"][c16],
                                 st["lev_u"][c16], st["lev_v"][c16],
                                 smv, None, None, bs_h=8)
                a, l = M.partition_ctx_value(16, 8)
            self.above_part[smc:smc + 4] = a
            self.left_part[qr * 8 + sr * 4:qr * 8 + sr * 4 + 4] = l

    # ---------------------------------------------------------------- #

    def _code_block(self, mi_r, mi_c, bs, idx, n_intra, cands, y_lev,
                    u_lev, v_lev, mv, tx_y, tx_uv, y_tx_type=DCT_DCT,
                    bs_h: int = None, uv_mode: int = 0):
        enc, cdf, grid = self.enc, self.cdf, self.grid
        bs_h = bs if bs_h is None else bs_h
        if tx_y is None:               # rect strip block: largest rect tx
            from ..spec.txfm import TX_16X8, TX_8X4
            tx_y, tx_uv = TX_16X8, TX_8X4
        bw4 = bs // 4
        bh4 = bs_h // 4
        have_above, have_left = mi_r > 0, mi_c > 0
        is_inter = idx >= n_intra
        skip = int(not (y_lev.any() or u_lev.any() or v_lev.any()))

        a_skip = int(self.skip_grid[mi_r - 1, mi_c]) if have_above else 0
        l_skip = int(self.skip_grid[mi_r, mi_c - 1]) if have_left else 0
        M.write_skip(enc, cdf, a_skip + l_skip, skip)

        if self._cdef_pending and not skip:
            v = int(self.cdef_idx[mi_r // 16, mi_c // 16])
            for i in range(self.cdef_bits - 1, -1, -1):
                enc.encode_bool((v >> i) & 1, 0x4000)
            self._cdef_pending = False

        # CCSO unit flags (fork graft, EbEntropyCoding.c:4008 write_ccso):
        # at the first block of each 256x256-luma-aligned unit, one CDF2
        # symbol per enabled plane, regardless of skip
        if (self.ccso_info is not None and mi_r % 64 == 0 and
                (mi_c + self.mi_col_off) % 64 == 0):
            ur, uc = mi_r // 64, (mi_c + self.mi_col_off) // 64
            for p in range(3):
                pi = self.ccso_info["planes"][p]
                if pi is not None:
                    t = cdf.ccso_cdf[p]
                    f = int(pi["flags"][ur, uc])
                    enc.encode_symbol(f, t)
                    cdf.update(t, f)

        y_mode = 0
        if self.kf:
            mode, delta = cands[idx]
            y_mode = mode
            a_mode = int(self.mode_grid[mi_r - 1, mi_c]) if have_above else 0
            l_mode = int(self.mode_grid[mi_r, mi_c - 1]) if have_left else 0
            M.write_kf_y_mode(enc, cdf, a_mode, l_mode, mode)
            if M.is_directional(mode):
                M.write_angle_delta(enc, cdf, mode, delta)
            # CfL is only allowed for blocks <= 32x32 (spec 5.11.5
            # intra_frame_mode_info); 64x64 blocks use the 13-symbol CDF
            M.write_uv_mode(enc, cdf, bs <= 32, mode, uv_mode)
            if M.is_directional(uv_mode):
                M.write_angle_delta(enc, cdf, uv_mode, 0)
            grid.set_block(mi_r, mi_c, bw4, bh4, MV.INTRA_FRAME, mode)
            self.mode_grid[mi_r:mi_r + bw4, mi_c:mi_c + bw4] = mode
        else:
            above_inter = grid.is_inter(mi_r - 1, mi_c) if have_above \
                else None
            left_inter = grid.is_inter(mi_r, mi_c - 1) if have_left else None
            IM.write_is_inter(enc, cdf,
                              IM.intra_inter_ctx(above_inter, left_inter),
                              is_inter)
            if is_inter:
                def nb_ref(r, c, avail):
                    if not avail:
                        return None
                    r0 = int(grid.ref0[r, c])
                    if r0 < 1:
                        return None
                    r1 = int(grid.ref1[r, c])
                    return (r0, r1) if r1 >= 1 else r0

                a_ref = nb_ref(mi_r - 1, mi_c, have_above)
                l_ref = nb_ref(mi_r, mi_c - 1, have_left)
                counts = IM.neighbor_ref_counts(a_ref, l_ref)
                # lane layout: 0=NEW, 1=zero, 2=predicted-MV single-ref;
                # compound lanes start at 3 (video_encoder lane order)
                lane = idx - n_intra
                is_comp = self.comp and lane >= 3
                if self.comp:
                    def nb_info(r, c, avail):
                        if not avail:
                            return None
                        return (grid.ref0[r, c] >= 1,
                                int(grid.ref0[r, c]),
                                int(grid.ref1[r, c]))
                    a_i = nb_info(mi_r - 1, mi_c, have_above)
                    l_i = nb_info(mi_r, mi_c - 1, have_left)
                    IM.write_comp_mode(enc, cdf,
                                       IM.ref_mode_ctx(a_i, l_i),
                                       is_comp)
                if is_comp:
                    IM.write_comp_refs_last_altref(enc, cdf, a_i, l_i,
                                                   counts)
                    mvp = tuple(int(v) for v in mv[:4])
                    res = find_mv_stack(
                        grid, mi_r, mi_c, bw4, bh4,
                        ref_frame=(MV.LAST_FRAME, MV.ALTREF_FRAME),
                        mi_col_off=self.mi_col_off,
                        frame_mi_cols=self.frame_mi_cols)
                    s0 = res.ref_list[0]
                    p0 = (MV.lower_mv_precision(s0[0], s0[1]) +
                          MV.lower_mv_precision(s0[2], s0[3]))
                    if mvp == p0:
                        cmode = MV.NEAREST_NEARESTMV
                    elif mvp == (0, 0, 0, 0):
                        cmode = MV.GLOBAL_GLOBALMV
                    else:
                        cmode = MV.NEW_NEWMV
                    IM.write_inter_compound_mode(enc, cdf, cmode,
                                                 res.mode_context)
                    if cmode == MV.NEW_NEWMV:
                        IM.write_drl_idx(enc, cdf, cmode, res.stack,
                                         res.num_found)
                        # pred = precision-lowered stack entry (spec
                        # assign_mv lower_mv_precision on PredMv)
                        IM.write_mv(enc, cdf, mvp[:2], p0[:2])
                        IM.write_mv(enc, cdf, mvp[2:], p0[2:])
                    grid.set_block(mi_r, mi_c, bw4, bh4, MV.LAST_FRAME,
                                   cmode, mvp[0], mvp[1],
                                   ref1=MV.ALTREF_FRAME, mv1r=mvp[2],
                                   mv1c=mvp[3])
                    mode = cmode
                else:
                    IM.write_ref_frame_last(enc, cdf, counts)
                    mvv = (int(mv[0]), int(mv[1]))
                    res = find_mv_stack(grid, mi_r, mi_c, bw4, bh4,
                                        mi_col_off=self.mi_col_off,
                                        frame_mi_cols=self.frame_mi_cols,
                                        gm_mv=self.gm_mv)
                    mode, ref_mv = choose_inter_mode(mvv, res,
                                                     gm=self.gm_mv)
                    IM.write_inter_mode(enc, cdf, mode, res.mode_context)
                    if mode in (MV.NEWMV, MV.NEARMV):
                        IM.write_drl_idx(enc, cdf, mode, res.stack,
                                         res.num_found)
                    if mode == MV.NEWMV:
                        IM.write_mv(enc, cdf, mvv, ref_mv)
                    grid.set_block(mi_r, mi_c, bw4, bh4, MV.LAST_FRAME,
                                   mode, mvv[0], mvv[1])
            else:
                mode, delta = cands[idx]
                y_mode = mode
                IM._sym(enc, cdf, cdf.y_mode_cdf[SIZE_GROUP[bs] if bs_h == bs else 1], mode, 13)
                if M.is_directional(mode):
                    M.write_angle_delta(enc, cdf, mode, delta)
                M.write_uv_mode(enc, cdf, bs <= 32, mode, uv_mode)
                if M.is_directional(uv_mode):
                    M.write_angle_delta(enc, cdf, uv_mode, 0)
                grid.set_block(mi_r, mi_c, bw4, bh4, MV.INTRA_FRAME, mode)

        self._code_residuals(mi_r, mi_c, bs, skip, is_inter, y_mode,
                             y_lev, u_lev, v_lev, tx_y, tx_uv,
                             y_tx_type if not is_inter else DCT_DCT,
                             bs_h=bs_h)
        self.skip_grid[mi_r:mi_r + bh4, mi_c:mi_c + bw4] = skip

    def _code_residuals(self, mi_r, mi_c, bs, skip, is_inter, y_mode,
                        y_lev, u_lev, v_lev, tx_y, tx_uv,
                        y_tx_type=DCT_DCT, bs_h: int = None):
        enc, cdf = self.enc, self.cdf
        bs_h = bs if bs_h is None else bs_h
        sb_mi_r = mi_r % 16
        for plane, lev, txs in ((0, y_lev, tx_y), (1, u_lev, tx_uv),
                                (2, v_lev, tx_uv)):
            shift = 0 if plane == 0 else 1
            units = (bs >> shift) // 4
            units_h = (bs_h >> shift) // 4
            # txbs overhanging the frame bottom: contexts are READ over
            # only the in-frame units, and the beyond-edge left entries
            # are reset to 0 (not cul) after coding — EbDecParseBlock.c
            # parse_transform_block txb_h_unit clamp (:2117-2133) +
            # update_coeff_ctx (:1644-1654)
            row_px = (mi_r * 4) >> shift
            valid_px = (self.mi_rows * 4) >> shift
            units_v = min(units_h, max(0, (valid_px - row_px) // 4))
            au0 = ((mi_c * 4) >> shift) // 4
            lu0 = ((sb_mi_r * 4) >> shift) // 4
            if skip:
                self.above_cul[plane][au0:au0 + units] = 0
                self.above_av[plane][au0:au0 + units] = True
                self.left_cul[plane][lu0:lu0 + units_h] = 0
                self.left_av[plane][lu0:lu0 + units_h] = True
                continue
            if plane == 0:
                tctx = 0
            else:
                a_nz = (self.above_cul[plane][au0:au0 + units] &
                        0x3F)[self.above_av[plane][au0:au0 + units]]
                l_nz = (self.left_cul[plane][lu0:lu0 + units_v] &
                        0x3F)[self.left_av[plane][lu0:lu0 + units_v]]
                tctx = 7 + int((a_nz != 0).any()) + int((l_nz != 0).any())
            signs = 0
            for culs, avs in ((self.above_cul[plane][au0:au0 + units],
                               self.above_av[plane][au0:au0 + units]),
                              (self.left_cul[plane][lu0:lu0 + units_v],
                               self.left_av[plane][lu0:lu0 + units_v])):
                for cl, av in zip(culs, avs):
                    if av:
                        s = int(cl) >> 6
                        signs += 1 if s == 2 else (-1 if s == 1 else 0)
            dctx = 2 if signs > 0 else (1 if signs < 0 else 0)
            cul = write_coeffs_txb(enc, cdf, lev, txs,
                                   y_tx_type if plane == 0 else DCT_DCT,
                                   min(plane, 1), tctx, dctx,
                                   is_inter=is_inter,
                                   intra_mode=y_mode)
            self.above_cul[plane][au0:au0 + units] = cul
            self.above_av[plane][au0:au0 + units] = True
            self.left_cul[plane][lu0:lu0 + units_v] = cul
            self.left_cul[plane][lu0 + units_v:lu0 + units_h] = 0
            self.left_av[plane][lu0:lu0 + units_h] = True

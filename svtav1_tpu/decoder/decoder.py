"""Research decoder: OBU parse + tile decode + reconstruction.

Covers the stream subset this framework emits (standard AV1 key-frame intra,
single tile, 64x64 SB) with the structure to grow toward full coverage —
the role of the reference's SvtAv1Dec (SURVEY.md §2.7).  Parsing is host
Python; reconstruction reuses the same normative ops as the encoder
(intra predictors, dequant, inverse transforms, deblocking), so
encoder/decoder share one bit-exact compute layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ec import inter_modes as IM
from ..ec.coeffs import read_coeffs_txb
from ..ec.modes import INTRA_MODE_CONTEXT, PARTITION_NONE, PARTITION_SPLIT
from ..ec.mvpred import MiGrid, find_mv_stack
from ..ec.range_coder import RangeDecoder
from ..ops.mc import MV_PRED_PAD, pad_plane_np, predict_inter_block_np
from ..spec import mv as MV
from ..spec.mv import lower_mv_precision as _lp
from ..ops import intra
from ..ops.deblock import deblock_plane_part, deblock_plane_uniform
from ..ops.intra_dir import dr_pred
from ..ops.quant import dequantize
from ..ops.transforms import add_residual_clip, inv_txfm2d
from ..spec.cdf import CdfContext
from ..spec.txfm import TX_16X16, TX_32X32, DCT_DCT
from ..utils.bitio import BitReader
from ..utils.obu import (OBU_FRAME, OBU_FRAME_HEADER, OBU_SEQUENCE_HEADER,
                         OBU_TILE_GROUP, parse_obus)


class DecodeError(Exception):
    """Raised for corrupt or unsupported streams."""


def _need(cond, msg):
    """Unsupported-or-corrupt syntax guard (explicit so `python -O` cannot
    strip it; reference analogue: EbErrorType returns, EbDecParseObu.c)."""
    if not cond:
        raise DecodeError(msg)


@dataclass
class SeqInfo:
    width: int = 0
    height: int = 0
    bit_depth: int = 8
    use_128x128_sb: bool = False
    enable_filter_intra: bool = False
    enable_intra_edge_filter: bool = False
    enable_order_hint: bool = False
    order_hint_bits: int = 0
    enable_superres: bool = False
    enable_cdef: bool = False
    enable_restoration: bool = False
    monochrome: bool = False
    film_grain_params_present: bool = False
    enable_ccso: bool = False     # fork graft (nonstandard, opt-in parse)


@dataclass
class FrameInfo:
    frame_type: int = 0
    show_frame: bool = True
    base_q_idx: int = 100
    disable_cdf_update: bool = True
    tx_mode_select: bool = False
    reduced_tx_set: bool = False
    filter_level: tuple = (0, 0)
    filter_level_u: int = 0
    filter_level_v: int = 0
    lf_sharpness: int = 0
    refresh_frame_flags: int = 0xFF
    ref_frame_idx: tuple = (0,) * 7
    allow_high_precision_mv: bool = False
    interpolation_filter: int = 0
    primary_ref_frame: int = 7
    disable_frame_end_update_cdf: bool = True
    tile_cols_log2: int = 0
    context_update_tile_id: int = 0
    showable: bool = True
    show_existing_idx: int = -1       # >= 0: show_existing_frame header
    film_grain: dict = None
    reference_select: bool = False
    lr_frame_types: tuple = (0, 0, 0)   # 0 NONE 1 WIENER 2 SGR 3 SWITCH
    ccso: dict = None                   # fork graft; parsed encode_ccso
    cdef_damping: int = 3
    cdef_bits: int = 0
    cdef_y_strengths: tuple = ((0, 0),)     # (pri, sec) decoded (3→4)
    cdef_uv_strengths: tuple = ((0, 0),)
    gm_mv: dict = None                      # {ref: (row, col)} 1/8-pel


class _TileState:
    """Per-tile neighbor context state (grids + coefficient contexts)."""

    def __init__(self, mi_rows, mi_cols, w, h):
        from ..ec.mvpred import MiGrid
        self.mi_cols_t = mi_cols
        self.grid = MiGrid(mi_rows, mi_cols)
        self.above_part = np.zeros(mi_cols, np.uint8)
        self.skip_grid = np.zeros((mi_rows, mi_cols), np.uint8)
        self.mode_grid = np.zeros((mi_rows, mi_cols), np.uint8)
        self.above_cul = {0: np.zeros(w // 4, np.uint8),
                          1: np.zeros(w // 8, np.uint8),
                          2: np.zeros(w // 8, np.uint8)}
        self.above_av = {p: np.zeros_like(self.above_cul[p], bool)
                         for p in range(3)}

    def reset_sb_row(self):
        self.left_part = np.zeros(16, np.uint8)
        self.left_cul = {0: np.zeros(16, np.uint8),
                         1: np.zeros(8, np.uint8),
                         2: np.zeros(8, np.uint8)}
        self.left_av = {p: np.zeros_like(self.left_cul[p], bool)
                        for p in range(3)}


class Decoder:
    def __init__(self, ccso: bool = False) -> None:
        # ccso=True: expect the fork's nonstandard grafted syntax (seq-level
        # enable_ccso bit + frame encode_ccso + per-unit tile flags).  Like
        # the reference fork, CCSO streams are not standard AV1 — the
        # syntax is not self-describing, so the caller must opt in.
        self.expect_ccso = ccso
        self.seq: SeqInfo | None = None
        self.metadata = []           # parsed (type, value) metadata OBUs
        self.dpb = [None] * 8        # (y, u, v) reconstructed refs
        self.dpb_gm = [None] * 8     # saved per-frame gm_mv dicts
        self.dpb_cdf = [None] * 8    # frame-end CDF state per slot
        self.dpb_fg = [None] * 8     # film grain params per slot

    # ---------------- headers ---------------- #

    def _parse_sequence_header(self, payload: bytes) -> SeqInfo:
        r = BitReader(payload)
        s = SeqInfo()
        profile = r.f(3)
        _need(profile == 0, "profile 0 only")
        r.bit()                       # still_picture
        reduced = r.bit()
        _need(not reduced, "reduced_still_picture_header")
        if r.bit():                   # timing_info_present
            raise NotImplementedError("timing info")
        r.bit()                       # initial_display_delay_present
        n_ops = r.f(5) + 1
        for _ in range(n_ops):
            r.f(12)
            lvl = r.f(5)
            if lvl > 7:
                r.bit()
        wbits = r.f(4) + 1
        hbits = r.f(4) + 1
        s.width = r.f(wbits) + 1
        s.height = r.f(hbits) + 1
        if r.bit():                   # frame_id_numbers_present
            raise NotImplementedError
        s.use_128x128_sb = bool(r.bit())
        s.enable_filter_intra = bool(r.bit())
        s.enable_intra_edge_filter = bool(r.bit())
        r.bit()                       # enable_interintra_compound
        r.bit()                       # enable_masked_compound
        r.bit()                       # enable_warped_motion
        r.bit()                       # enable_dual_filter
        s.enable_order_hint = bool(r.bit())
        if s.enable_order_hint:
            r.bit()
            r.bit()
        if r.bit():                   # seq_choose_screen_content_tools
            force_sct = 2
        else:
            force_sct = r.bit()
        if force_sct > 0:
            raise NotImplementedError("screen content tools")
        if s.enable_order_hint:
            s.order_hint_bits = r.f(3) + 1
        s.enable_superres = bool(r.bit())
        s.enable_cdef = bool(r.bit())
        s.enable_restoration = bool(r.bit())
        if self.expect_ccso:
            # fork graft: unconditional extra seq bit
            # (EbEntropyCoding.c:2872); not present in standard AV1
            s.enable_ccso = bool(r.bit())
        # color config
        high_bd = r.bit()
        s.bit_depth = 10 if high_bd else 8
        s.monochrome = bool(r.bit())
        if r.bit():                   # color_description_present
            r.f(8)
            r.f(8)
            r.f(8)
        r.bit()                       # color_range
        if not s.monochrome:
            r.f(2)                    # chroma_sample_position
            r.bit()                   # separate_uv_delta_q
        s.film_grain_params_present = bool(r.bit())
        return s

    def _parse_frame_header(self, r: BitReader, seq: SeqInfo) -> FrameInfo:
        fr = FrameInfo()
        if r.bit():                   # show_existing_frame
            fr.show_existing_idx = r.f(3)
            return fr
        fr.frame_type = r.f(2)
        _need(fr.frame_type in (0, 1), "intra-only / switch frames")
        is_inter = fr.frame_type == 1
        fr.show_frame = bool(r.bit())
        if not fr.show_frame:
            fr.showable = bool(r.bit())
        if is_inter:
            _need(r.bit() == 0, "error_resilient_mode")
        fr.disable_cdf_update = bool(r.bit())
        _need(r.bit() == 0, "frame_size_override")
        if seq.enable_order_hint:
            r.f(seq.order_hint_bits)
        if is_inter:
            fr.primary_ref_frame = r.f(3)
            fr.refresh_frame_flags = r.f(8)
            fr.ref_frame_idx = tuple(r.f(3) for _ in range(7))
        if seq.enable_superres:
            _need(r.bit() == 0, "superres")
        _need(r.bit() == 0, "render size")
        if is_inter:
            fr.allow_high_precision_mv = bool(r.bit())
            _need(not fr.allow_high_precision_mv, "high-precision mv")
            _need(r.bit() == 0, "switchable interp filter")
            fr.interpolation_filter = r.f(2)
            _need(r.bit() == 0, "motion mode switchable")
        if not fr.disable_cdf_update:
            fr.disable_frame_end_update_cdf = bool(r.bit())
        # tile info (single-tile subset)
        _need(r.bit() == 1, "uniform tile spacing only")
        sb = 128 if seq.use_128x128_sb else 64
        sb_cols = (seq.width + sb - 1) // sb
        sb_rows = (seq.height + sb - 1) // sb
        from ..encoder.headers import _tile_log2
        sb_shift = 7 if sb == 128 else 6
        max_tile_width_sb = 4096 >> sb_shift
        min_log2_cols = _tile_log2(max_tile_width_sb, sb_cols)
        max_log2_cols = _tile_log2(1, min(sb_cols, 64))
        max_log2_rows = _tile_log2(1, min(sb_rows, 64))
        tile_cols_log2 = min_log2_cols
        while tile_cols_log2 < max_log2_cols and r.bit():
            tile_cols_log2 += 1
        max_tile_area_sb = (4096 * 2304) >> (2 * sb_shift)
        min_log2_tiles = max(min_log2_cols,
                             _tile_log2(max_tile_area_sb, sb_rows * sb_cols))
        min_log2_rows = max(min_log2_tiles - tile_cols_log2, 0)
        tile_rows_log2 = min_log2_rows
        while tile_rows_log2 < max_log2_rows and r.bit():
            tile_rows_log2 += 1
        if tile_cols_log2 or tile_rows_log2:
            fr.context_update_tile_id = r.f(tile_cols_log2 + tile_rows_log2)
            _need(r.f(2) == 3, "tile_size_bytes == 4 expected")
        _need(tile_rows_log2 == 0, "tile rows")
        fr.tile_cols_log2 = tile_cols_log2
        _need(sb_cols % (1 << tile_cols_log2) == 0,
              "non-uniform tile columns")
        # quantization
        fr.base_q_idx = r.f(8)
        _need(r.bit() == 0, "delta_q_y_dc")
        if not seq.monochrome:
            _need(r.bit() == 0, "delta_q_u_dc")
            _need(r.bit() == 0, "delta_q_u_ac")
        _need(r.bit() == 0, "qmatrix")
        _need(r.bit() == 0, "segmentation")
        if fr.base_q_idx > 0:
            _need(r.bit() == 0, "delta_q_present")
        l0 = r.f(6)
        l1 = r.f(6)
        fr.filter_level = (l0, l1)
        if not seq.monochrome and (l0 or l1):
            fr.filter_level_u = r.f(6)
            fr.filter_level_v = r.f(6)
        fr.lf_sharpness = r.f(3)
        _need(r.bit() == 0, "loop_filter_delta")
        if seq.enable_cdef:
            # cdef_params (spec §5.9.19); sec value 3 decodes to 4
            fr.cdef_damping = r.f(2) + 3
            fr.cdef_bits = r.f(2)
            ys, uvs = [], []
            for _ in range(1 << fr.cdef_bits):
                yp = r.f(4)
                ysec = r.f(2)
                up = r.f(4)
                usec = r.f(2)
                ys.append((yp, ysec + (ysec == 3)))
                uvs.append((up, usec + (usec == 3)))
            fr.cdef_y_strengths = tuple(ys)
            fr.cdef_uv_strengths = tuple(uvs)
        if seq.enable_restoration:
            # lr_params (spec §5.9.20); Remap_Lr_Type coded order
            remap = {0: 0, 1: 3, 2: 1, 3: 2}
            types = [remap[r.f(2)] for _ in range(3)]
            uses_lr = any(types)
            uses_chroma_lr = bool(types[1] or types[2])
            if uses_lr:
                _need(r.bit() == 0, "64px LR units only")
                if uses_chroma_lr:
                    _need(r.bit() == 1, "32px chroma LR units only")
            fr.lr_frame_types = tuple(types)
        if seq.enable_ccso:
            fr.ccso = self._parse_ccso(r)
        fr.tx_mode_select = bool(r.bit())
        _need(not fr.tx_mode_select, "TX_MODE_LARGEST subset")
        if is_inter:
            fr.reference_select = bool(r.bit())
        fr.reduced_tx_set = bool(r.bit())
        if is_inter:
            fr.gm_mv = self._parse_global_motion(r, fr)
        fr.film_grain = self._parse_film_grain(r, seq, fr)
        return fr

    def _parse_global_motion(self, r: BitReader, fr) -> dict:
        """global_motion_params, TRANSLATION only (spec 5.9.24/25;
        EbDecParseObu.c:1217 read_global_motion_params).  Returns
        {ref: (mv_row, mv_col)} in 1/8-pel; PrevGmParams come from the
        primary-ref frame's saved params (identity when
        PRIMARY_REF_NONE)."""
        from ..ec.subexp import read_signed_subexp_bits
        prev = {}
        if fr.primary_ref_frame != 7:
            slot = fr.ref_frame_idx[fr.primary_ref_frame]
            prev = self.dpb_gm[slot] or {}
        gm = {}
        for ref in range(1, 8):
            if not r.bit():          # is_global
                continue
            _need(not r.bit(), "rot-zoom global motion")
            _need(bool(r.bit()), "affine global motion")
            pmv = tuple(prev.get(ref, (0, 0)))
            row = read_signed_subexp_bits(r, -256, 257, pmv[0] >> 1) << 1
            col = read_signed_subexp_bits(r, -256, 257, pmv[1] >> 1) << 1
            if (row, col) != (0, 0):
                gm[ref] = (row, col)
        return gm

    @staticmethod
    def _parse_ccso(r: BitReader) -> dict:
        """encode_ccso read path (fork graft, EbEntropyCoding.c:2361 with
        CONFIG_D143_CCSO_FM_FLAG=1 + CONFIG_CCSO_SIGFIX=1)."""
        from ..ops.ccso import CCSO_OFFSETS
        if not r.bit():                  # ccso_frame_flag
            return None
        planes = []
        for _ in range(3):
            if not r.bit():              # ccso_enable[plane]
                planes.append(None)
                continue
            bo_only = r.bit()
            if bo_only:
                mbl = r.f(3)
                quant_idx, support, edge_clf = 0, 0, 0
            else:
                quant_idx = r.f(2)
                support = r.f(3)
                edge_clf = r.bit()
                mbl = r.f(2)
            intervals = 1 if bo_only else (3 if edge_clf == 0 else 2)
            lut = np.zeros(128, np.int32)
            for d0 in range(intervals):
                for d1 in range(intervals):
                    for band in range(1 << mbl):
                        oi = 0
                        while oi < 7 and r.bit():
                            oi += 1
                        lut[(band << 4) + (d0 << 2) + d1] = \
                            CCSO_OFFSETS[oi]
            planes.append(dict(quant_idx=quant_idx, support=support,
                               edge_clf=edge_clf, max_band_log2=mbl,
                               bo_only=bo_only, lut=lut))
        return {"planes": planes}

    @staticmethod
    def _parse_film_grain(r: BitReader, seq: SeqInfo, fr) -> dict:
        """film_grain_params (spec §5.9.30; EbDecParseObu read path)."""
        if not getattr(seq, "film_grain_params_present", False):
            return None
        if not (fr.show_frame or fr.showable):
            return None
        if not r.bit():               # apply_grain
            return None
        fg = {"grain_seed": r.f(16)}
        if fr.frame_type == 1:
            if not r.bit():           # update_grain == 0
                fg["load_ref_idx"] = r.f(3)
                return fg
        n_y = r.f(4)
        _need(n_y <= 14, "num_y_points > 14")
        fg["num_y_points"] = n_y
        fg["scaling_points_y"] = [(r.f(8), r.f(8)) for _ in range(n_y)]
        csfl = bool(r.bit()) if not seq.monochrome else False
        fg["chroma_scaling_from_luma"] = int(csfl)
        chroma_pts = not (seq.monochrome or csfl or n_y == 0)
        if chroma_pts:
            ncb = r.f(4)
            _need(ncb <= 10, "num_cb_points > 10")
            fg["num_cb_points"] = ncb
            fg["scaling_points_cb"] = [(r.f(8), r.f(8))
                                       for _ in range(ncb)]
            ncr = r.f(4)
            _need(ncr <= 10, "num_cr_points > 10")
            fg["num_cr_points"] = ncr
            fg["scaling_points_cr"] = [(r.f(8), r.f(8))
                                       for _ in range(ncr)]
        else:
            fg["num_cb_points"] = fg["num_cr_points"] = 0
            fg["scaling_points_cb"] = fg["scaling_points_cr"] = []
        fg["scaling_shift"] = r.f(2) + 8
        lag = r.f(2)
        fg["ar_coeff_lag"] = lag
        num_pos = 2 * lag * (lag + 1)
        fg["ar_coeffs_y"] = [0] * 24
        fg["ar_coeffs_cb"] = [0] * 25
        fg["ar_coeffs_cr"] = [0] * 25
        if n_y:
            for i in range(num_pos):
                fg["ar_coeffs_y"][i] = r.f(8) - 128
            num_pos_c = num_pos + 1
        else:
            num_pos_c = num_pos
        if fg["num_cb_points"] or csfl:
            for i in range(num_pos_c):
                fg["ar_coeffs_cb"][i] = r.f(8) - 128
        if fg["num_cr_points"] or csfl:
            for i in range(num_pos_c):
                fg["ar_coeffs_cr"][i] = r.f(8) - 128
        fg["ar_coeff_shift"] = r.f(2) + 6
        fg["grain_scale_shift"] = r.f(2)
        if fg["num_cb_points"]:
            fg["cb_mult"] = r.f(8)
            fg["cb_luma_mult"] = r.f(8)
            fg["cb_offset"] = r.f(9)
        else:
            fg["cb_mult"] = fg["cb_luma_mult"] = fg["cb_offset"] = 0
        if fg["num_cr_points"]:
            fg["cr_mult"] = r.f(8)
            fg["cr_luma_mult"] = r.f(8)
            fg["cr_offset"] = r.f(9)
        else:
            fg["cr_mult"] = fg["cr_luma_mult"] = fg["cr_offset"] = 0
        fg["overlap_flag"] = r.bit()
        fg["clip_to_restricted_range"] = r.bit()
        fg["random_seed"] = fg["grain_seed"]
        fg["bit_depth"] = seq.bit_depth
        return fg

    # ---------------- tile ---------------- #

    @staticmethod
    def _part_ctx(above: int, left: int, bsl: int) -> int:
        return ((int(left) >> bsl) & 1) * 2 + ((int(above) >> bsl) & 1) + \
            bsl * 4

    def _decode_tile(self, data: bytes, seq: SeqInfo, fr: FrameInfo):
        """Unified tile decode: key + inter frames, uniform tile columns,
        64→32 forced split, 32 NONE/SPLIT(16) partitions (chroma 16/8)."""
        w, h = seq.width, seq.height
        is_inter_frame = fr.frame_type == 1
        if is_inter_frame:
            ref = self.dpb[fr.ref_frame_idx[0]]
            _need(ref is not None, "missing reference frame")
            self._refp = tuple(pad_plane_np(p) for p in ref)
            self._refp2 = None
            if fr.reference_select:
                ref2 = self.dpb[fr.ref_frame_idx[6]]   # ALTREF slot
                _need(ref2 is not None, "missing ALTREF reference")
                self._refp2 = tuple(pad_plane_np(p) for p in ref2)
        # recon buffers and maps are SB-padded: bottom-row blocks may
        # legally overhang the true frame bottom (spec §5.11.4 hasRows);
        # output is cropped to the signaled size after the loop filters
        ph = -(-h // 64) * 64
        self._ph = ph
        self._part_map = np.zeros((ph // 32, w // 32), np.int32)
        self._part_sb_map = np.ones((ph // 64, w // 64), np.int32)
        self._y = np.zeros((ph, w), np.int32)
        self._u = np.zeros((ph // 2, w // 2), np.int32)
        self._v = np.zeros((ph // 2, w // 2), np.int32)
        self._cdef_idx = np.zeros((ph // 64, w // 64), np.int32)
        self._cdef_read = np.zeros((ph // 64, w // 64), bool)
        # CCSO per-plane 256x256-luma-unit on/off flags (fork graft)
        self._ccso_flags = np.zeros((3, -(-h // 256), -(-w // 256)),
                                    np.int32)
        self._skip8 = np.ones((ph // 8, w // 8), bool)
        sbh, sbw = ph // 64, w // 64
        self._lr_units = [
            {"type": np.zeros((sbh, sbw), np.int32),
             "eps": np.zeros((sbh, sbw), np.int32),
             "xqd": np.zeros((sbh, sbw, 2), np.int32),
             "taps_v": np.zeros((sbh, sbw, 3), np.int32),
             "taps_h": np.zeros((sbh, sbw, 3), np.int32)}
            for _ in range(3)]

        n_tiles = 1 << fr.tile_cols_log2
        if n_tiles == 1:
            chunks = [data]
        else:
            chunks = []
            off = 0
            for _ in range(n_tiles - 1):
                _need(off + 4 <= len(data), "truncated tile sizes")
                sz = int.from_bytes(data[off:off + 4], "little") + 1
                chunks.append(data[off + 4:off + 4 + sz])
                off += 4 + sz
            chunks.append(data[off:])
        tw = w // n_tiles
        for t, chunk in enumerate(chunks):
            end_cdf = self._decode_one_tile(chunk, seq, fr, is_inter_frame,
                                            t * tw, tw)
            if t == fr.context_update_tile_id:
                self._end_cdf = end_cdf
        return self._y, self._u, self._v

    def _decode_one_tile(self, data: bytes, seq: SeqInfo, fr: FrameInfo,
                         is_inter_frame: bool, x_off: int, tw: int):
        from ..ec.modes import (PARTITION_NONE, PARTITION_SPLIT,
                                read_partition_edge)

        w, h = seq.width, seq.height
        mi_rows = h // 4
        dec = RangeDecoder(data)
        if fr.primary_ref_frame != 7 and is_inter_frame:
            prev = self.dpb_cdf[fr.ref_frame_idx[fr.primary_ref_frame]]
            _need(prev is not None, "primary ref has no saved CDF state")
            cdf = prev.clone()
        else:
            cdf = CdfContext(fr.base_q_idx,
                             update=not fr.disable_cdf_update)
        st = _TileState(h // 4, tw // 4, tw, h)
        st.x_off = x_off
        st.y_rec, st.u_rec, st.v_rec = self._y, self._u, self._v
        from ..ec import lr_syntax as LRS
        lr_ref = [LRS.default_ref_state() for _ in range(3)]

        for sb_r in range(self._ph // 64):
            st.reset_sb_row()
            for sb_c in range(tw // 64):
                if any(t for t in fr.lr_frame_types):
                    sbc_f = sb_c + x_off // 64
                    for p in range(3):
                        ut, eps, xqd, tv, th = LRS.read_lr_unit(
                            dec, cdf, fr.lr_frame_types[p], lr_ref[p],
                            p > 0)
                        u = self._lr_units[p]
                        u["type"][sb_r, sbc_f] = ut
                        u["eps"][sb_r, sbc_f] = eps
                        u["xqd"][sb_r, sbc_f] = xqd
                        u["taps_v"][sb_r, sbc_f] = tv
                        u["taps_h"][sb_r, sbc_f] = th
                mi_c0 = sb_c * 16
                ctx = self._part_ctx(st.above_part[mi_c0], st.left_part[0],
                                     3)
                if sb_r * 16 + 8 < mi_rows:
                    t = cdf.partition_cdf[ctx]
                    p64 = dec.decode_symbol(t, 10)
                    cdf.update(t, p64)
                else:
                    # SB crosses the frame bottom: split_or_horz bool
                    p64 = read_partition_edge(dec, cdf, ctx, 64,
                                              False, True)
                if p64 == PARTITION_NONE:
                    self._part_sb_map[sb_r, sb_c + x_off // 64] = 0
                    self._decode_block(dec, cdf, st, sb_r * 16, sb_c * 16,
                                       64, sb_r * 2, sb_c * 2, seq, fr,
                                       is_inter_frame)
                    st.above_part[mi_c0:mi_c0 + 16] = 16
                    st.left_part[:] = 16
                    continue
                _need(p64 == PARTITION_SPLIT, "unsupported 64x64 partition")
                for qr, qc in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    br, bc = sb_r * 2 + qr, sb_c * 2 + qc
                    mi_r, mi_c = br * 8, bc * 8
                    if mi_r >= mi_rows:
                        continue         # quad below the frame bottom
                    ctx = self._part_ctx(st.above_part[mi_c],
                                         st.left_part[qr * 8], 2)
                    if mi_r + 4 < mi_rows:
                        t = cdf.partition_cdf[ctx]
                        p32 = dec.decode_symbol(t, 10)
                        cdf.update(t, p32)
                    else:
                        p32 = read_partition_edge(dec, cdf, ctx, 32,
                                                  False, True)
                    if p32 == PARTITION_NONE:
                        self._decode_block(dec, cdf, st, mi_r, mi_c, 32,
                                           br, bc, seq, fr, is_inter_frame)
                        st.above_part[mi_c:mi_c + 8] = 24
                        st.left_part[qr * 8:qr * 8 + 8] = 24
                    elif p32 == PARTITION_SPLIT:
                        self._part_map[br, bc + x_off // 32] = 1
                        for sr, sc in ((0, 0), (0, 1), (1, 0), (1, 1)):
                            smr = mi_r + sr * 4
                            smc = mi_c + sc * 4
                            if smr >= mi_rows:
                                continue  # 16-leaf below the frame bottom
                            lctx = self._part_ctx(
                                st.above_part[smc],
                                st.left_part[qr * 8 + sr * 4], 1)
                            if smr + 2 < mi_rows:
                                t = cdf.partition_cdf[lctx]
                                p16 = dec.decode_symbol(t, 10)
                                cdf.update(t, p16)
                            else:
                                p16 = read_partition_edge(dec, cdf, lctx,
                                                          16, False, True)
                            _need(p16 == PARTITION_NONE,
                                  "8x8/16x8 partitions unsupported")
                            self._decode_block(dec, cdf, st, smr, smc, 16,
                                               br, bc, seq, fr,
                                               is_inter_frame)
                            st.above_part[smc:smc + 4] = 28
                            lo = qr * 8 + sr * 4
                            st.left_part[lo:lo + 4] = 28
                    else:
                        raise DecodeError("unsupported partition type")
        self._skip8[:h // 8, x_off // 8:(x_off + tw) // 8] = \
            st.skip_grid[::2, ::2].astype(bool)
        return cdf

    def _decode_block(self, dec, cdf, st, mi_r, mi_c, bs, br, bc, seq, fr,
                      is_inter_frame):
        from ..spec.txfm import TX_8X8, TX_16X16, TX_32X32

        grid = st.grid
        bw4 = bs // 4
        have_above, have_left = mi_r > 0, mi_c > 0
        a_skip = int(st.skip_grid[mi_r - 1, mi_c]) if have_above else 0
        l_skip = int(st.skip_grid[mi_r, mi_c - 1]) if have_left else 0
        t = cdf.skip_cdfs[a_skip + l_skip]
        skip = dec.decode_symbol(t)
        cdf.update(t, skip)

        if seq.enable_cdef and not skip:
            # cdef_idx: literal at the first non-skip block per 64x64
            # (spec read_cdef; EbDecParseBlock.c read path)
            sbr = mi_r // 16
            sbc = (mi_c + getattr(st, "x_off", 0) // 4) // 16
            if not self._cdef_read[sbr, sbc]:
                val = 0
                for _ in range(fr.cdef_bits):
                    val = (val << 1) | dec.decode_bool(0x4000)
                self._cdef_idx[sbr, sbc] = val
                self._cdef_read[sbr, sbc] = True

        # CCSO unit flags (fork graft, EbEntropyCoding.c:4008 write_ccso
        # read path): first block of each 256x256-luma unit, skip or not
        mi_c_f = mi_c + getattr(st, "x_off", 0) // 4
        if fr.ccso is not None and mi_r % 64 == 0 and mi_c_f % 64 == 0:
            ur, uc = mi_r // 64, mi_c_f // 64
            for p in range(3):
                if fr.ccso["planes"][p] is not None:
                    t = cdf.ccso_cdf[p]
                    f = dec.decode_symbol(t)
                    cdf.update(t, f)
                    self._ccso_flags[p, ur, uc] = f

        y_mode = 0
        angle_delta = 0
        uv_mode = 0
        uv_angle_delta = 0
        mv = (0, 0)
        is_inter = False
        if is_inter_frame:
            above_inter = grid.is_inter(mi_r - 1, mi_c) if have_above \
                else None
            left_inter = grid.is_inter(mi_r, mi_c - 1) if have_left else None
            is_inter = IM.read_is_inter(
                dec, cdf, IM.intra_inter_ctx(above_inter, left_inter))
        mv1 = None
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
            is_comp = False
            if fr.reference_select:
                def nb_info(r, c, avail):
                    if not avail:
                        return None
                    return (grid.ref0[r, c] >= 1, int(grid.ref0[r, c]),
                            int(grid.ref1[r, c]))
                a_i = nb_info(mi_r - 1, mi_c, have_above)
                l_i = nb_info(mi_r, mi_c - 1, have_left)
                is_comp = IM.read_comp_mode(dec, cdf,
                                            IM.ref_mode_ctx(a_i, l_i))
            if is_comp:
                refs = IM.read_comp_refs(dec, cdf, a_i, l_i, counts)
                res = find_mv_stack(
                    grid, mi_r, mi_c, bw4, bw4, ref_frame=refs,
                    mi_col_off=getattr(st, "x_off", 0) // 4,
                    frame_mi_cols=seq.width // 4)
                cmode = IM.read_inter_compound_mode(dec, cdf,
                                                    res.mode_context)
                ref_mv_idx = 0
                if cmode == MV.NEW_NEWMV or MV.has_nearmv(cmode):
                    ref_mv_idx = IM.read_drl_idx(dec, cdf, cmode,
                                                 res.stack,
                                                 res.num_found)
                s0 = res.ref_list[0]
                if cmode == MV.NEAREST_NEARESTMV:
                    mv = _lp(s0[0], s0[1])
                    mv1 = _lp(s0[2], s0[3])
                elif cmode == MV.NEAR_NEARMV:
                    sn = (res.stack[1 + ref_mv_idx]
                          if len(res.stack) > 1 + ref_mv_idx
                          else (0, 0, 0, 0, 0))
                    mv = _lp(sn[0], sn[1])
                    mv1 = _lp(sn[2], sn[3])
                elif cmode == MV.GLOBAL_GLOBALMV:
                    mv, mv1 = (0, 0), (0, 0)
                elif cmode == MV.NEW_NEWMV:
                    sr = (res.stack[ref_mv_idx]
                          if len(res.stack) > ref_mv_idx
                          else (0, 0, 0, 0, 0))
                    mv = IM.read_mv(dec, cdf, _lp(sr[0], sr[1]))
                    mv1 = IM.read_mv(dec, cdf, _lp(sr[2], sr[3]))
                else:
                    raise DecodeError(
                        "mixed NEW/NEAREST compound modes unsupported")
                grid.set_block(mi_r, mi_c, bw4, bw4, refs[0], cmode,
                               mv[0], mv[1], ref1=refs[1], mv1r=mv1[0],
                               mv1c=mv1[1])
            else:
                IM.read_ref_frame_single(dec, cdf, counts)
                gmv = tuple((fr.gm_mv or {}).get(MV.LAST_FRAME, (0, 0)))
                res = find_mv_stack(
                    grid, mi_r, mi_c, bw4, bw4,
                    mi_col_off=getattr(st, "x_off", 0) // 4,
                    frame_mi_cols=seq.width // 4, gm_mv=gmv)
                mode = IM.read_inter_mode(dec, cdf, res.mode_context)
                ref_mv_idx = 0
                if mode in (MV.NEWMV, MV.NEARMV):
                    ref_mv_idx = IM.read_drl_idx(dec, cdf, mode,
                                                 res.stack,
                                                 res.num_found)
                if mode == MV.NEARESTMV:
                    mv = res.nearest_mv
                elif mode == MV.NEARMV:
                    mv = (_lp(*res.stack[1 + ref_mv_idx][:2])
                          if ref_mv_idx > 0 else res.near_mv)
                elif mode == MV.GLOBALMV:
                    mv = gmv
                else:
                    ref_mv = (_lp(*res.stack[ref_mv_idx][:2])
                              if res.num_found > 1 else res.nearest_mv)
                    mv = IM.read_mv(dec, cdf, ref_mv)
                grid.set_block(mi_r, mi_c, bw4, bw4, MV.LAST_FRAME, mode,
                               mv[0], mv[1])
        else:
            if is_inter_frame:
                sg = 3 if bs >= 32 else 2
                y_mode = dec.decode_symbol(cdf.y_mode_cdf[sg], 13)
                cdf.update(cdf.y_mode_cdf[sg], y_mode)
            else:
                a_mode = int(st.mode_grid[mi_r - 1, mi_c]) if have_above \
                    else 0
                l_mode = int(st.mode_grid[mi_r, mi_c - 1]) if have_left \
                    else 0
                t = cdf.kf_y_cdf[INTRA_MODE_CONTEXT[a_mode]][
                    INTRA_MODE_CONTEXT[l_mode]]
                y_mode = dec.decode_symbol(t)
                cdf.update(t, y_mode)
            if 1 <= y_mode <= 8:
                t = cdf.angle_delta_cdf[y_mode - 1]
                angle_delta = dec.decode_symbol(t) - 3
                cdf.update(t, angle_delta + 3)
            # CfL allowed only for blocks <= 32x32 (spec 5.11.5): the
            # 64x64 path reads the 13-symbol UV-mode CDF
            cfl = bs <= 32
            nsyms = 14 if cfl else 13
            t = cdf.uv_mode_cdf[int(cfl)][y_mode]
            uv_mode = dec.decode_symbol(t, nsyms)
            cdf.update(t, uv_mode, nsyms)
            _need(uv_mode < 13, "CfL not emitted by this encoder")
            if 1 <= uv_mode <= 8:
                t = cdf.angle_delta_cdf[uv_mode - 1]
                uv_angle_delta = dec.decode_symbol(t) - 3
                cdf.update(t, uv_angle_delta + 3)
            grid.set_block(mi_r, mi_c, bw4, bw4, MV.INTRA_FRAME, y_mode)
            st.mode_grid[mi_r:mi_r + bw4, mi_c:mi_c + bw4] = y_mode

        if bs == 64:
            from ..spec.txfm import TX_64X64
            tx_y, tx_uv = TX_64X64, TX_32X32
        else:
            tx_y = TX_32X32 if bs == 32 else TX_16X16
            tx_uv = TX_16X16 if bs == 32 else TX_8X8
        planes = ((0, st.y_rec, bs, tx_y),
                  (1, st.u_rec, bs // 2, tx_uv),
                  (2, st.v_rec, bs // 2, tx_uv))
        sb_mi_r = mi_r % 16
        x_off = getattr(st, "x_off", 0)
        for plane, rec, pbs, txs in planes:
            shift = 0 if plane == 0 else 1
            y0 = (mi_r * 4) >> shift
            x0 = ((mi_c * 4) + x_off) >> shift
            units = (bs >> shift) // 4
            # frame-bottom overhang: contexts read over in-frame units
            # only; beyond-edge left entries reset to 0 after the txb
            # (EbDecParseBlock.c:2117-2133, update_coeff_ctx :1644-1654)
            valid_px = (st.grid.mi_rows * 4) >> shift
            units_v = min(units, max(0, (valid_px - y0) // 4))
            au0 = ((mi_c * 4) >> shift) // 4
            lu0 = ((sb_mi_r * 4) >> shift) // 4
            if not skip:
                if plane == 0:
                    tctx = 0
                else:
                    a_nz = (st.above_cul[plane][au0:au0 + units] &
                            0x3F)[st.above_av[plane][au0:au0 + units]]
                    l_nz = (st.left_cul[plane][lu0:lu0 + units_v] &
                            0x3F)[st.left_av[plane][lu0:lu0 + units_v]]
                    tctx = 7 + int((a_nz != 0).any()) + \
                        int((l_nz != 0).any())
                signs = 0
                for culs, avs in ((st.above_cul[plane][au0:au0 + units],
                                   st.above_av[plane][au0:au0 + units]),
                                  (st.left_cul[plane][lu0:lu0 + units_v],
                                   st.left_av[plane][lu0:lu0 + units_v])):
                    for cl, av in zip(culs, avs):
                        if av:
                            sg = int(cl) >> 6
                            signs += 1 if sg == 2 else (-1 if sg == 1
                                                        else 0)
                dctx = 2 if signs > 0 else (1 if signs < 0 else 0)
                # TX_64X64 codes only its low 32x32 band (adjusted tx
                # size, spec §5.11.39); the rest of the block is zero
                rd_n = 32 if pbs == 64 else pbs
                lev, tx_type = read_coeffs_txb(
                    dec, cdf, rd_n, rd_n, txs, DCT_DCT,
                    min(plane, 1), tctx, dctx,
                    is_inter=is_inter, intra_mode=y_mode)
                if plane > 0 and not is_inter:
                    # chroma-intra tx type is implied by uv_mode (spec
                    # compute_tx_type; EbCommonUtils.h:67), clamped to
                    # DCT past 16x16
                    from ..spec.txfm import uv_intra_tx_type
                    tx_type = uv_intra_tx_type(uv_mode, txs)
                if rd_n != pbs:
                    full = np.zeros((pbs, pbs), lev.dtype)
                    full[:rd_n, :rd_n] = lev
                    lev = full
                cul = min(63, int(np.abs(lev).sum()))
                dcv = int(lev[0, 0])
                if dcv < 0:
                    cul |= 1 << 6
                elif dcv > 0:
                    cul += 2 << 6
            else:
                lev = np.zeros((pbs, pbs), np.int32)
                cul = 0
            st.above_cul[plane][au0:au0 + units] = cul
            st.above_av[plane][au0:au0 + units] = True
            st.left_cul[plane][lu0:lu0 + units_v] = cul
            st.left_cul[plane][lu0 + units_v:lu0 + units] = 0
            st.left_av[plane][lu0:lu0 + units] = True

            if is_inter and mv1 is not None:
                from ..ops.mc import predict_inter_block_np_compound
                pred = predict_inter_block_np_compound(
                    self._refp[plane], self._refp2[plane], y0, x0, mv,
                    mv1, seq.height, seq.width, pbs, shift,
                    seq.bit_depth, filt=fr.interpolation_filter)
            elif is_inter:
                pred = predict_inter_block_np(
                    self._refp[plane], y0, x0, mv, seq.height, seq.width,
                    pbs, shift, seq.bit_depth,
                    filt=fr.interpolation_filter)
            else:
                pred = self._predict(rec, y0, x0, pbs,
                                     y_mode if plane == 0 else uv_mode,
                                     angle_delta if plane == 0
                                     else uv_angle_delta,
                                     br, bc, seq, bs,
                                     ha=have_above, hl=have_left,
                                     tile_bw=st.mi_cols_t * 4 // 32,
                                     vh=seq.height >> shift)
            if lev.any():
                dq = dequantize(lev[None], txs, fr.base_q_idx,
                                seq.bit_depth)
                resid = inv_txfm2d(dq, txs, tx_type, seq.bit_depth)
                blk = np.asarray(add_residual_clip(pred[None], resid,
                                                   seq.bit_depth))[0]
            else:
                blk = pred
            rec[y0:y0 + pbs, x0:x0 + pbs] = blk

        st.skip_grid[mi_r:mi_r + bw4, mi_c:mi_c + bw4] = skip

    def _predict(self, rec, y0, x0, bs, mode, adelta, br, bc, seq,
                 luma_bs=32, ha=None, hl=None, tile_bw=None, vh=None):
        h, w = rec.shape
        # edge pixel rows clamp at the true plane height (spec §7.11.2
        # maxY): bottom-overhanging blocks replicate the last in-frame row
        vh = h if vh is None else vh
        base = 1 << (seq.bit_depth - 1)
        if ha is None:
            ha, hl = y0 > 0, x0 > 0
        if ha:
            above = rec[y0 - 1, x0:x0 + bs].astype(np.int32)
        elif hl:
            above = np.full(bs, rec[y0, x0 - 1], np.int32)
        else:
            above = np.full(bs, base - 1, np.int32)
        if hl:
            lrows = np.minimum(np.arange(y0, y0 + bs), vh - 1)
            left = rec[lrows, x0 - 1].astype(np.int32)
        elif ha:
            left = np.full(bs, rec[y0 - 1, x0], np.int32)
        else:
            left = np.full(bs, base + 1, np.int32)
        if ha and hl:
            corner = int(rec[y0 - 1, x0 - 1])
        elif ha:
            corner = int(rec[y0 - 1, x0])
        elif hl:
            corner = int(rec[y0, x0 - 1])
        else:
            corner = base

        if mode == intra.DC_PRED:
            return np.asarray(intra.dc_pred(above[None], left[None], ha, hl,
                                            seq.bit_depth))[0]
        if 1 <= mode <= 8 and mode not in (intra.V_PRED, intra.H_PRED):
            # extended-edge availability: z-order rule for full 32x32
            # blocks; 16x16 leaves only carry Z2-safe modes, for which the
            # extension is never read (replication is then normative)
            if luma_bs == 64 and bs == 64:
                # full-SB block: above-right SB is decoded (raster SB
                # order), below-left never is.  br/bc and tile_bw are in
                # 32-block units; compare at SB granularity.
                bw_sb = (tile_bw if tile_bw is not None else w // 32) // 2
                has_tr = br > 0 and bc // 2 + 1 < bw_sb
                has_bl = False
            elif luma_bs == 32 and bs >= 16:
                qr, qc = br % 2, bc % 2
                bh_blocks = h // bs
                bw_blocks = tile_bw if tile_bw is not None else w // bs
                if qr == 0:
                    has_tr = br > 0 and bc + 1 < bw_blocks
                else:
                    has_tr = qc == 0 and bc + 1 < bw_blocks
                has_bl = (qr == 0 and qc == 0 and bc > 0 and
                          br + 1 < bh_blocks)
            else:
                has_tr = has_bl = False
            if has_tr and ha:
                tr = rec[y0 - 1, x0 + bs:x0 + 2 * bs].astype(np.int32)
            else:
                tr = np.full(bs, above[-1], np.int32)
            if has_bl and hl:
                brows = np.minimum(np.arange(y0 + bs, y0 + 2 * bs), vh - 1)
                bl = rec[brows, x0 - 1].astype(np.int32)
            else:
                bl = np.full(bs, left[-1], np.int32)
            above_ext = np.concatenate([above, tr])
            left_ext = np.concatenate([left, bl])
            return np.asarray(dr_pred(mode, adelta, above_ext[None],
                                      left_ext[None],
                                      np.array([corner], np.int32), bs,
                                      seq.bit_depth))[0]
        return np.asarray(intra.predict(
            mode, above[None], left[None], np.array([corner], np.int32)))[0]

    # ---------------- public ---------------- #

    def decode_frame_obus(self, data: bytes):
        """Decode one temporal unit; returns (y, u, v) or None.

        Raises DecodeError on corrupt/unsupported input."""
        try:
            return self._decode_frame_obus(data)
        except DecodeError:
            raise
        except (AssertionError, IndexError, ValueError,
                NotImplementedError) as e:
            raise DecodeError(f"corrupt or unsupported stream: {e}") from e

    def _resolve_film_grain(self, fg):
        """Resolve update_grain=0 (load_grain_params): copy the stored
        slot params, keeping this frame's grain_seed (spec §6.8.20
        tempGrainSeed rule)."""
        if fg is None or "load_ref_idx" not in fg:
            return fg
        base = self.dpb_fg[fg["load_ref_idx"]]
        _need(base is not None, "film grain load from empty slot")
        out = dict(base)
        out["grain_seed"] = out["random_seed"] = fg["grain_seed"]
        return out

    def _output_frame(self, planes, fg, dt):
        """Display path: film grain synthesis applies to OUTPUT only —
        references stay grain-free (§7.18)."""
        if fg is None:
            return tuple(np.asarray(p).astype(dt) for p in planes)
        from ..ops.film_grain import apply_film_grain
        out = apply_film_grain(
            fg, tuple(np.asarray(p).astype(np.uint8) for p in planes))
        return tuple(p.astype(dt) for p in out)

    def _decode_frame_obus(self, data: bytes):
        frame = None
        for obu_type, _, _, payload in parse_obus(data):
            if obu_type == OBU_SEQUENCE_HEADER:
                self.seq = self._parse_sequence_header(payload)
            elif obu_type == 5:        # OBU_METADATA (§5.8)
                from ..utils.metadata import parse_metadata_payload
                try:
                    self.metadata.append(parse_metadata_payload(payload))
                except Exception:
                    pass               # unknown metadata is skippable
            elif obu_type == OBU_FRAME:
                _need(self.seq is not None, "frame before sequence header")
                r = BitReader(payload)
                fr = self._parse_frame_header(r, self.seq)
                r.byte_align()
                if fr.tile_cols_log2 > 0:
                    # tile_group_obu: tile_start_and_end flag, then align
                    _need(r.bit() == 0, "tile_start_and_end_present")
                    r.byte_align()
                tile_data = payload[r.bits_read // 8:]
                self._end_cdf = None
                y, u, v = self._decode_tile(tile_data, self.seq, fr)
                th = self.seq.height
                vh = None if y.shape[0] == th else th
                vhc = None if vh is None else vh // 2
                if fr.filter_level[0] or fr.filter_level[1]:
                    pm = self._part_map
                    psb = self._part_sb_map
                    y = np.asarray(deblock_plane_part(
                        y, pm, 32, 14, fr.filter_level[0],
                        fr.filter_level[1], fr.lf_sharpness,
                        bd=self.seq.bit_depth, part_sb=psb, valid_h=vh))
                    u = np.asarray(deblock_plane_part(
                        u, pm, 16, 6, fr.filter_level_u,
                        fr.filter_level_u, fr.lf_sharpness,
                        bd=self.seq.bit_depth, part_sb=psb, valid_h=vhc))
                    v = np.asarray(deblock_plane_part(
                        v, pm, 16, 6, fr.filter_level_v,
                        fr.filter_level_v, fr.lf_sharpness,
                        bd=self.seq.bit_depth, part_sb=psb, valid_h=vhc))
                # crop the SB-padded recon to the signaled frame size;
                # every later stage (CDEF/LR/refs/output) sees true dims
                y, u, v = y[:th], u[:th // 2], v[:th // 2]
                db_planes = (y.copy(), u.copy(), v.copy())
                if self.seq.enable_cdef and any(
                        p or s for p, s in (fr.cdef_y_strengths +
                                            fr.cdef_uv_strengths)):
                    from ..ops.cdef import cdef_apply_params
                    params = {"damping": fr.cdef_damping,
                              "bits": fr.cdef_bits,
                              "y_strengths": fr.cdef_y_strengths,
                              "uv_strengths": fr.cdef_uv_strengths,
                              "idx_map": self._cdef_idx}
                    y, u, v = (np.asarray(p) for p in cdef_apply_params(
                        (y, u, v), self._skip8, params,
                        self.seq.bit_depth))
                if fr.ccso is not None:
                    # fork graft: correct post-CDEF planes from the
                    # pre-CDEF luma (EbCcso.c:626 ccso_frame dataflow)
                    from ..ops.ccso import ccso_apply_frame
                    info = {"planes": [
                        (dict(pi, flags=self._ccso_flags[p])
                         if pi is not None else None)
                        for p, pi in enumerate(fr.ccso["planes"])]}
                    y, u, v = ccso_apply_frame((y, u, v), db_planes[0],
                                               info, self.seq.bit_depth)
                if any(fr.lr_frame_types):
                    from ..ops.lr_frame import lr_apply_frame
                    infos = [self._lr_units[p] if fr.lr_frame_types[p]
                             else None for p in range(3)]
                    y, u, v = lr_apply_frame((y, u, v), db_planes, infos,
                                             self.seq.bit_depth)
                dt = np.uint8 if self.seq.bit_depth == 8 else np.uint16
                fg = self._resolve_film_grain(fr.film_grain)
                if fr.show_frame:
                    frame = self._output_frame((y, u, v), fg, dt)
                refresh = (0xFF if fr.frame_type == 0
                           else fr.refresh_frame_flags)
                ref_entry = (y.astype(np.int32), u.astype(np.int32),
                             v.astype(np.int32))
                end_cdf = None
                if (not fr.disable_cdf_update and
                        not fr.disable_frame_end_update_cdf and
                        self._end_cdf is not None):
                    end_cdf = self._end_cdf.snapshot()
                for slot in range(8):
                    if refresh & (1 << slot):
                        self.dpb[slot] = ref_entry
                        self.dpb_cdf[slot] = end_cdf
                        self.dpb_fg[slot] = fg
                        self.dpb_gm[slot] = dict(fr.gm_mv or {})
            elif obu_type == OBU_FRAME_HEADER:
                _need(self.seq is not None, "header before sequence header")
                fr = self._parse_frame_header(BitReader(payload), self.seq)
                _need(fr.show_existing_idx >= 0,
                      "separate non-show_existing frame header OBUs")
                ent = self.dpb[fr.show_existing_idx]
                _need(ent is not None, "show_existing of empty slot")
                dt = np.uint8 if self.seq.bit_depth == 8 else np.uint16
                frame = self._output_frame(
                    ent, self.dpb_fg[fr.show_existing_idx], dt)
            elif obu_type == OBU_TILE_GROUP:
                raise NotImplementedError("separate tile group OBUs")
        return frame

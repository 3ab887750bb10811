"""All-intra AV1 encoder — the minimum end-to-end slice (SURVEY.md §7 phase 3).

Architecture (TPU-native, not a port of the reference's SRM pipeline):
  1. Device stage: mode decision + conformant reconstruction as batched jitted
     ops over anti-diagonal wavefronts of 32x32 blocks (the wavefront replaces
     the reference's EncDec segment FIFOs, EbEncDecProcess.c:3266).
     Every candidate mode is evaluated with the real normative ops
     (fwd/inv transform, quant) so the chosen levels/recon are bit-final.
  2. Host stage: tile entropy coding in SB z-order with full AV1 neighbor
     contexts (reference: EbEntropyCoding.c write path), headers, IVF.

Round-1 scope: 8-bit 4:2:0, single tile, fixed-QP, 64x64 SBs force-split to
32x32 luma blocks (TX 32x32 DCT, no tx-type signaling), smooth/DC/V/H/PAETH
mode family.  Output is standard AV1 decodable by dav1d/libaom.
"""

from __future__ import annotations

from dataclasses import dataclass

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import modes as M
from ..ec.coeffs import write_coeffs_txb
from ..ec.range_coder import RangeEncoder
from ..ops import intra
from ..ops.quant import dequantize, quantize
from ..ops.deblock import deblock_plane_part, deblock_plane_uniform
from ..ops.transforms import add_residual_clip, fwd_txfm2d, inv_txfm2d
from ..spec import tables as tbl
from ..spec.cdf import CdfContext
from ..spec.txfm import TX_16X16, TX_32X32, DCT_DCT
from .headers import FrameConfig, SequenceConfig, assemble_key_frame
from .wavefront import encode_plane_wavefront, expand_candidates

BLK = 32          # luma block size
CBLK = 16         # chroma block size (4:2:0)
SB = 64

# all 13 intra modes (the z-order wavefront supplies conformant
# above-right / below-left edges for the directional predictors)
CAND_MODES = (intra.DC_PRED, intra.V_PRED, intra.H_PRED,
              intra.D45_PRED, intra.D135_PRED, intra.D113_PRED,
              intra.D157_PRED, intra.D203_PRED, intra.D67_PRED,
              intra.SMOOTH_PRED, intra.SMOOTH_V_PRED, intra.SMOOTH_H_PRED,
              intra.PAETH_PRED)


@dataclass
class EncoderConfig:
    width: int
    height: int
    qindex: int = 100
    bit_depth: int = 8
    cdf_update: bool = True
    lf_level: int = -1          # -1 → derive from qindex; 0 → off
    angle_deltas: tuple = (0,)  # e.g. (-2, 0, 2) widens directional search
    part_search: bool = True    # 32x32 NONE vs SPLIT(16x16) RD decision
    tile_cols: int = 1          # power-of-two uniform tile columns
    enable_cdef: bool = False   # CDEF search + in-loop filter + signaling
    enable_lr: bool = False     # loop restoration (SGR search + signaling)
    enable_ccso: bool = False   # fork-grafted CCSO (NONSTANDARD streams:
                                # dav1d rejects them, like the fork's own
                                # output; decode with our Decoder(ccso=True))
    tx_search: bool = True      # tx-type RD on 16x16 intra luma leaves
    filter_search: bool = True  # frame-level interp filter decision
                                # (REGULAR/SMOOTH/SHARP) on inter frames
    film_grain: int = 0         # grain synthesis strength 0(off)..50:
                                # noise_model estimation + §5.9.30 syntax
    metadata: bytes = b""       # pre-wrapped OBU_METADATA bytes emitted
                                # in the first TU (utils/metadata.py;
                                # EbMetadataHandle.c analogue)
    gm_search: bool = True      # translation global-motion fit from the
                                # ME field on single-ref inter frames
                                # (EbGlobalMotionEstimation.c analogue)


def _lambda(qindex: int) -> float:
    dc, ac = tbl.qindex_to_dq(qindex, 8)
    return 0.035 * float(ac) * float(ac) / 16.0


class IntraEncoder:
    def __init__(self, cfg: EncoderConfig):
        from .geometry import check_dims, pad64
        check_dims(cfg.width, cfg.height, cfg.part_search,
                   inloop_extras=(cfg.enable_cdef or cfg.enable_lr or
                                  cfg.enable_ccso))
        # source is padded to SB multiples; the bitstream signals the true
        # frame size and bottom-row blocks legally overhang (geometry.py)
        self.ph = pad64(cfg.height)
        t = cfg.tile_cols
        if t < 1 or (t & (t - 1)):
            raise ValueError("tile_cols must be a power of two")
        if t > 1 and ((cfg.width // SB) % t or not cfg.part_search):
            raise NotImplementedError(
                "tile columns need SB-aligned equal widths and the "
                "partition (general) coding path")
        if (cfg.enable_cdef or cfg.enable_lr or cfg.enable_ccso) \
                and not cfg.part_search:
            raise NotImplementedError(
                "CDEF/LR/CCSO ride the partition coding path "
                "(part_search=True)")
        self.cfg = cfg
        self.seq = SequenceConfig(cfg.width, cfg.height, cfg.bit_depth,
                                  enable_cdef=cfg.enable_cdef,
                                  enable_restoration=cfg.enable_lr,
                                  ccso_fork_mode=cfg.enable_ccso,
                                  film_grain_params_present=(
                                      cfg.film_grain > 0))
        self._first = True
        self._fg_params = None       # estimated on the first source frame
        self._fg_n = 0               # per-frame grain_seed counter

    def film_grain_for(self, frame):
        """Per-frame film_grain header dict (or None).  Estimates the
        grain model from the first frame seen (noise_model.c flow)."""
        cfg = self.cfg
        if not cfg.film_grain or cfg.bit_depth != 8:
            return None
        if self._fg_params is None:
            from .noise_model import estimate_grain_params
            p = estimate_grain_params(frame[0], frame[1], frame[2],
                                      strength=cfg.film_grain / 8.0)
            self._fg_params = p if p is not None else False
        if self._fg_params is False:
            return None
        self._fg_n += 1
        seed = (7391 + 3461 * self._fg_n) & 0xFFFF
        return dict(self._fg_params, grain_seed=seed, random_seed=seed)

    # ------------------------------------------------------------------ #

    # capped-CRF (reference: EbRateControlProcess.c:2594 capped_crf +
    # the re-encode entry EbEncDecProcess.c:3222): frames whose coded
    # size exceeds cap_bits re-encode at a higher qindex.  Set by the
    # CLI's --mbr (app.py); 0 disables.
    cap_bits: int = 0
    _CAP_QSTEPS = (24, 48, 88)

    def _capped_recode(self, frames, payloads, recons, first0: bool):
        if not self.cap_bits:
            return payloads, recons
        from dataclasses import replace as _rp
        for b, p in enumerate(payloads):
            if len(p) * 8 <= self.cap_bits:
                continue
            q0 = self.cfg.qindex
            for step in self._CAP_QSTEPS:
                q2 = min(255, q0 + step)
                sub = IntraEncoder(_rp(self.cfg, qindex=q2))
                sub._first = first0 and b == 0
                sub._fg_params = self._fg_params
                sub.use_native = getattr(self, "use_native", True)
                ps, rs = sub.host_finish(sub.device_encode([frames[b]]))
                if len(ps[0]) * 8 <= self.cap_bits or q2 >= 255:
                    break
            payloads[b] = ps[0]
            recons[b] = rs[0]
        return payloads, recons

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        payloads, recons = self.encode_frames([(y, u, v)])
        return payloads[0], recons[0]

    def encode_frames(self, frames):
        return self.host_finish(self.device_encode(frames))

    def device_encode(self, frames):
        """Dispatch the device stage for a batch (async — returns device
        arrays without blocking, so host entropy coding of the previous
        batch can overlap; the reference's process pipelining,
        SURVEY.md §2.9)."""
        cfg = self.cfg
        from .geometry import pad_plane_bottom
        yb = pad_plane_bottom(np.stack([f[0] for f in frames]), self.ph)
        ub = pad_plane_bottom(np.stack([f[1] for f in frames]),
                              self.ph // 2)
        vb = pad_plane_bottom(np.stack([f[2] for f in frames]),
                              self.ph // 2)
        bd = cfg.bit_depth
        vh = None if self.ph == cfg.height else cfg.height
        vhc = None if vh is None else vh // 2
        if cfg.part_search:
            return self._device_encode_part(yb, ub, vb, frames)
        # the Pallas wavefront kernel (pallas/wavefront_kernel.py) runs
        # the whole schedule in one kernel with boundary state in VMEM.
        # Interpret-verified bit-equal to the XLA scan; on current
        # Mosaic the 1080p compile exceeds any practical budget (see
        # STATUS.md round-5 notes), so it is opt-in: SVT_TPU_PALLAS=1.
        use_pl = (bd == 8 and cfg.angle_deltas == (0,) and
                  os.environ.get("SVT_TPU_PALLAS", "0") == "1" and
                  jax.default_backend() not in ("cpu",))
        if use_pl:
            from ..pallas.wavefront_kernel import encode_plane_wavefront_pl
            wf = encode_plane_wavefront_pl
        else:
            wf = encode_plane_wavefront
        y_mi, y_lev, y_rec = wf(
            yb, BLK, TX_32X32, cfg.qindex, CAND_MODES, bd,
            tuple(cfg.angle_deltas), valid_h=vh)
        # U and V ride one wavefront on the batch axis (same modes/shape:
        # halves the sequential chroma scans); paired=True makes each
        # (u,v) pair agree on ONE uv_mode — full chroma mode decision
        # (the reference's chroma MD, EbModeDecision.c uv search; round 3
        # hard-coded DC here)
        uvb = np.concatenate([ub, vb])
        uv_mi, uv_lev, uv_rec = wf(
            uvb, CBLK, TX_16X16, cfg.qindex, CAND_MODES, bd,
            valid_h=vhc, paired=True, kf="uv", uv_tx=True)
        lf = self.lf_levels()
        if lf[0] or lf[1]:
            y_rec = deblock_plane_uniform(y_rec, BLK, 14, lf[0], lf[1],
                                          bd=bd, valid_h=vh)
            uv_rec = deblock_plane_uniform(uv_rec, CBLK, 6, lf[2], lf[2],
                                           bd=bd, valid_h=vhc)
        # wire format: levels stay dense on device; host_finish pulls them
        # through the adaptive int8+sparse-high format (xfer.py) — the
        # tunnel moves ~20MB/s, so the wire format is the e2e budget
        pix = jnp.uint8 if bd == 8 else jnp.uint16
        return {"n": len(frames), "y_mi": y_mi, "uv_mi": uv_mi,
                "y_lev": y_lev, "uv_lev": uv_lev,
                "y_rec": y_rec.astype(pix), "uv_rec": uv_rec.astype(pix),
                "frames": frames}

    def _device_encode_part(self, yb, ub, vb, frames):
        """Partition-search device stage (32 NONE vs SPLIT 16).  Tile
        columns ride the batch axis: [T*B, h, w/T] slices encode
        independently — exactly the tile semantics (availability stops at
        tile edges), and the axis shards over a device mesh unchanged."""
        import jax.numpy as jnp
        from ..spec.txfm import TX_8X8
        from .wavefront2 import SUB_MODES, encode_plane_wavefront_part

        cfg = self.cfg
        bd = cfg.bit_depth
        T = cfg.tile_cols
        if T > 1:
            tw = yb.shape[2] // T
            yb = np.concatenate([yb[:, :, t * tw:(t + 1) * tw]
                                 for t in range(T)])
            twc = ub.shape[2] // T
            ub = np.concatenate([ub[:, :, t * twc:(t + 1) * twc]
                                 for t in range(T)])
            vb = np.concatenate([vb[:, :, t * twc:(t + 1) * twc]
                                 for t in range(T)])
        if getattr(self, "batch_sharding", None) is not None:
            # multi-chip: tiles (stacked on the batch axis) shard over the
            # device mesh — each tile encodes on its own chip, and the
            # resulting bitstream is byte-identical to the 1-device run
            import jax
            yb = jax.device_put(jnp.asarray(yb), self.batch_sharding)
            ub = jax.device_put(jnp.asarray(ub), self.batch_sharding)
            vb = jax.device_put(jnp.asarray(vb), self.batch_sharding)
        B, h, w = yb.shape
        bh, bw = h // BLK, w // BLK
        sh, sw = h // 64, w // 64
        vh = None if self.ph == cfg.height else cfg.height
        vhc = None if vh is None else vh // 2
        from ..spec.txfm import TX_64X64
        from .geometry import bottom_force_masks
        dummy_p = jnp.zeros((B, 1, bh, bw, 1, 1), jnp.int32)
        dummy_r = jnp.zeros((B, 1, bh, bw), jnp.float32)
        dummy_rs = jnp.zeros((B, 1, bh, bw, 4), jnp.float32)
        dummy_o = jnp.zeros((B, 1, bh, bw), bool)
        dummy_os = jnp.zeros((B, 1, bh, bw, 4), bool)
        dummy_psb = jnp.zeros((B, 1, sh, sw, 1, 1), jnp.int32)
        dummy_rsb = jnp.zeros((B, 1, sh, sw), jnp.float32)
        dummy_osb = jnp.zeros((B, 1, sh, sw), bool)
        ones = jnp.ones((B, bh, bw), bool)
        ones4 = jnp.ones((B, bh, bw, 4), bool)
        ones_sb = jnp.ones((B, sh, sw), bool)
        free_np, free_sb_np = bottom_force_masks(bh, bw, sh, sw,
                                                 cfg.height // 4)
        free = jnp.asarray(np.broadcast_to(free_np, (B, bh, bw)))
        free_sb = jnp.asarray(np.broadcast_to(free_sb_np, (B, sh, sw)))
        (part, y_mi, y_lev, y_smi, y_slev, y_stx, y_rec,
         part_sb, y_mi_sb, y_lev_sb) = \
            encode_plane_wavefront_part(
                jnp.asarray(yb), BLK, TX_32X32, TX_16X16, cfg.qindex,
                dummy_p, dummy_r, dummy_p, dummy_rs, dummy_o, dummy_os,
                ones, ones4, free, 0, CAND_MODES, SUB_MODES, bd,
                tuple(cfg.angle_deltas), True, cfg.tx_search,
                sb_search=True, tx_sb=TX_64X64, extra_sb=dummy_psb,
                extra_rate_sb=dummy_rsb, extra_ok_sb=dummy_osb,
                intra_ok_sb=ones_sb, force_sb=free_sb, valid_h=vh)
        # U and V ride one paired wavefront: the partition tree is forced
        # by luma and each (u,v) pair picks the SAME uv_mode (chroma mode
        # decision — the reference's chroma MD, EbModeDecision.c)
        from .wavefront2 import (CHROMA_SB_MODES, CHROMA_SUB_MODES,
                                 CHROMA_TOP_MODES)
        two = lambda a: jnp.concatenate([a, a])
        uvb2 = jnp.asarray(np.concatenate([ub, vb]))
        dummy2_p = two(dummy_p)
        dummy2_r = two(dummy_r)
        dummy2_rs = two(dummy_rs)
        dummy2_o = two(dummy_o)
        dummy2_os = two(dummy_os)
        dummy2_psb = two(dummy_psb)
        dummy2_rsb = two(dummy_rsb)
        dummy2_osb = two(dummy_osb)
        (_, uv_mi, uv_lev, uv_smi, uv_slev, _, uv_rec,
         _, uv_mi_sb, uv_lev_sb) = \
            encode_plane_wavefront_part(
                uvb2, CBLK, TX_16X16, TX_8X8, cfg.qindex,
                dummy2_p, dummy2_r, dummy2_p, dummy2_rs, dummy2_o,
                dummy2_os, two(ones), two(ones4), two(part), 0,
                CHROMA_TOP_MODES, CHROMA_SUB_MODES,
                bd, (0,), True,
                sb_search=True, tx_sb=TX_32X32, extra_sb=dummy2_psb,
                extra_rate_sb=dummy2_rsb, extra_ok_sb=dummy2_osb,
                intra_ok_sb=two(ones_sb), force_sb=two(part_sb),
                valid_h=vhc, paired=True, uv_rates=True,
                modes_sbl=CHROMA_SB_MODES, uv_tx=True)
        u_mi, u_lev, u_smi, u_slev = (uv_mi[:B], uv_lev[:B], uv_smi[:B],
                                      uv_slev[:B])
        u_rec, u_lev_sb = uv_rec[:B], uv_lev_sb[:B]
        v_lev, v_slev, v_rec, v_lev_sb = (uv_lev[B:], uv_slev[B:],
                                          uv_rec[B:], uv_lev_sb[B:])
        uv_mi, uv_smi, uv_mi_sb = uv_mi[:B], uv_smi[:B], uv_mi_sb[:B]
        if T > 1:
            # reassemble full-frame planes/maps from the tile axis for
            # deblocking (the loop filter crosses tile boundaries)
            nB = B // T
            unt = lambda a: jnp.concatenate(
                [a[t * nB:(t + 1) * nB] for t in range(T)], axis=2)
            y_rec = unt(y_rec)
            u_rec = unt(u_rec)
            v_rec = unt(v_rec)
            part_f = unt(part)
            part_sb_f = unt(part_sb)
        else:
            part_f = part
            part_sb_f = part_sb
        lf = self.lf_levels()
        if cfg.lf_level < 0:
            # frame-level DLF RDO (EbDeblockingFilter.c search): sweep
            # luma levels around the heuristic, batch-summed SSE
            from ..ops.deblock import dlf_sse_part
            base = lf[0]
            cand = [0, max(1, base // 2), max(1, base * 3 // 4),
                    max(1, base), base * 5 // 4 + 1, base * 3 // 2 + 1]
            cand = [min(63, c) for c in cand]
            src_y = jnp.asarray(yb).astype(jnp.int32)
            if T > 1:
                src_y = jnp.concatenate(
                    [src_y[t * (B // T):(t + 1) * (B // T)]
                     for t in range(T)], axis=2)
            sse = np.asarray(dlf_sse_part(
                y_rec, src_y, part_f, jnp.asarray(cand, jnp.int32),
                BLK, 14, bd=bd, part_sb=part_sb_f, valid_h=vh))
            l = int(cand[int(np.argmin(sse))])
            lc = max(0, l * 3 // 4)
            lf = (l, l, lc, lc)
        if lf[0] or lf[1]:
            y_rec = deblock_plane_part(y_rec, part_f, BLK, 14, lf[0],
                                       lf[1], bd=bd, part_sb=part_sb_f,
                                       valid_h=vh)
            u_rec = deblock_plane_part(u_rec, part_f, CBLK, 6, lf[2],
                                       lf[2], bd=bd, part_sb=part_sb_f,
                                       valid_h=vhc)
            v_rec = deblock_plane_part(v_rec, part_f, CBLK, 6, lf[3],
                                       lf[3], bd=bd, part_sb=part_sb_f,
                                       valid_h=vhc)
        return ("part", yb.shape[0] // T, part, y_mi, y_lev, y_smi, y_slev,
                u_lev, u_slev, v_lev, v_slev, y_stx, y_rec, u_rec, v_rec,
                frames, part_sb, y_mi_sb, y_lev_sb, u_lev_sb, v_lev_sb,
                uv_mi, uv_smi, uv_mi_sb, lf)

    def _host_finish_part(self, dev):
        from .tile_codec import TileCoder
        from .wavefront2 import SUB_MODES

        first0 = self._first
        cfg = self.cfg
        (_, n, part, y_mi, y_lev, y_smi, y_slev, u_lev, u_slev, v_lev,
         v_slev, y_stx, y_rec, u_rec, v_rec, frames,
         part_sb, y_mi_sb, y_lev_sb, u_lev_sb, v_lev_sb,
         uv_mi, uv_smi, uv_mi_sb, lfv) = dev
        # compact wire format (xfer.py): scan-packed adaptive fetch for
        # the coefficient tensors, narrow pixel dtype for the recons —
        # the dense int32 transfer dominated host time on the ~30MB/s
        # tunnel (see the flat path / video path for the same treatment)
        from ..spec.txfm import TX_8X8
        from .xfer import fetch_levels

        def _fl(lev, txs, n2):
            return fetch_levels(lev, txs, DCT_DCT, (n2, n2))

        y_lev = _fl(y_lev, TX_32X32, BLK)
        y_slev = _fl(y_slev, TX_16X16, 16)
        u_lev = _fl(u_lev, TX_16X16, CBLK)
        v_lev = _fl(v_lev, TX_16X16, CBLK)
        u_slev = _fl(u_slev, TX_8X8, 8)
        v_slev = _fl(v_slev, TX_8X8, 8)
        y_lev_sb = _fl(y_lev_sb, TX_32X32, 32)
        u_lev_sb = _fl(u_lev_sb, TX_32X32, 32)
        v_lev_sb = _fl(v_lev_sb, TX_32X32, 32)
        pix8 = jnp.uint8 if cfg.bit_depth == 8 else jnp.uint16
        y_rec = np.asarray(y_rec.astype(pix8)).astype(np.int32)
        u_rec = np.asarray(u_rec.astype(pix8)).astype(np.int32)
        v_rec = np.asarray(v_rec.astype(pix8)).astype(np.int32)
        arrs = [np.asarray(a) for a in
                (part, y_mi, y_smi, y_stx, part_sb, y_mi_sb,
                 uv_mi, uv_smi, uv_mi_sb)]
        (part, y_mi, y_smi, y_stx, part_sb, y_mi_sb,
         uv_mi, uv_smi, uv_mi_sb) = arrs
        from .wavefront2 import (CHROMA_SB_MODES, CHROMA_SUB_MODES,
                                 CHROMA_TOP_MODES)
        uvm_top = np.array([m for m, _ in expand_candidates(
            CHROMA_TOP_MODES, (0,))], np.int32)
        uvm_sub = np.array([m for m, _ in expand_candidates(
            CHROMA_SUB_MODES, (0,))], np.int32)
        uvm_sb = np.array([m for m, _ in expand_candidates(
            CHROMA_SB_MODES, (0,))], np.int32)
        uv_top = uvm_top[np.clip(uv_mi, 0, len(uvm_top) - 1)]
        uv_sub = uvm_sub[np.clip(uv_smi, 0, len(uvm_sub) - 1)]
        uv_sb = uvm_sb[np.clip(uv_mi_sb, 0, len(uvm_sb) - 1)]
        cands = expand_candidates(CAND_MODES, tuple(cfg.angle_deltas))
        cands_sub = expand_candidates(SUB_MODES, (0,))
        T = cfg.tile_cols
        tw = cfg.width // T
        tlog = T.bit_length() - 1
        sbw_t = tw // SB
        payloads, recons = [], []
        for b in range(n):
            cdef_kw, cdef_params = {}, None
            rec_b = (y_rec[b], u_rec[b], v_rec[b])
            if cfg.enable_cdef:
                from ..ops.cdef import cdef_apply_params
                from .cdef_search import (build_skip8,
                                          cdef_frame_config_fields,
                                          cdef_search_frame)
                skip8 = np.concatenate(
                    [build_skip8(part[t * n + b], y_lev[t * n + b],
                                 u_lev[t * n + b], v_lev[t * n + b],
                                 y_slev[t * n + b], u_slev[t * n + b],
                                 v_slev[t * n + b], part_sb[t * n + b],
                                 y_lev_sb[t * n + b], u_lev_sb[t * n + b],
                                 v_lev_sb[t * n + b]) for t in range(T)],
                    axis=1)
                src = tuple(np.asarray(p, np.int32) for p in frames[b])
                cdef_params = cdef_search_frame(
                    src, rec_b, skip8, cfg.qindex, _lambda(cfg.qindex),
                    cfg.bit_depth)
                db_b = rec_b
                rec_b = tuple(np.asarray(p) for p in cdef_apply_params(
                    rec_b, skip8, cdef_params, cfg.bit_depth))
                cdef_kw = cdef_frame_config_fields(cdef_params)
            ccso_info = None
            if cfg.enable_ccso:
                # fork graft: search + apply between CDEF and LR
                from ..ops.ccso import ccso_apply_frame
                from .ccso_search import ccso_search_frame
                if not cfg.enable_cdef:
                    db_b = rec_b
                src = tuple(np.asarray(p, np.int64) for p in frames[b])
                ccso_info = ccso_search_frame(
                    src, rec_b, db_b[0], _lambda(cfg.qindex),
                    cfg.bit_depth)
                if ccso_info is not None:
                    rec_b = ccso_apply_frame(rec_b, db_b[0], ccso_info,
                                             cfg.bit_depth)
            lr_types, lr_infos = (0, 0, 0), None
            if cfg.enable_lr:
                from ..ops.lr_frame import lr_apply_frame
                from .lr_search import lr_search_frame
                if not cfg.enable_cdef and not cfg.enable_ccso:
                    db_b = rec_b
                src = tuple(np.asarray(p, np.int32) for p in frames[b])
                lr_types, lr_infos = lr_search_frame(
                    src, rec_b, _lambda(cfg.qindex), cfg.bit_depth)
                if any(lr_types):
                    rec_b = lr_apply_frame(rec_b, db_b, lr_infos,
                                           cfg.bit_depth)
            tiles = []
            for t in range(T):
                i = t * n + b         # tile-major batch layout
                tc = TileCoder(tw, self.ph, cfg.qindex,
                               cfg.cdf_update, kf=True,
                               mi_col_off=t * tw // 4,
                               frame_mi_cols=cfg.width // 4,
                               true_h=cfg.height,
                               cdef_bits=(cdef_params["bits"]
                                          if cdef_params else 0),
                               cdef_idx=(cdef_params["idx_map"]
                                         [:, t * sbw_t:(t + 1) * sbw_t]
                                         if cdef_params else None))
                tc.ccso_info = ccso_info
                if any(lr_types):
                    sl = slice(t * sbw_t, (t + 1) * sbw_t)
                    tc.set_lr(lr_types, [
                        ({k: v[:, sl] for k, v in u.items()}
                         if u is not None else None)
                        for u in lr_infos])
                tile, _ = tc.encode(part[i], y_mi[i], y_lev[i], u_lev[i],
                                    v_lev[i], y_smi[i], y_slev[i],
                                    u_slev[i], v_slev[i], None, None,
                                    cands, cands_sub, len(cands),
                                    len(cands_sub), stx_sub=y_stx[i],
                                    part_sb=part_sb[i], mi_sb=y_mi_sb[i],
                                    lev_sb_y=y_lev_sb[i],
                                    lev_sb_u=u_lev_sb[i],
                                    lev_sb_v=v_lev_sb[i],
                                    uv_top=uv_top[i], uv_sub=uv_sub[i],
                                    uv_sb=uv_sb[i])
                tiles.append(tile)
            fr = FrameConfig(base_q_idx=cfg.qindex,
                             disable_cdf_update=not cfg.cdf_update,
                             filter_level=(lfv[0], lfv[1]),
                             filter_level_u=lfv[2], filter_level_v=lfv[3],
                             tile_cols_log2=tlog,
                             lr_frame_types=lr_types, ccso=ccso_info,
                             film_grain=self.film_grain_for(frames[b]),
                             **cdef_kw)
            payloads.append(assemble_key_frame(
                self.seq, fr, tiles if T > 1 else tiles[0],
                first=self._first,
                metadata=cfg.metadata if self._first else b""))
            self._first = False
            ch, cch = cfg.height, cfg.height // 2
            recons.append((rec_b[0][:ch], rec_b[1][:cch], rec_b[2][:cch]))
        return self._capped_recode(frames, payloads, recons, first0)

    def host_finish(self, dev):
        """Entropy-code a device batch (blocks on the device arrays)."""
        if isinstance(dev, tuple) and dev and dev[0] == "part":
            return self._host_finish_part(dev)
        cfg = self.cfg
        first0 = self._first
        n, y_mi, frames = dev["n"], np.asarray(dev["y_mi"]), dev["frames"]
        from .xfer import fetch_levels
        # adaptive fetch: tiny eob read sizes an int8+sparse-high prefix
        # (xfer.py wire format v2)
        y_lev = fetch_levels(dev["y_lev"], TX_32X32, DCT_DCT, (BLK, BLK))
        uv_lev = fetch_levels(dev["uv_lev"], TX_16X16, DCT_DCT,
                              (CBLK, CBLK))
        u_lev, v_lev = uv_lev[:n], uv_lev[n:]
        # recon stays on device (narrow dtype); callers that need host
        # pixels (e.g. --stat-report PSNR) convert on demand
        y_rec = dev["y_rec"]
        u_rec, v_rec = dev["uv_rec"][:n], dev["uv_rec"][n:]
        cands = expand_candidates(CAND_MODES, tuple(cfg.angle_deltas))
        cand_mode = np.array([c[0] for c in cands], np.int32)
        cand_delta = np.array([c[1] for c in cands], np.int32)
        cands_uv = expand_candidates(CAND_MODES, (0,))
        cand_mode_uv = np.array([c[0] for c in cands_uv], np.int32)
        uv_mi = np.asarray(dev["uv_mi"])[:n]     # halves agree (paired)

        def code_one(b):
            y_modes = cand_mode[y_mi[b]]
            y_deltas = cand_delta[y_mi[b]]
            return self._encode_tile(y_modes, y_lev[b], u_lev[b], v_lev[b],
                                     cand_mode_uv[uv_mi[b]], y_deltas)

        # frames have independent CDF contexts → per-frame tile coding runs
        # in parallel host threads (the native coder releases the GIL; the
        # reference's picture-parallel entropy coding, EbEncHandle.c:763)
        if n > 1 and getattr(self, "use_native", True):
            from concurrent.futures import ThreadPoolExecutor
            if not hasattr(self, "_ec_pool"):
                self._ec_pool = ThreadPoolExecutor(max_workers=4)
            tiles = list(self._ec_pool.map(code_one, range(n)))
        else:
            tiles = [code_one(b) for b in range(n)]

        payloads, recons = [], []
        for b in range(n):
            lfv = self.lf_levels()
            fr = FrameConfig(base_q_idx=cfg.qindex,
                             disable_cdf_update=not cfg.cdf_update,
                             filter_level=(lfv[0], lfv[1]),
                             filter_level_u=lfv[2], filter_level_v=lfv[3],
                             film_grain=self.film_grain_for(frames[b]))
            payloads.append(assemble_key_frame(
                self.seq, fr, tiles[b], first=self._first,
                metadata=cfg.metadata if self._first else b""))
            self._first = False
            ch, cch = cfg.height, cfg.height // 2
            recons.append((y_rec[b][:ch], u_rec[b][:cch], v_rec[b][:cch]))
        return self._capped_recode(frames, payloads, recons, first0)

    def lf_levels(self):
        """(y_vert, y_horz, u, v) filter levels (heuristic from qindex,
        similar in spirit to the reference's RDO'd pick)."""
        if self.cfg.lf_level == 0:
            return (0, 0, 0, 0)
        if self.cfg.lf_level > 0:
            l = min(self.cfg.lf_level, 63)
        else:
            q = self.cfg.qindex
            l = max(0, min(63, (q * q // 1100) + q // 12 - 2))
        lc = max(0, l * 3 // 4)
        return (l, l, lc, lc)

    # ------------------------------------------------------------------ #

    def _encode_tile(self, y_modes, y_levels, u_levels, v_levels, uv_modes,
                     y_deltas=None):
        cfg = self.cfg
        if y_deltas is None:
            y_deltas = np.zeros_like(y_modes)
        if uv_modes is None:
            uv_modes = np.zeros_like(y_modes)
        if getattr(self, "use_native", True) and not y_deltas.any():
            try:
                from ..ec import native
                return native.encode_tile_intra(
                    cfg.width, self.ph, cfg.cdf_update, y_modes, y_levels,
                    u_levels, v_levels, CdfContext(cfg.qindex),
                    true_h=cfg.height, uv_modes=uv_modes)
            except Exception:
                self.use_native = False
        mi_cols = cfg.width // 4
        mi_rows = cfg.height // 4          # true-height mi grid
        sb_cols = cfg.width // SB
        sb_rows = self.ph // SB

        enc = RangeEncoder()
        cdf = CdfContext(cfg.qindex, update=cfg.cdf_update)

        # neighbor state
        above_part = np.zeros(mi_cols, np.uint8)
        skip_grid = np.zeros((mi_rows, mi_cols), np.uint8)
        mode_grid = np.zeros((mi_rows, mi_cols), np.uint8)
        above_cul = {0: np.zeros(cfg.width // 4, np.uint8),
                     1: np.zeros(cfg.width // 8, np.uint8),
                     2: np.zeros(cfg.width // 8, np.uint8)}
        above_avail = {p: np.zeros_like(above_cul[p], bool) for p in range(3)}

        part_above_v, part_left_v = M.partition_ctx_value(BLK, BLK)

        for sb_r in range(sb_rows):
            left_part = np.zeros(SB // 4, np.uint8)
            left_cul = {0: np.zeros(SB // 4, np.uint8),
                        1: np.zeros(SB // 8, np.uint8),
                        2: np.zeros(SB // 8, np.uint8)}
            left_avail = {p: np.zeros_like(left_cul[p], bool)
                          for p in range(3)}
            for sb_c in range(sb_cols):
                # 64x64: forced PARTITION_SPLIT (split_or_horz bool when
                # the SB crosses the true frame bottom, spec §5.11.4)
                mi_r, mi_c = sb_r * 16, sb_c * 16
                ctx = M.partition_plane_ctx(int(above_part[mi_c]),
                                            int(left_part[0]), SB)
                if mi_r + 8 < mi_rows:
                    M.write_partition(enc, cdf, ctx, M.PARTITION_SPLIT, SB)
                else:
                    M.write_partition_edge(enc, cdf, ctx, True, SB,
                                           False, True)
                for qr, qc in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    br = sb_r * 2 + qr       # 32x32 block coords
                    bc = sb_c * 2 + qc
                    bmi_r = br * 8
                    bmi_c = bc * 8
                    if bmi_r >= mi_rows:
                        continue             # quad below the frame bottom
                    ctx = M.partition_plane_ctx(
                        int(above_part[bmi_c]), int(left_part[qr * 8]), BLK)
                    M.write_partition(enc, cdf, ctx, M.PARTITION_NONE, BLK)

                    self._encode_block(
                        enc, cdf, br, bc, y_modes, y_levels, u_levels,
                        v_levels, uv_modes, skip_grid, mode_grid, above_cul,
                        left_cul, above_avail, left_avail, sb_r, y_deltas)

                    # partition ctx update for the 32x32 leaf
                    above_part[bmi_c:bmi_c + 8] = part_above_v
                    left_part[qr * 8:qr * 8 + 8] = part_left_v
        return enc.done()

    def _encode_block(self, enc, cdf, br, bc, y_modes, y_levels, u_levels,
                      v_levels, uv_modes, skip_grid, mode_grid, above_cul,
                      left_cul, above_avail, left_avail, sb_r, y_deltas):
        mi_r, mi_c = br * 8, bc * 8
        mi_rows, mi_cols = skip_grid.shape
        have_above = mi_r > 0
        have_left = mi_c > 0

        y_mode = int(y_modes[br, bc])
        uv_mode = (int(uv_modes[br, bc]) if uv_modes is not None
                   else intra.DC_PRED)
        y_lev = y_levels[br, bc]
        u_lev = u_levels[br, bc]
        v_lev = v_levels[br, bc]
        skip = int(not (y_lev.any() or u_lev.any() or v_lev.any()))

        # skip flag
        a_skip = int(skip_grid[mi_r - 1, mi_c]) if have_above else 0
        l_skip = int(skip_grid[mi_r, mi_c - 1]) if have_left else 0
        M.write_skip(enc, cdf, a_skip + l_skip, skip)

        # kf y mode
        a_mode = int(mode_grid[mi_r - 1, mi_c]) if have_above else 0
        l_mode = int(mode_grid[mi_r, mi_c - 1]) if have_left else 0
        M.write_kf_y_mode(enc, cdf, a_mode, l_mode, y_mode)
        if M.is_directional(y_mode):
            M.write_angle_delta(enc, cdf, y_mode, int(y_deltas[br, bc]))

        # uv mode (cfl allowed at 32x32)
        M.write_uv_mode(enc, cdf, True, y_mode, uv_mode)
        if M.is_directional(uv_mode):
            M.write_angle_delta(enc, cdf, uv_mode, 0)

        # residual: y, u, v txbs
        if not skip:
            for plane, lev, txs in ((0, y_lev, TX_32X32), (1, u_lev, TX_16X16),
                                    (2, v_lev, TX_16X16)):
                shift = 0 if plane == 0 else 1
                units = (BLK >> shift) // 4
                # frame-bottom overhang: contexts read over in-frame
                # units only; beyond-edge left entries reset to 0 after
                # coding (EbDecParseBlock.c:2117-2133, :1644-1654)
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
                dc_sign_ctx = self._dc_sign_ctx(
                    above_cul[plane][au0:au0 + units],
                    above_avail[plane][au0:au0 + units],
                    left_cul[plane][lu0:lu0 + units_v],
                    left_avail[plane][lu0:lu0 + units_v])
                cul = write_coeffs_txb(
                    enc, cdf, lev, txs, DCT_DCT, min(plane, 1),
                    txb_skip_ctx, dc_sign_ctx)
                above_cul[plane][au0:au0 + units] = cul
                above_avail[plane][au0:au0 + units] = True
                left_cul[plane][lu0:lu0 + units_v] = cul
                left_cul[plane][lu0 + units_v:lu0 + units] = 0
                left_avail[plane][lu0:lu0 + units] = True
        else:
            # skip resets entropy contexts to 0
            for plane in range(3):
                shift = 0 if plane == 0 else 1
                units = (BLK >> shift) // 4
                au0 = (bc * BLK >> shift) // 4
                lu0 = ((br * BLK >> shift) // 4) % (16 >> shift)
                above_cul[plane][au0:au0 + units] = 0
                above_avail[plane][au0:au0 + units] = True
                left_cul[plane][lu0:lu0 + units] = 0
                left_avail[plane][lu0:lu0 + units] = True

        # mi-grid updates
        skip_grid[mi_r:mi_r + 8, mi_c:mi_c + 8] = skip
        mode_grid[mi_r:mi_r + 8, mi_c:mi_c + 8] = y_mode

    @staticmethod
    def _dc_sign_ctx(a_cul, a_avail, l_cul, l_avail) -> int:
        signs = 0
        for culs, avail in ((a_cul, a_avail), (l_cul, l_avail)):
            for c, av in zip(culs, avail):
                if av:
                    s = int(c) >> 6
                    signs += (1 if s == 2 else (-1 if s == 1 else 0))
        if signs > 0:
            return 2
        if signs < 0:
            return 1
        return 0

"""Video encoder: IPP low-delay GOP (I + P frames) with a 1-reference DPB.

Maps the reference's picture-decision → ME → EncDec → EC chain
(EbPictureDecisionProcess.c flat prediction structure,
EbPredictionStructure.c:77 low-delay P) onto the TPU shape: per frame, one
jitted ME pass + one jitted mixed intra/inter wavefront produce bit-final
modes/levels/recon; the host entropy-codes the tile and maintains the DPB
(slot 0 = previous reconstructed frame = LAST for every ref index).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax.numpy as jnp
import numpy as np

from ..ops.deblock import deblock_plane_uniform
from ..ops.mc import MV_PRED_PAD, pad_plane, predict_inter_blocks
from .headers import (FrameConfig, SequenceConfig, assemble_frame,
                      assemble_show_existing)
from .intra_encoder import CAND_MODES, EncoderConfig, IntraEncoder
from .me import motion_estimate
from .tile_inter import encode_inter_tile
from .wavefront import (encode_plane_wavefront_mixed, expand_candidates)
from ..spec.txfm import TX_16X16, TX_32X32

BLK = 32
CBLK = 16

# intra candidates evaluated inside P frames (full set: the wavefront is
# already paying for the scan; extra candidates are cheap lanes)
P_INTRA_MODES = CAND_MODES


def _pick_interp_filt(src, refp, y0, x0, mv8f, h, w, bd):
    """Frame-level interpolation-filter decision: SAD of the
    motion-compensated luma prediction at the chosen full-block MVs
    under REGULAR/SMOOTH/SHARP, argmin over subpel blocks only
    (integer-MV blocks are filter-invariant — the phase-0 kernel is the
    identity in every set).  Signaled via the frame header's
    `interpolation_filter`; the reference searches per block inside MD
    (EbEncInterPrediction.c:2413 interpolation filter search) — this
    captures the frame-dominant choice with three extra MC dispatches."""
    bh, bw = src.shape[-2] // BLK, src.shape[-1] // BLK
    src_b = src.reshape(1, bh, BLK, bw, BLK).transpose(
        0, 1, 3, 2, 4).reshape(1, bh * bw, BLK, BLK).astype(jnp.int32)
    subpel = jnp.any((mv8f & 7) != 0, axis=-1)
    if not bool(np.asarray(jnp.any(subpel))):
        return 0
    costs = [
        jnp.sum(jnp.abs(predict_inter_blocks(refp, y0, x0, mv8f, h, w,
                                             BLK, 0, bd, f) - src_b)
                .sum((-1, -2)) * subpel)
        for f in range(3)]
    return int(np.argmin(np.asarray(jnp.stack(costs))))


class VideoEncoder:
    """Low-delay I/P encoder.  keyint=1 degenerates to all-intra."""

    def __init__(self, cfg: EncoderConfig, keyint: int = 64,
                 pyramid: bool = False, gop: int = 16, tf: bool = False,
                 rc=None):
        self.cfg = cfg
        self.keyint = max(1, keyint)
        # key frames get a quality boost (the reference's CRF kf_qindex
        # scaling, EbRateControlProcess.c:782) — the KF propagates through
        # the whole GOP via the reference chain
        kf_q = max(2, int(round(cfg.qindex * 0.7))) if keyint > 1 \
            else cfg.qindex
        self.kf_cfg = replace(cfg, qindex=kf_q)
        self.intra = IntraEncoder(self.kf_cfg)
        self.seq = self.intra.seq
        self._idx = 0
        self._first = True
        self._dpb = None              # (y, u, v) post-filter recon
        self._cdf_state = None        # frame-end CDFs (primary-ref chain)
        # hierarchical mini-GoP state (reference prediction structures,
        # EbPredictionStructure.c:77-161 / EbPictureDecisionProcess.c
        # mini-GoP construction, mapped to single-ref P pyramid frames
        # displayed via show_existing overlays)
        self.pyramid = pyramid and self.keyint > 1
        self.gop = min(16, max(1, gop))
        self._buf = []                # pending source frames (lookahead)
        self._slots = {}              # DPB slot -> (y, u, v) recon
        self._slot_cdf = {}           # DPB slot -> frame-end CDF snapshot
        self._slot_t = {}             # DPB slot -> display index
        self._slot_gm = {}            # DPB slot -> saved gm_mv dict
                                      # (PrevGmParams chain, spec 5.9.25)
        self._anchor_slot = 0
        # MCTF on anchor pictures (reference: EbTemporalFiltering.c
        # alt-ref/key-frame filtering) — needs the pyramid lookahead
        self.tf = tf and self.pyramid
        self._fg_n = 0                # inter-frame grain_seed counter
        self.rc = rc                  # RateControl (None → fixed qindex)
        # scene-change detection state (picture decision analogue,
        # EbPictureDecisionProcess.c scene_transition_detector): keyint
        # becomes the MAX interval; cuts insert key frames
        self._kf_at = 0               # next forced-KF display index
        self._tail_src = None         # last buffered source luma
        self._buf_sad = []            # decimated SAD vs previous source
        self._sad_hist = []           # recent non-cut SADs (adaptation)

    # -------------------------------------------------------------- #

    def mark_continuation(self):
        """GOP-parallel chunk encoders after the first must not repeat
        the sequence-header OBU: the orchestrator emits it once (the
        reference writes the SPS once from resource coordination)."""
        self.intra._first = False
        self._first = False

    def encode_frames(self, frames):
        """Sequential low-delay encode (each P frame references the
        previous recon, so the chain is serial — the batch API exists for
        CLI symmetry with the all-intra encoder).  In pyramid mode frames
        buffer until a mini-GoP is complete; call flush() at EOS.
        Returns (payloads in decode order, recons in display order) —
        in pyramid mode payloads include show_existing overlay TUs, so
        len(payloads) > len(recons)."""
        if self.pyramid:
            for f in frames:
                y = np.asarray(f[0], np.int32)[::4, ::4]
                if self._tail_src is None:
                    self._buf_sad.append(0.0)
                else:
                    self._buf_sad.append(
                        float(np.abs(y - self._tail_src).mean()))
                self._tail_src = y
                self._buf.append(f)
            return self._drain(final=False)
        payloads, recons = [], []
        for f in frames:
            p, r = self.encode_frame(*f)
            payloads.append(p)
            recons.append(r)
        return payloads, recons

    def flush(self):
        """Encode whatever is still buffered (pyramid tail)."""
        if not self.pyramid:
            return [], []
        return self._drain(final=True)

    # ---------------- hierarchical mini-GoP scheduler ---------------- #

    def _is_cut(self, sad_pp: float) -> bool:
        """Scene cut: large absolute per-pixel SAD AND an outlier vs
        the recent motion level (scene_transition_detector rule)."""
        if sad_pp < 26.0:
            return False
        base = np.median(self._sad_hist) if self._sad_hist else 0.0
        return sad_pp > 3.5 * max(base, 2.0)

    def _consume_sad(self, k: int):
        for s in self._buf_sad[:k]:
            if not self._is_cut(s):
                self._sad_hist = (self._sad_hist + [s])[-16:]
        del self._buf_sad[:k]

    def _drain(self, final: bool):
        payloads, recons = [], []
        while self._buf:
            if (self._idx >= self._kf_at or
                    (self._buf_sad and self._is_cut(self._buf_sad[0]))):
                self._consume_sad(1)
                self._kf_at = self._idx + self.keyint
                f = self._buf.pop(0)
                if self.rc is not None:
                    kf_q = max(2, int(round(self._base_q() * 0.7)))
                    if kf_q != self.intra.cfg.qindex:
                        self.intra.cfg = replace(self.intra.cfg,
                                                 qindex=kf_q)
                if self.tf:
                    f = self._tf_filter(f, [], self._buf[:3],
                                        self.intra.cfg.qindex)
                ps, rs = self.intra.encode_frames([f])
                if self.rc is not None:
                    self.rc.update(sum(len(p) for p in ps), 1)
                rec = tuple(np.asarray(p) for p in rs[0])
                self._slots = {0: rec}
                self._slot_cdf = {}
                self._slot_t = {0: self._idx}
                self._slot_gm = {}    # KF refreshes all slots, gm identity
                self._anchor_slot = 0
                self._idx += 1
                payloads += ps
                recons.append(rs[0])
                continue
            till_kf = self._kf_at - self._idx
            target = min(self.gop, till_kf)
            avail = len(self._buf)
            if avail < target and not final:
                break
            n = min(target, avail)
            # never let a mini-GoP cross a scene cut — the cut frame
            # starts the next (key) GoP
            for i in range(1, n):
                if self._is_cut(self._buf_sad[i]):
                    n = i
                    break
            if n <= 0:
                break
            g = 1 << (n.bit_length() - 1)      # largest pow2 <= n
            self._consume_sad(g)
            gf = [self._buf.pop(0) for _ in range(g)]
            ps, rs = self._encode_gop(gf)
            if self.rc is not None:
                self.rc.update(sum(len(p) for p in ps), g)
            payloads += ps
            recons += rs
        return payloads, recons

    # per-layer RD lambda multipliers: interior layers price rate harder
    # (pushes top-layer frames toward skip/cheap modes without raising
    # their quantizer — the reference's layer lambda weighting)
    LAYER_LAM = (1.0, 1.0, 1.15, 1.3, 1.45)

    def _layer_lam(self, layer: int) -> float:
        return self.LAYER_LAM[min(layer, len(self.LAYER_LAM) - 1)]

    def _base_q(self) -> int:
        """Current base qindex: rate-control supplied or the config's."""
        return self.rc.base_q if self.rc is not None else self.cfg.qindex

    def _layer_q(self, layer: int) -> int:
        """Per-layer qindex scaling (the reference's hierarchical-layer
        q offsets, EbRateControlProcess.c CRF qindex per temporal
        layer): anchors below base q, top layers above.  The layer-0
        multiplier is modulated per GoP by the TPL-lite propagation
        measure (_tpl_boost): anchors in well-predicted content get a
        deeper quality boost because their bits propagate
        (EbSourceBasedOperationsProcess.c tpl_mc_flow r0 boost)."""
        if layer == 0:
            mult = self._anchor_mult
        else:
            mult = (0.85, 0.96, 1.04, 1.10, 1.16)[min(layer, 4)]
        return max(1, min(255, int(round(self._base_q() * mult))))

    _anchor_mult = 0.85                # updated per GoP by _tpl_boost

    def _tpl_boost(self, gframes):
        """TPL-lite: measure how well the GoP's interior frames are
        predicted from its anchor (decimated SAD vs a local activity
        proxy) and (a) deepen the anchor q boost globally, (b) build a
        PER-32x32-BLOCK lambda map for the anchor — blocks whose pixels
        propagate (low future residual) price rate cheaper and soak up
        bits, chaotic blocks the opposite.  The per-SB analogue of the
        reference's TPL backprop (EbSourceBasedOperationsProcess.c
        :1347-1882, Docs/Appendix-TPL.md) without the recon dispenser."""
        self._lam_map_np = None
        if len(gframes) < 2:
            self._anchor_mult = 0.85
            return
        anchor = np.asarray(gframes[-1][0], np.int32)[::4, ::4]
        # spatial activity: mean abs horizontal+vertical gradient
        act = (np.abs(np.diff(anchor, axis=0)).mean() +
               np.abs(np.diff(anchor, axis=1)).mean()) + 1e-3
        pq = 0.0
        for f in gframes[:-1]:
            d = np.abs(np.asarray(f[0], np.int32)[::4, ::4] -
                       anchor).mean()
            pq += max(0.0, 1.0 - d / (4.0 * act))
        pq /= (len(gframes) - 1)
        # pq ~1: static/well-predicted → anchor bits propagate far;
        # pq ~0: chaotic → no propagation, keep anchors near base q
        self._anchor_mult = float(np.clip(0.92 - 0.18 * pq, 0.72, 0.92))
        import os
        if os.environ.get("SVT_TPU_NO_TPL"):
            return
        # per-block map (8x8 decimated pixels per 32x32 block, padded to
        # the SB-aligned grid the wavefront sees)
        bh, bw = self.intra.ph // BLK, anchor.shape[1] * 4 // BLK
        H8, W8 = bh * 8, bw * 8
        apad = np.pad(anchor, ((0, max(0, H8 - anchor.shape[0])),
                               (0, max(0, W8 - anchor.shape[1]))),
                      mode="edge")[:H8, :W8]
        blk = lambda a: a.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        ab = blk(apad).astype(np.float32)
        act_b = (np.abs(np.diff(ab, axis=2)).mean((2, 3)) +
                 np.abs(np.diff(ab, axis=3)).mean((2, 3)) + 1e-3)
        p_b = np.zeros((bh, bw), np.float32)
        for f in gframes[:-1]:
            fd = np.asarray(f[0], np.int32)[::4, ::4]
            fpad = np.pad(fd, ((0, max(0, H8 - fd.shape[0])),
                               (0, max(0, W8 - fd.shape[1]))),
                          mode="edge")[:H8, :W8]
            d_b = np.abs(blk(fpad).astype(np.float32) - ab).mean((2, 3))
            p_b += np.clip(1.0 - d_b / (4.0 * act_b), 0.0, 1.0)
        p_b /= (len(gframes) - 1)
        self._lam_map_np = np.clip(1.18 - 0.55 * p_b, 0.68,
                                   1.18).astype(np.float32)

    def _fit_gm(self, mv_field):
        """Translation-only global-motion fit from the block ME field
        (EbGlobalMotionEstimation.c:126 analogue — on TPU the dense ME
        field replaces FAST corners + RANSAC; a coordinate-wise median
        is the L1-robust estimator for a pure translation).  Returns
        (row, col) in even 1/8-pel or None (identity)."""
        f = np.asarray(mv_field).reshape(-1, 2).astype(np.int64)
        if f.shape[0] < 4:
            return None
        med = np.median(f, axis=0)
        gm = (int(np.round(med[0] / 2.0)) * 2,
              int(np.round(med[1] / 2.0)) * 2)
        if gm == (0, 0) or max(abs(gm[0]), abs(gm[1])) > 510:
            return None
        # gate: a real pan has most blocks moving with the fit
        inl = (np.abs(f - np.array(gm)).max(axis=1) <= 16).mean()
        if inl < 0.5:
            return None
        return gm

    def _gm_prev_for(self, primary_ref, ref_idx):
        """PrevGmParams source: the primary-ref frame's saved gm dict."""
        if primary_ref == 7:
            return {}
        return self._slot_gm.get(ref_idx[primary_ref]) or {}

    def _gm_save(self, refresh_flags, gm_dict):
        for slot in range(8):
            if (refresh_flags >> slot) & 1:
                self._slot_gm[slot] = dict(gm_dict)

    def _pick_ref(self, y, cand_slots):
        """Choose the reference slot with the lowest decimated-luma SAD
        against the source (frame-level single-ref selection; the
        reference picks per-block among LAST/ALT via MD)."""
        if len(cand_slots) == 1:
            return cand_slots[0]
        src = np.asarray(y, np.int32)[::4, ::4]
        best, best_s = None, None
        for s in cand_slots:
            ref = np.asarray(self._slots[s][0], np.int32)[::4, ::4]
            sad = int(np.abs(src - ref).sum())
            if best_s is None or sad < best_s:
                best, best_s = s, sad
        return best

    def _fg_inter(self, hdr_extra):
        """Inter-frame film grain: update_grain=0, parameters loaded
        from the primary reference slot (write_film_grain_params
        params-equal path) — each frame keeps its own grain_seed."""
        if not self.cfg.film_grain or not self.intra._fg_params:
            return None
        self._fg_n += 1
        seed = (17027 + 2897 * self._fg_n) & 0xFFFF
        slot = (hdr_extra or {}).get("ref_frame_idx", (0,) * 7)[0]
        return {"grain_seed": seed, "load_ref_idx": slot}

    def _tf_filter(self, frame, past, future, q):
        """MCTF the anchor source (EbTemporalFiltering.c analogue)."""
        from ..ops.tf import temporal_filter_frame
        neighbors = list(past) + list(future)
        return temporal_filter_frame(frame, neighbors, q,
                                     bd=self.cfg.bit_depth)

    def _encode_ref_frame(self, frame, cand_slots, q, refresh_slot,
                          show, t=0, refresh_t=0, layer=0):
        y, u, v = frame
        use_comp = (len(cand_slots) == 2 and self.cfg.part_search and
                    cand_slots[0] != cand_slots[1])
        if use_comp:
            # compound B frame: LAST = interval-low anchor, ALTREF =
            # interval-high anchor; CDF chain from the SAD-closer one
            lo, hi = cand_slots
            chain = self._pick_ref(y, cand_slots)
            rfi = [lo] * 7
            rfi[6] = hi
            has_cdf = self._slot_cdf.get(chain) is not None
            hdr = dict(show_frame=show,
                       refresh_frame_flags=1 << refresh_slot,
                       ref_frame_idx=tuple(rfi), reference_select=True,
                       primary_ref_frame=((0 if chain == lo else 6)
                                          if has_cdf else 7))
            d0 = max(1, abs(refresh_t - self._slot_t.get(lo, refresh_t)))
            d1 = max(1, abs(refresh_t - self._slot_t.get(hi, refresh_t)))
            payload, rec, snap = self._encode_p(
                y, u, v, ref=self._slots[lo], qindex=q,
                cdf_init=self._slot_cdf.get(chain), hdr_extra=hdr,
                ref_dist=d0, ref2=self._slots[hi], ref2_dist=d1,
                lam_scale=self._layer_lam(layer))
        else:
            slot = self._pick_ref(y, cand_slots)
            hdr = dict(show_frame=show,
                       refresh_frame_flags=1 << refresh_slot,
                       ref_frame_idx=(slot,) * 7)
            dist = max(1, abs(refresh_t -
                              self._slot_t.get(slot, refresh_t)))
            payload, rec, snap = self._encode_p(
                y, u, v, ref=self._slots[slot], qindex=q,
                cdf_init=self._slot_cdf.get(slot), hdr_extra=hdr,
                ref_dist=dist, lam_scale=self._layer_lam(layer),
                lam_map=(getattr(self, "_lam_map_np", None)
                         if layer == 0 else None))
        rec = tuple(np.asarray(p) for p in rec)
        self._slots[refresh_slot] = rec
        self._slot_cdf[refresh_slot] = snap
        self._slot_t[refresh_slot] = refresh_t
        return payload, rec

    def _encode_gop(self, gframes):
        """One mini-GoP: anchor at the far end references the previous
        anchor; interior frames bisect recursively, each referencing
        its interval's two anchors (nearest by SAD).  Interior frames
        are coded no-show and displayed via show_existing overlays in
        display order (reference: overlay pictures + prediction
        structure, EbPictureDecisionProcess.c)."""
        G = len(gframes)
        self._tpl_boost(gframes)
        t0 = self._idx - 1            # display time of the lo anchor
        lo = self._anchor_slot
        hi = 1 - lo if lo in (0, 1) else 0
        out_p, out_r = [], [None] * G
        if G == 1:
            p, rec = self._encode_ref_frame(gframes[0], [lo],
                                            self._layer_q(0), hi, True,
                                            refresh_t=t0 + 1)
            self._anchor_slot = hi
            self._idx += 1
            return [p], [rec]
        anchor = gframes[-1]
        if self.tf:
            anchor = self._tf_filter(anchor, gframes[-3:-1],
                                     self._buf[:2], self._layer_q(0))
        p, rec = self._encode_ref_frame(anchor, [lo],
                                        self._layer_q(0), hi, False,
                                        refresh_t=t0 + G)
        out_p.append(p)
        out_r[G - 1] = rec
        self._bisect(gframes, 0, lo, G, hi, 0, out_p, out_r, t0)
        out_p.append(assemble_show_existing(hi))
        self._anchor_slot = hi
        self._idx += G
        return out_p, out_r

    def _bisect(self, gframes, lo_i, lo_slot, hi_i, hi_slot, depth,
                out_p, out_r, t0):
        if hi_i - lo_i <= 1:
            return
        mid = (lo_i + hi_i) // 2
        slot = 2 + depth
        p, rec = self._encode_ref_frame(gframes[mid - 1],
                                        [lo_slot, hi_slot],
                                        self._layer_q(depth + 1), slot,
                                        False, refresh_t=t0 + mid,
                                        layer=depth + 1)
        out_p.append(p)
        out_r[mid - 1] = rec
        self._bisect(gframes, lo_i, lo_slot, mid, slot, depth + 1,
                     out_p, out_r, t0)
        out_p.append(assemble_show_existing(slot))
        self._bisect(gframes, mid, slot, hi_i, hi_slot, depth + 1,
                     out_p, out_r, t0)

    def encode_frame(self, y, u, v):
        yd = np.asarray(y, np.int32)[::4, ::4]
        cut = False
        if self._tail_src is not None:
            s = float(np.abs(yd - self._tail_src).mean())
            cut = self._is_cut(s)
            if not cut:
                self._sad_hist = (self._sad_hist + [s])[-16:]
        self._tail_src = yd
        if self._idx >= self._kf_at or cut or self._dpb is None:
            self._kf_at = self._idx + self.keyint
            if self.rc is not None:
                kf_q = max(2, int(round(self._base_q() * 0.7))) \
                    if self.keyint > 1 else self._base_q()
                if kf_q != self.intra.cfg.qindex:
                    self.intra.cfg = replace(self.intra.cfg, qindex=kf_q)
            payloads, recons = self.intra.encode_frames([(y, u, v)])
            payload, rec = payloads[0], recons[0]
            self._cdf_state = None    # key frames reset the CDF chain
        else:
            q = self._base_q() if self.rc is not None else None
            payload, rec, _ = self._encode_p(y, u, v, qindex=q)
        if self.rc is not None:
            self.rc.update(len(payload), 1)
        self._dpb = tuple(np.asarray(p) for p in rec)
        self._idx += 1
        return payload, rec

    def _dlf_levels(self, q, y_rec, part_f, part_sb_f, src_y, bd,
                    valid_h=None):
        """Frame-level DLF level RDO (EbDeblockingFilter.c search): pick
        the luma level by SSE-vs-source sweep around the qindex
        heuristic; chroma follows at 3/4 (explicit cfg.lf_level still
        overrides)."""
        if self.cfg.lf_level >= 0:
            return self._p_lf_levels(q)
        from ..ops.deblock import dlf_sse_part
        base = self._p_lf_levels(q)[0]
        cand = [0, max(1, base // 2), max(1, base * 3 // 4),
                max(1, base), base * 5 // 4 + 1, base * 3 // 2 + 1]
        cand = [min(63, c) for c in cand]
        sse = np.asarray(dlf_sse_part(
            y_rec, jnp.asarray(src_y)[None].astype(jnp.int32), part_f,
            jnp.asarray(cand, jnp.int32), BLK, 14, bd=bd,
            part_sb=part_sb_f, valid_h=valid_h))
        l = int(cand[int(np.argmin(sse))])
        lc = max(0, l * 3 // 4)
        return (l, l, lc, lc)

    def _p_lf_levels(self, q=None):
        """Deblock levels from the P-frame qindex (the intra encoder's
        heuristic but at the inter quantizer)."""
        cfg = self.cfg
        if q is None:
            q = cfg.qindex
        if cfg.lf_level == 0:
            return (0, 0, 0, 0)
        if cfg.lf_level > 0:
            l = min(cfg.lf_level, 63)
        else:
            l = max(0, min(63, (q * q // 1100) + q // 12 - 2))
        lc = max(0, l * 3 // 4)
        return (l, l, lc, lc)

    # -------------------------------------------------------------- #

    def _encode_p(self, y, u, v, ref=None, qindex=None,
                  cdf_init="chain", hdr_extra=None, ref_dist=1,
                  ref2=None, ref2_dist=1, lam_scale=1.0, lam_map=None):
        if self.cfg.part_search:
            return self._encode_p_part(y, u, v, ref, qindex, cdf_init,
                                       hdr_extra, ref_dist, ref2,
                                       ref2_dist, lam_scale, lam_map)
        if ref2 is not None:
            raise NotImplementedError("compound needs part_search")
        cfg = self.cfg
        q = cfg.qindex if qindex is None else qindex
        chain = cdf_init == "chain"
        cdf0 = self._cdf_state if chain else cdf_init
        bd = cfg.bit_depth
        # h = TRUE height (MC clamp / DPB); hp = SB-padded grid height
        h, w = y.shape
        hp = self.intra.ph
        vh = None if hp == h else h
        vhc = None if vh is None else vh // 2
        ry, ru, rv = self._dpb if ref is None else ref
        ry_me = ry
        if hp != h:
            from .geometry import pad_plane_bottom
            y = pad_plane_bottom(np.asarray(y), hp)
            u = pad_plane_bottom(np.asarray(u), hp // 2)
            v = pad_plane_bottom(np.asarray(v), hp // 2)
            ry_me = pad_plane_bottom(np.asarray(ry), hp)
        bh, bw = hp // BLK, w // BLK
        N = bh * bw

        yb = jnp.asarray(y)[None].astype(jnp.int32)
        ryp = pad_plane(jnp.asarray(ry)[None].astype(jnp.int32))
        rup = pad_plane(jnp.asarray(ru)[None].astype(jnp.int32))
        rvp = pad_plane(jnp.asarray(rv)[None].astype(jnp.int32))

        mv8, _sad = motion_estimate(jnp.asarray(y)[None],
                                    jnp.asarray(ry_me)[None], BLK,
                                    long_range=ref_dist > 4)
        mv8f = mv8.reshape(1, N, 2)
        gm = self._fit_gm(mv8) if cfg.gm_search else None
        gmv = gm or (0, 0)
        gm_b = jnp.broadcast_to(jnp.asarray(gmv, mv8f.dtype), mv8f.shape)
        y0 = (jnp.arange(N) // bw * BLK)[None]
        x0 = (jnp.arange(N) % bw * BLK)[None]
        filt = _pick_interp_filt(yb, ryp, y0, x0, mv8f, h, w, bd) \
            if cfg.filter_search else 0

        pred_new = predict_inter_blocks(ryp, y0, x0, mv8f, h, w, BLK,
                                        0, bd, filt)
        pred_zero = predict_inter_blocks(ryp, y0, x0, gm_b, h, w, BLK,
                                         0, bd, filt)
        extra = jnp.stack([pred_new, pred_zero],
                          1).reshape(1, 2, bh, bw, BLK, BLK)
        # rate estimates (bits): NEWMV ≈ mode + mv magnitude; GLOBAL ≈ mode
        amv = jnp.abs(mv8.astype(jnp.float32))
        r_new = 14.0 + 2.5 * (jnp.log2(1.0 + amv[..., 0]) +
                              jnp.log2(1.0 + amv[..., 1]))
        r_zero = jnp.full((1, bh, bw), 6.0, jnp.float32)
        extra_rate = jnp.stack([r_new, r_zero], 1)
        ok = jnp.ones((1, 2, bh, bw), bool)
        intra_ok = jnp.ones((1, bh, bw), bool)

        y_mi, y_lev, y_rec = encode_plane_wavefront_mixed(
            yb, BLK, TX_32X32, q, extra, extra_rate, ok, intra_ok,
            2, P_INTRA_MODES, bd, tuple(cfg.angle_deltas), valid_h=vh)

        cands = expand_candidates(P_INTRA_MODES, tuple(cfg.angle_deltas))
        n_intra = len(cands)
        is_inter = y_mi >= n_intra                       # [1, bh, bw]
        mv_final = jnp.where((y_mi == n_intra)[..., None], mv8,
                             jnp.asarray(gmv, mv8.dtype))

        # chroma: inter blocks reuse the luma mv; intra blocks use DC
        mv_cf = mv_final.reshape(1, N, 2)
        y0c, x0c = y0 // 2, x0 // 2
        pu = predict_inter_blocks(rup, y0c, x0c, mv_cf, h, w, CBLK, 1, bd, filt)
        pv = predict_inter_blocks(rvp, y0c, x0c, mv_cf, h, w, CBLK, 1, bd, filt)
        c_ok = is_inter[:, None]
        c_rate = jnp.zeros((1, 1, bh, bw), jnp.float32)
        u_mi, u_lev, u_rec = encode_plane_wavefront_mixed(
            jnp.asarray(u)[None].astype(jnp.int32), CBLK, TX_16X16,
            q, pu.reshape(1, 1, bh, bw, CBLK, CBLK), c_rate, c_ok,
            ~is_inter, 1, (0,), bd,
            valid_h=vhc)                # intra candidate list: DC only
        v_mi, v_lev, v_rec = encode_plane_wavefront_mixed(
            jnp.asarray(v)[None].astype(jnp.int32), CBLK, TX_16X16,
            q, pv.reshape(1, 1, bh, bw, CBLK, CBLK), c_rate, c_ok,
            ~is_inter, 1, (0,), bd, valid_h=vhc)

        lf = self._p_lf_levels(q)
        if lf[0] or lf[1]:
            y_rec = deblock_plane_uniform(y_rec, BLK, 14, lf[0], lf[1],
                                          bd=bd, valid_h=vh)
            u_rec = deblock_plane_uniform(u_rec, CBLK, 6, lf[2], lf[2],
                                          bd=bd, valid_h=vhc)
            v_rec = deblock_plane_uniform(v_rec, CBLK, 6, lf[3], lf[3],
                                          bd=bd, valid_h=vhc)

        y_mi = np.asarray(y_mi)[0]
        y_lev = np.asarray(y_lev)[0]
        u_lev = np.asarray(u_lev)[0]
        v_lev = np.asarray(v_lev)[0]
        mv_np = np.asarray(mv_final)[0]

        tile, end_cdf = encode_inter_tile(
            w, hp, q, cfg.cdf_update, y_mi, y_lev, u_lev, v_lev,
            mv_np, cands, n_intra, cdf_init=cdf0, true_h=h, gm_mv=gmv)
        hdr_extra = dict(hdr_extra or {})
        hdr_extra.setdefault("film_grain", self._fg_inter(hdr_extra))
        primary_ref = hdr_extra.pop("primary_ref_frame",
                                    0 if cdf0 is not None else 7)
        ref_idx = hdr_extra.get("ref_frame_idx", (0,) * 7)
        refresh = hdr_extra.get("refresh_frame_flags", 0x01)
        gm_dict = {1: gmv} if gm else {}
        fr = FrameConfig(frame_type=1, base_q_idx=q,
                         disable_cdf_update=not cfg.cdf_update,
                         disable_frame_end_update_cdf=not cfg.cdf_update,
                         primary_ref_frame=primary_ref,
                         filter_level=(lf[0], lf[1]),
                         filter_level_u=lf[2], filter_level_v=lf[3],
                         interpolation_filter=filt,
                         gm_mv=gm_dict or None,
                         gm_prev=self._gm_prev_for(primary_ref, ref_idx),
                         **(hdr_extra or {}))
        self._gm_save(refresh, gm_dict)
        snap = end_cdf.snapshot() if cfg.cdf_update else None
        if chain and cfg.cdf_update:
            self._cdf_state = snap
        payload = assemble_frame(self.seq, fr, tile, first=False)
        rec = (np.asarray(y_rec)[0][:h], np.asarray(u_rec)[0][:h // 2],
               np.asarray(v_rec)[0][:h // 2])
        return payload, rec, snap


    # -------------------------------------------------------------- #

    def _encode_p_part(self, y, u, v, ref=None, qindex=None,
                       cdf_init="chain", hdr_extra=None, ref_dist=1,
                       ref2=None, ref2_dist=1, lam_scale=1.0,
                       lam_map=None):
        """P frame with the 32-vs-16 partition decision: separate ME at
        both block sizes, inter candidates at both depths of the
        two-depth wavefront, chroma partition forced by luma.

        ref/qindex/cdf_init/hdr_extra parameterize the frame for the
        hierarchical scheduler (reference-slot recon, per-layer q, CDF
        chain source, header overrides); defaults keep low-delay
        semantics (previous frame, cfg.qindex, self-chained CDFs)."""
        from ..spec.txfm import TX_8X8
        from .tile_codec import TileCoder
        from .wavefront2 import SUB_MODES, encode_plane_wavefront_part
        from .wavefront import expand_candidates

        cfg = self.cfg
        q = cfg.qindex if qindex is None else qindex
        chain = cdf_init == "chain"
        cdf0 = self._cdf_state if chain else cdf_init
        bd = cfg.bit_depth
        # h stays the TRUE (signaled) height — MC's UMV clamp and the DPB
        # use it; hp is the SB-padded plane height for the block grids
        # (bottom-row blocks overhang legally, encoder/geometry.py)
        h, w = y.shape
        hp = self.intra.ph
        vh = None if hp == h else h
        vhc = None if vh is None else vh // 2
        if hp != h:
            from .geometry import pad_plane_bottom
            y = pad_plane_bottom(np.asarray(y), hp)
            u = pad_plane_bottom(np.asarray(u), hp // 2)
            v = pad_plane_bottom(np.asarray(v), hp // 2)
        bh, bw = hp // BLK, w // BLK
        N = bh * bw
        ry, ru, rv = self._dpb if ref is None else ref

        ryp = pad_plane(jnp.asarray(ry)[None].astype(jnp.int32))
        rup = pad_plane(jnp.asarray(ru)[None].astype(jnp.int32))
        rvp = pad_plane(jnp.asarray(rv)[None].astype(jnp.int32))

        def _ref_me(r):
            """Reference luma padded to the source grid for ME."""
            if hp == h:
                return jnp.asarray(r)[None]
            from .geometry import pad_plane_bottom as _pb
            return jnp.asarray(_pb(np.asarray(r), hp))[None]

        yj = jnp.asarray(y)[None]
        rj = _ref_me(ry)
        lr_me = ref_dist > 4
        mv32, _ = motion_estimate(yj, rj, BLK, long_range=lr_me)
        mv16, _ = motion_estimate(yj, rj, 16, long_range=lr_me)
        comp = ref2 is not None
        # translation global motion (single-ref frames only; compound
        # GLOBAL_GLOBAL lanes keep identity)
        gm = (None if comp or not cfg.gm_search
              else self._fit_gm(mv32))
        gmv = gm or (0, 0)
        if comp:
            ry2, ru2, rv2 = ref2
            r2yp = pad_plane(jnp.asarray(ry2)[None].astype(jnp.int32))
            r2up = pad_plane(jnp.asarray(ru2)[None].astype(jnp.int32))
            r2vp = pad_plane(jnp.asarray(rv2)[None].astype(jnp.int32))
            rj2 = _ref_me(ry2)
            lr2 = ref2_dist > 4
            mv32b, _ = motion_estimate(yj, rj2, BLK, long_range=lr2)
            mv16b, _ = motion_estimate(yj, rj2, 16, long_range=lr2)

        # 64x64 (SB-depth) inter candidates
        sh, sw = hp // 64, w // 64
        Nsb = sh * sw
        mv64, _ = motion_estimate(yj, rj, 64, long_range=lr_me)
        if comp:
            mv64b, _ = motion_estimate(yj, rj2, 64, long_range=lr2)

        # neighbor-consistent MV predictions (see _mv_pred below): an
        # extra candidate lane at the predicted MV usually entropy-codes
        # as NEARESTMV (stack[0] match) — near-free rate
        def _mv_pred_np(field):
            left = jnp.pad(field, ((0, 0), (0, 0), (1, 0), (0, 0)))[
                :, :, :-1]
            above = jnp.pad(field, ((0, 0), (1, 0), (0, 0), (0, 0)))[
                :, :-1]
            stacked = jnp.stack([left, above, jnp.zeros_like(field)], 0)
            return jnp.median(stacked, axis=0).astype(field.dtype)

        mvp32 = _mv_pred_np(mv32)
        mvp64 = _mv_pred_np(mv64)
        mvp16z = jnp.repeat(mvp32[:, :, :, None], 4, axis=3)

        y0 = (jnp.arange(N) // bw * BLK)[None]
        x0 = (jnp.arange(N) % bw * BLK)[None]
        mv32f = mv32.reshape(1, N, 2)
        mvp32f = mvp32.reshape(1, N, 2)
        filt = _pick_interp_filt(yj.astype(jnp.int32), ryp, y0, x0,
                                 mv32f, h, w, bd) \
            if cfg.filter_search else 0
        pred_new = predict_inter_blocks(ryp, y0, x0, mv32f, h, w, BLK, 0, bd, filt)
        gm_b32 = jnp.broadcast_to(jnp.asarray(gmv, mv32f.dtype),
                                  mv32f.shape)
        pred_zero = predict_inter_blocks(ryp, y0, x0, gm_b32,
                                         h, w, BLK, 0, bd, filt)
        pred_mvp = predict_inter_blocks(ryp, y0, x0, mvp32f, h, w, BLK, 0, bd, filt)
        top_lanes = [pred_new, pred_zero, pred_mvp]
        if comp:
            from ..ops.mc import predict_inter_blocks_compound
            mv32bf = mv32b.reshape(1, N, 2)
            pc_new = predict_inter_blocks_compound(
                ryp, r2yp, y0, x0, mv32f, mv32bf, h, w, BLK, 0, bd, filt)
            pc_zero = predict_inter_blocks_compound(
                ryp, r2yp, y0, x0, jnp.zeros_like(mv32f),
                jnp.zeros_like(mv32bf), h, w, BLK, 0, bd, filt)
            top_lanes += [pc_new, pc_zero]
        n_lanes = len(top_lanes)
        extra_top = jnp.stack(top_lanes, 1).reshape(
            1, n_lanes, bh, bw, BLK, BLK)

        # sub-block (16x16) inter candidates, z-order within each 32 block
        mv16z = mv16.reshape(1, bh, 2, bw, 2, 2).transpose(0, 1, 3, 2, 4, 5)
        mv16z = mv16z.reshape(1, bh, bw, 4, 2)           # [.., z, 2]
        mvsf = mv16z.reshape(1, N * 4, 2)
        zi = jnp.arange(N * 4)
        b_r, rem = zi // (4 * bw), zi % (4 * bw)
        # careful: layout is (bh, bw, 4): index = (r*bw + c)*4 + z
        b_r = zi // (bw * 4)
        b_c = (zi // 4) % bw
        zz = zi % 4
        sy0 = b_r * BLK + (zz >> 1) * 16
        sx0 = b_c * BLK + (zz & 1) * 16
        p16_new = predict_inter_blocks(ryp, sy0[None], sx0[None], mvsf, h,
                                       w, 16, 0, bd, filt)
        p16_zero = predict_inter_blocks(
            ryp, sy0[None], sx0[None],
            jnp.broadcast_to(jnp.asarray(gmv, mvsf.dtype), mvsf.shape),
            h, w, 16, 0, bd, filt)
        mvp16f = mvp16z.reshape(1, N * 4, 2)
        p16_mvp = predict_inter_blocks(ryp, sy0[None], sx0[None], mvp16f,
                                       h, w, 16, 0, bd, filt)
        sub_lanes = [p16_new, p16_zero, p16_mvp]
        if comp:
            mv16zb = mv16b.reshape(1, bh, 2, bw, 2, 2).transpose(
                0, 1, 3, 2, 4, 5).reshape(1, bh, bw, 4, 2)
            mvsfb = mv16zb.reshape(1, N * 4, 2)
            pc16_new = predict_inter_blocks_compound(
                ryp, r2yp, sy0[None], sx0[None], mvsf, mvsfb, h, w, 16,
                0, bd, filt)
            pc16_zero = predict_inter_blocks_compound(
                ryp, r2yp, sy0[None], sx0[None], jnp.zeros_like(mvsf),
                jnp.zeros_like(mvsfb), h, w, 16, 0, bd, filt)
            sub_lanes += [pc16_new, pc16_zero]
        extra_sub = jnp.stack(sub_lanes, 1).reshape(
            1, n_lanes, bh, bw, 4, 16, 16)

        # SB-level (64x64) candidate predictions
        y0s = (jnp.arange(Nsb) // sw * 64)[None]
        x0s = (jnp.arange(Nsb) % sw * 64)[None]
        mv64f = mv64.reshape(1, Nsb, 2)
        p64_new = predict_inter_blocks(ryp, y0s, x0s, mv64f, h, w, 64, 0, bd, filt)
        p64_zero = predict_inter_blocks(
            ryp, y0s, x0s,
            jnp.broadcast_to(jnp.asarray(gmv, mv64f.dtype), mv64f.shape),
            h, w, 64, 0, bd, filt)
        mvp64f = mvp64.reshape(1, Nsb, 2)
        p64_mvp = predict_inter_blocks(ryp, y0s, x0s, mvp64f, h, w, 64, 0, bd, filt)
        sb_lanes = [p64_new, p64_zero, p64_mvp]
        if comp:
            from ..ops.mc import predict_inter_blocks_compound
            mv64bf = mv64b.reshape(1, Nsb, 2)
            pc64_new = predict_inter_blocks_compound(
                ryp, r2yp, y0s, x0s, mv64f, mv64bf, h, w, 64, 0, bd, filt)
            pc64_zero = predict_inter_blocks_compound(
                ryp, r2yp, y0s, x0s, jnp.zeros_like(mv64f),
                jnp.zeros_like(mv64bf), h, w, 64, 0, bd, filt)
            sb_lanes += [pc64_new, pc64_zero]
        extra_sb = jnp.stack(sb_lanes, 1).reshape(
            1, n_lanes, sh, sw, 64, 64)

        def _mv_bits(m, pred):
            """NEWMV residual bits vs the predicted MV: per-component
            sign+class+offset shape of the spec MV coder (ec/inter_modes
            write_mv), ~4 + 1.4*log2|d| bits per nonzero component."""
            d = jnp.abs((m - pred).astype(jnp.float32))
            cb = lambda a: jnp.where(a > 0, 4.0 + 1.4 * jnp.log2(1.0 + a),
                                     0.7)
            return cb(d[..., 0]) + cb(d[..., 1])

        MODE_NEW = 5.0      # NEWMV mode + DRL signaling bits
        MODE_NEAR = 3.0     # NEAREST/GLOBAL-class signaling
        r_new = MODE_NEW + _mv_bits(mv32, mvp32)
        r_zero = jnp.full((1, bh, bw), MODE_NEAR + 1.0, jnp.float32)
        r_mvp = jnp.full((1, bh, bw), MODE_NEAR + 1.4, jnp.float32)
        rates_top = [r_new, r_zero, r_mvp]
        rs_new = MODE_NEW + _mv_bits(mv16z, mvp16z)
        rs_zero = jnp.full((1, bh, bw, 4), MODE_NEAR + 1.0, jnp.float32)
        rs_mvp = jnp.full((1, bh, bw, 4), MODE_NEAR + 1.4, jnp.float32)
        rates_sub = [rs_new, rs_zero, rs_mvp]
        rates_sb = [MODE_NEW + _mv_bits(mv64, mvp64),
                    jnp.full((1, sh, sw), MODE_NEAR + 1.0, jnp.float32),
                    jnp.full((1, sh, sw), MODE_NEAR + 1.4, jnp.float32)]
        if comp:
            mvp32b = _mv_pred_np(mv32b)
            mvp64b = _mv_pred_np(mv64b)
            mvp16zb = jnp.repeat(mvp32b[:, :, :, None], 4, axis=3)
            rates_top += [2 * MODE_NEW + _mv_bits(mv32, mvp32) +
                          _mv_bits(mv32b, mvp32b),
                          jnp.full((1, bh, bw), MODE_NEAR + 2.0,
                                   jnp.float32)]
            rates_sub += [2 * MODE_NEW + _mv_bits(mv16z, mvp16z) +
                          _mv_bits(mv16zb, mvp16zb),
                          jnp.full((1, bh, bw, 4), MODE_NEAR + 2.0,
                                   jnp.float32)]
            rates_sb += [2 * MODE_NEW + _mv_bits(mv64, mvp64) +
                         _mv_bits(mv64b, mvp64b),
                         jnp.full((1, sh, sw), MODE_NEAR + 2.0,
                                  jnp.float32)]
        rate_top = jnp.stack(rates_top, 1)
        rate_sub = jnp.stack(rates_sub, 1)
        rate_sbl = jnp.stack(rates_sb, 1)
        # tile columns ride the batch axis (slices of every block-grid
        # tensor along bw; MC extras were computed with frame coords)
        T = cfg.tile_cols
        bw_t = bw // T

        def tstack(a, axis):
            if T == 1:
                return a
            n = a.shape[axis] // T
            sl = [slice(None)] * a.ndim
            parts = []
            for t in range(T):
                sl[axis] = slice(t * n, (t + 1) * n)
                parts.append(a[tuple(sl)])
            return jnp.concatenate(parts, axis=0)

        src_t = tstack(yj.astype(jnp.int32), 2)
        extra_top_t = tstack(extra_top, 3)
        extra_sub_t = tstack(extra_sub, 3)
        extra_sb_t = tstack(extra_sb, 3)
        rate_top_t = tstack(rate_top, 3)
        rate_sub_t = tstack(rate_sub, 3)
        rate_sbl_t = tstack(rate_sbl, 3)
        mv32_t = tstack(mv32, 2)
        mv16z_t = tstack(mv16z, 2)
        mv64_t = tstack(mv64, 2)
        sw_t = sw // T
        ones = jnp.ones((T, bh, bw_t), bool)
        ones4 = jnp.ones((T, bh, bw_t, 4), bool)
        ok_top = jnp.ones((T, n_lanes, bh, bw_t), bool)
        ok_sub = jnp.ones((T, n_lanes, bh, bw_t, 4), bool)
        ok_sbl = jnp.ones((T, n_lanes, sh, sw_t), bool)
        ones_sb = jnp.ones((T, sh, sw_t), bool)
        from .geometry import bottom_force_masks
        free_np, free_sb_np = bottom_force_masks(bh, bw_t, sh, sw_t,
                                                 h // 4)
        free = jnp.asarray(np.broadcast_to(free_np, (T, bh, bw_t)))
        free_sb = jnp.asarray(np.broadcast_to(free_sb_np, (T, sh, sw_t)))

        from ..spec.txfm import TX_64X64
        lmap_t = None
        if lam_map is not None:
            lmap_t = tstack(jnp.asarray(lam_map, jnp.float32)[None], 2)
        (part, y_mi, y_lev, y_smi, y_slev, y_stx, y_rec,
         part_sb, y_mi_sb, y_lev_sb) = \
            encode_plane_wavefront_part(
                src_t, BLK, TX_32X32, TX_16X16, q,
                extra_top_t, rate_top_t, extra_sub_t, rate_sub_t, ok_top,
                ok_sub, ones, ones4, free, n_lanes, P_INTRA_MODES,
                SUB_MODES, bd, tuple(cfg.angle_deltas), False,
                cfg.tx_search, lam_scale,
                sb_search=True, tx_sb=TX_64X64, extra_sb=extra_sb_t,
                extra_rate_sb=rate_sbl_t, extra_ok_sb=ok_sbl,
                intra_ok_sb=ones_sb, force_sb=free_sb, valid_h=vh,
                lam_map=lmap_t)

        cands = expand_candidates(P_INTRA_MODES, tuple(cfg.angle_deltas))
        cands_sub = expand_candidates(SUB_MODES, (0,))
        n_i_top = len(cands)
        n_i_sub = len(cands_sub)
        top_inter = y_mi >= n_i_top
        sub_inter = y_smi >= n_i_sub
        sb_inter = y_mi_sb >= n_i_top        # SB lanes share the top space
        # lane layout: 0=NEW(mv), 1=zero(GLOBAL), 2=predicted-MV
        # (NEAREST proxy); compound adds 3=NEW_NEW, 4=GLOBAL_GLOBAL
        mvp32_t = tstack(mvp32, 2)
        mvp16z_t = tstack(mvp16z, 2)
        mvp64_t = tstack(mvp64, 2)
        lane_t = y_mi - n_i_top          # <0 intra
        lane_s = y_smi - n_i_sub
        lane_b = y_mi_sb - n_i_top

        gm_j = jnp.asarray(gmv, mv32_t.dtype)

        def _first_mv(lane, new, pred):
            # default lane (1 = GLOBAL) carries the frame's gm mv
            # (identity → 0; compound GLOBAL_GLOBAL stays identity since
            # gm is disabled on compound frames); intra rows unused
            return jnp.where((lane == 0)[..., None], new,
                             jnp.where((lane == 2)[..., None], pred,
                                       jnp.where((lane == 3)[..., None],
                                                 new, gm_j)))

        if comp:
            mv32b_t = tstack(mv32b, 2)
            mv16zb_t = tstack(mv16zb, 2)
            mv64b_t = tstack(mv64b, 2)
            mv_top_f = jnp.concatenate([
                _first_mv(lane_t, mv32_t, mvp32_t),
                jnp.where((lane_t == 3)[..., None], mv32b_t, 0)], -1)
            mv_sub_f = jnp.concatenate([
                _first_mv(lane_s, mv16z_t, mvp16z_t),
                jnp.where((lane_s == 3)[..., None], mv16zb_t, 0)], -1)
            mv_sb_f = jnp.concatenate([
                _first_mv(lane_b, mv64_t, mvp64_t),
                jnp.where((lane_b == 3)[..., None], mv64b_t, 0)], -1)
        else:
            mv_top_f = _first_mv(lane_t, mv32_t, mvp32_t)
            mv_sub_f = _first_mv(lane_s, mv16z_t, mvp16z_t)
            mv_sb_f = _first_mv(lane_b, mv64_t, mvp64_t)

        # chroma: top 16x16 (part NONE) or 8x8 subs (SPLIT), mv from luma
        y0c, x0c = y0 // 2, x0 // 2
        # chroma MC needs frame-level mvs: reassemble from the tile axis
        def tunstack(a, axis):
            if T == 1:
                return a
            parts = [a[t:t + 1] for t in range(T)]
            return jnp.concatenate(parts, axis=axis)
        mv_top_fr = tunstack(mv_top_f, 2)          # [1, bh, bw, 2 or 4]
        mv_sub_fr = tunstack(mv_sub_f, 2)
        mv_sb_fr = tunstack(mv_sb_f, 2)
        nmv = 4 if comp else 2
        mv_sb_cf = mv_sb_fr.reshape(1, Nsb, nmv)
        pu_sb = predict_inter_blocks(rup, y0s // 2, x0s // 2,
                                     mv_sb_cf[..., :2], h, w, 32, 1, bd, filt)
        pv_sb = predict_inter_blocks(rvp, y0s // 2, x0s // 2,
                                     mv_sb_cf[..., :2], h, w, 32, 1, bd, filt)
        mv_top_cf = mv_top_fr.reshape(1, N, nmv)
        pu_t = predict_inter_blocks(rup, y0c, x0c, mv_top_cf[..., :2], h,
                                    w, CBLK, 1, bd, filt)
        pv_t = predict_inter_blocks(rvp, y0c, x0c, mv_top_cf[..., :2], h,
                                    w, CBLK, 1, bd, filt)
        mv_sub_cf = mv_sub_fr.reshape(1, N * 4, nmv)
        pu_s = predict_inter_blocks(rup, (sy0 // 2)[None], (sx0 // 2)[None],
                                    mv_sub_cf[..., :2], h, w, 8, 1, bd, filt)
        pv_s = predict_inter_blocks(rvp, (sy0 // 2)[None], (sx0 // 2)[None],
                                    mv_sub_cf[..., :2], h, w, 8, 1, bd, filt)
        if comp:
            lane_tf = tunstack(lane_t, 2).reshape(1, N)
            lane_sf = tunstack(lane_s, 2).reshape(1, N * 4)
            lane_bf = tunstack(lane_b, 2).reshape(1, Nsb)
            cb = (lane_bf >= 3)
            puc_sb = predict_inter_blocks_compound(
                rup, r2up, y0s // 2, x0s // 2, mv_sb_cf[..., :2],
                mv_sb_cf[..., 2:], h, w, 32, 1, bd, filt)
            pvc_sb = predict_inter_blocks_compound(
                rvp, r2vp, y0s // 2, x0s // 2, mv_sb_cf[..., :2],
                mv_sb_cf[..., 2:], h, w, 32, 1, bd, filt)
            pu_sb = jnp.where(cb[..., None, None], puc_sb, pu_sb)
            pv_sb = jnp.where(cb[..., None, None], pvc_sb, pv_sb)
            ct = (lane_tf >= 3)
            cs = (lane_sf >= 3)
            puc_t = predict_inter_blocks_compound(
                rup, r2up, y0c, x0c, mv_top_cf[..., :2],
                mv_top_cf[..., 2:], h, w, CBLK, 1, bd, filt)
            pvc_t = predict_inter_blocks_compound(
                rvp, r2vp, y0c, x0c, mv_top_cf[..., :2],
                mv_top_cf[..., 2:], h, w, CBLK, 1, bd, filt)
            puc_s = predict_inter_blocks_compound(
                rup, r2up, (sy0 // 2)[None], (sx0 // 2)[None],
                mv_sub_cf[..., :2], mv_sub_cf[..., 2:], h, w, 8, 1, bd, filt)
            pvc_s = predict_inter_blocks_compound(
                rvp, r2vp, (sy0 // 2)[None], (sx0 // 2)[None],
                mv_sub_cf[..., :2], mv_sub_cf[..., 2:], h, w, 8, 1, bd, filt)
            pu_t = jnp.where(ct[..., None, None], puc_t, pu_t)
            pv_t = jnp.where(ct[..., None, None], pvc_t, pv_t)
            pu_s = jnp.where(cs[..., None, None], puc_s, pu_s)
            pv_s = jnp.where(cs[..., None, None], pvc_s, pv_s)
        c_ok_top = top_inter[:, None]
        c_ok_sub = sub_inter[:, None]
        c_ok_sb = sb_inter[:, None]
        c_rate = jnp.zeros((T, 1, bh, bw_t), jnp.float32)
        c_rate_s = jnp.zeros((T, 1, bh, bw_t, 4), jnp.float32)
        c_rate_sb = jnp.zeros((T, 1, sh, sw_t), jnp.float32)

        # U and V ride ONE paired wavefront (chroma mode decision: each
        # (u,v) pair picks the same uv_mode for intra blocks; inter
        # blocks take the plane's MC lane — ok masks force agreement)
        from .wavefront2 import (CHROMA_SB_MODES, CHROMA_SUB_MODES,
                                 CHROMA_TOP_MODES)
        two = lambda a: jnp.concatenate([a, a])
        uv_src = jnp.concatenate(
            [tstack(jnp.asarray(u)[None].astype(jnp.int32), 2),
             tstack(jnp.asarray(v)[None].astype(jnp.int32), 2)])
        uv_pt = jnp.concatenate(
            [tstack(pu_t.reshape(1, 1, bh, bw, CBLK, CBLK), 3),
             tstack(pv_t.reshape(1, 1, bh, bw, CBLK, CBLK), 3)])
        uv_ps = jnp.concatenate(
            [tstack(pu_s.reshape(1, 1, bh, bw, 4, 8, 8), 3),
             tstack(pv_s.reshape(1, 1, bh, bw, 4, 8, 8), 3)])
        uv_psb = jnp.concatenate(
            [tstack(pu_sb.reshape(1, 1, sh, sw, 32, 32), 3),
             tstack(pv_sb.reshape(1, 1, sh, sw, 32, 32), 3)])
        (_, uv_mi, uv_lev, uv_smi, uv_slev, _, uv_rec,
         _, uv_mi_sb, uv_lev_sb) = encode_plane_wavefront_part(
            uv_src, CBLK, TX_16X16, TX_8X8, q,
            uv_pt, two(c_rate), uv_ps, two(c_rate_s),
            two(c_ok_top), two(c_ok_sub), two(~top_inter),
            two(~sub_inter), two(part), 1,
            CHROMA_TOP_MODES, CHROMA_SUB_MODES, bd, (0,), False, False,
            lam_scale,
            sb_search=True, tx_sb=TX_32X32,
            extra_sb=uv_psb, extra_rate_sb=two(c_rate_sb),
            extra_ok_sb=two(c_ok_sb), intra_ok_sb=two(~sb_inter),
            force_sb=two(part_sb), valid_h=vhc, paired=True,
            uv_rates=True, modes_sbl=CHROMA_SB_MODES, uv_tx=True,
            lam_map=None if lmap_t is None else two(lmap_t))
        TB = uv_mi.shape[0] // 2
        u_mi, u_lev, u_smi, u_slev = (uv_mi[:TB], uv_lev[:TB],
                                      uv_smi[:TB], uv_slev[:TB])
        u_rec, u_lev_sb = uv_rec[:TB], uv_lev_sb[:TB]
        v_mi, v_lev, v_smi, v_slev = (uv_mi[TB:], uv_lev[TB:],
                                      uv_smi[TB:], uv_slev[TB:])
        v_rec, v_lev_sb = uv_rec[TB:], uv_lev_sb[TB:]
        uv_mi, uv_smi, uv_mi_sb = uv_mi[:TB], uv_smi[:TB], uv_mi_sb[:TB]

        # reassemble frame planes/maps for (cross-tile) deblocking
        part_f = tunstack(part, 2)
        part_sb_f = tunstack(part_sb, 2)
        y_rec = tunstack(y_rec, 2)
        u_rec = tunstack(u_rec, 2)
        v_rec = tunstack(v_rec, 2)
        lf = self._dlf_levels(q, y_rec, part_f, part_sb_f, y, bd,
                              valid_h=vh)
        if lf[0] or lf[1]:
            from ..ops.deblock import deblock_plane_part
            y_rec = deblock_plane_part(y_rec, part_f, BLK, 14, lf[0],
                                       lf[1], bd=bd, part_sb=part_sb_f,
                                       valid_h=vh)
            u_rec = deblock_plane_part(u_rec, part_f, CBLK, 6, lf[2],
                                       lf[2], bd=bd, part_sb=part_sb_f,
                                       valid_h=vhc)
            v_rec = deblock_plane_part(v_rec, part_f, CBLK, 6, lf[3],
                                       lf[3], bd=bd, part_sb=part_sb_f,
                                       valid_h=vhc)

        # compact wire format for the coefficient tensors (xfer.py): the
        # dense int32 level fetch dominated the quality path's host time
        # over the ~30MB/s tunnel.  Any fixed permutation is lossless
        # (pack and unpack share the scan), so the canonical DCT scan
        # covers every searched tx type.
        from ..spec.txfm import DCT_DCT as _DD
        from ..spec.txfm import TX_8X8
        from .xfer import fetch_levels

        def _fl(lev, txs, n2):
            return fetch_levels(lev, txs, _DD, (n2, n2))

        y_lev_n = _fl(y_lev, TX_32X32, BLK)
        y_slev_n = _fl(y_slev, TX_16X16, 16)
        u_lev_n = _fl(u_lev, TX_16X16, CBLK)
        v_lev_n = _fl(v_lev, TX_16X16, CBLK)
        u_slev_n = _fl(u_slev, TX_8X8, 8)
        v_slev_n = _fl(v_slev, TX_8X8, 8)
        y_lev_sb_n = _fl(y_lev_sb, TX_32X32, 32)
        u_lev_sb_n = _fl(u_lev_sb, TX_32X32, 32)
        v_lev_sb_n = _fl(v_lev_sb, TX_32X32, 32)
        arrs = [np.asarray(a) for a in
                (part, y_mi, y_smi, mv_top_f, mv_sub_f, y_stx,
                 part_sb, y_mi_sb, mv_sb_f, uv_mi, uv_smi, uv_mi_sb)]
        (part_n, y_mi_n, y_smi_n, mv_t_n, mv_s_n, y_stx_n,
         psb_n, y_mi_sb_n, mv_sb_n, uv_mi_n, uv_smi_n, uv_mi_sb_n) = arrs
        _uvm_t = np.array([m for m, _ in expand_candidates(
            CHROMA_TOP_MODES, (0,))], np.int32)
        _uvm_s = np.array([m for m, _ in expand_candidates(
            CHROMA_SUB_MODES, (0,))], np.int32)
        _uvm_b = np.array([m for m, _ in expand_candidates(
            CHROMA_SB_MODES, (0,))], np.int32)
        uv_top_n = _uvm_t[np.clip(uv_mi_n, 0, len(_uvm_t) - 1)]
        uv_sub_n = _uvm_s[np.clip(uv_smi_n, 0, len(_uvm_s) - 1)]
        uv_sb_n = _uvm_b[np.clip(uv_mi_sb_n, 0, len(_uvm_b) - 1)]
        pix = jnp.uint8 if bd == 8 else jnp.uint16
        y_rec_n = np.asarray(y_rec.astype(pix))[0].astype(np.int32)
        u_rec_n = np.asarray(u_rec.astype(pix))[0].astype(np.int32)
        v_rec_n = np.asarray(v_rec.astype(pix))[0].astype(np.int32)

        cdef_kw, cdef_params = {}, None
        db_planes = (y_rec_n, u_rec_n, v_rec_n)
        if cfg.enable_cdef:
            from ..ops.cdef import cdef_apply_params
            from .cdef_search import (build_skip8,
                                      cdef_frame_config_fields,
                                      cdef_search_frame)
            from .intra_encoder import _lambda
            skip8 = np.concatenate(
                [build_skip8(part_n[t], y_lev_n[t], u_lev_n[t],
                             v_lev_n[t], y_slev_n[t], u_slev_n[t],
                             v_slev_n[t], psb_n[t], y_lev_sb_n[t],
                             u_lev_sb_n[t], v_lev_sb_n[t])
                 for t in range(T)], axis=1)
            src = (np.asarray(y, np.int32), np.asarray(u, np.int32),
                   np.asarray(v, np.int32))
            cdef_params = cdef_search_frame(
                src, (y_rec_n, u_rec_n, v_rec_n), skip8, q,
                _lambda(q), bd)
            y_rec_n, u_rec_n, v_rec_n = (
                np.asarray(p) for p in cdef_apply_params(
                    (y_rec_n, u_rec_n, v_rec_n), skip8, cdef_params, bd))
            cdef_kw = cdef_frame_config_fields(cdef_params)
        ccso_info = None
        if cfg.enable_ccso:
            # fork graft: search + in-loop apply between CDEF and LR,
            # classifying from the pre-CDEF (post-deblock) luma
            from ..ops.ccso import ccso_apply_frame
            from .ccso_search import ccso_search_frame
            from .intra_encoder import _lambda
            src = (np.asarray(y, np.int64), np.asarray(u, np.int64),
                   np.asarray(v, np.int64))
            ccso_info = ccso_search_frame(
                src, (y_rec_n, u_rec_n, v_rec_n), db_planes[0],
                _lambda(q), bd)
            if ccso_info is not None:
                y_rec_n, u_rec_n, v_rec_n = ccso_apply_frame(
                    (y_rec_n, u_rec_n, v_rec_n), db_planes[0],
                    ccso_info, bd)
        lr_types, lr_infos = (0, 0, 0), None
        if cfg.enable_lr:
            from ..ops.lr_frame import lr_apply_frame
            from .intra_encoder import _lambda
            from .lr_search import lr_search_frame
            src = (np.asarray(y, np.int32), np.asarray(u, np.int32),
                   np.asarray(v, np.int32))
            lr_types, lr_infos = lr_search_frame(
                src, (y_rec_n, u_rec_n, v_rec_n), _lambda(q), bd)
            if any(lr_types):
                y_rec_n, u_rec_n, v_rec_n = lr_apply_frame(
                    (y_rec_n, u_rec_n, v_rec_n), db_planes, lr_infos, bd)

        import os as _os
        if _os.environ.get("SVT_DUMP_DIR"):
            import pickle
            _n = len([f for f in _os.listdir(_os.environ["SVT_DUMP_DIR"])
                      if f.startswith("pframe_")])
            with open(_os.path.join(_os.environ["SVT_DUMP_DIR"],
                                    f"pframe_{_n:03d}.pkl"), "wb") as _f:
                pickle.dump(dict(
                    part=part_n, y_mi=y_mi_n, y_lev=y_lev_n,
                    u_lev=u_lev_n, v_lev=v_lev_n, y_smi=y_smi_n,
                    y_slev=y_slev_n, u_slev=u_slev_n, v_slev=v_slev_n,
                    mv_t=mv_t_n, mv_s=mv_s_n, y_stx=y_stx_n,
                    part_sb=psb_n, y_mi_sb=y_mi_sb_n,
                    y_lev_sb=y_lev_sb_n, u_lev_sb=u_lev_sb_n,
                    v_lev_sb=v_lev_sb_n, mv_sb=mv_sb_n,
                    cands=cands, cands_sub=cands_sub, n_i_top=n_i_top,
                    n_i_sub=n_i_sub, comp=comp, q=q, w=w, h=h, lf=lf,
                    cdf0=cdf0, hdr_extra=dict(hdr_extra or {}),
                    cdf_update=cfg.cdf_update, T=T), _f)
        tw_px = w // T
        sbw_t = tw_px // 64
        tiles = []
        end_cdf = None
        for t in range(T):
            tc = TileCoder(tw_px, hp, q, cfg.cdf_update, kf=False,
                           cdf_init=cdf0, comp=comp, true_h=h,
                           gm_mv=gmv,
                           mi_col_off=t * tw_px // 4,
                           frame_mi_cols=w // 4,
                           cdef_bits=(cdef_params["bits"]
                                      if cdef_params else 0),
                           cdef_idx=(cdef_params["idx_map"]
                                     [:, t * sbw_t:(t + 1) * sbw_t]
                                     if cdef_params else None))
            tc.ccso_info = ccso_info
            if any(lr_types):
                sl = slice(t * sbw_t, (t + 1) * sbw_t)
                tc.set_lr(lr_types, [
                    ({k: v[:, sl] for k, v in un.items()}
                     if un is not None else None) for un in lr_infos])
            tile, tcdf = tc.encode(part_n[t], y_mi_n[t], y_lev_n[t],
                                   u_lev_n[t], v_lev_n[t], y_smi_n[t],
                                   y_slev_n[t], u_slev_n[t], v_slev_n[t],
                                   mv_t_n[t], mv_s_n[t], cands, cands_sub,
                                   n_i_top, n_i_sub, stx_sub=y_stx_n[t],
                                   part_sb=psb_n[t], mi_sb=y_mi_sb_n[t],
                                   lev_sb_y=y_lev_sb_n[t],
                                   lev_sb_u=u_lev_sb_n[t],
                                   lev_sb_v=v_lev_sb_n[t],
                                   mv_sb=mv_sb_n[t], uv_top=uv_top_n[t],
                                   uv_sub=uv_sub_n[t], uv_sb=uv_sb_n[t])
            tiles.append(tile)
            if t == 0:
                end_cdf = tcdf
        hdr_extra = dict(hdr_extra or {})
        hdr_extra.setdefault("film_grain", self._fg_inter(hdr_extra))
        primary_ref = hdr_extra.pop("primary_ref_frame",
                                    0 if cdf0 is not None else 7)
        ref_idx = hdr_extra.get("ref_frame_idx", (0,) * 7)
        refresh = hdr_extra.get("refresh_frame_flags", 0x01)
        gm_dict = {1: gmv} if gm else {}
        fr = FrameConfig(frame_type=1, base_q_idx=q,
                         disable_cdf_update=not cfg.cdf_update,
                         disable_frame_end_update_cdf=not cfg.cdf_update,
                         primary_ref_frame=primary_ref,
                         filter_level=(lf[0], lf[1]),
                         filter_level_u=lf[2], filter_level_v=lf[3],
                         interpolation_filter=filt,
                         tile_cols_log2=T.bit_length() - 1,
                         lr_frame_types=lr_types, ccso=ccso_info,
                         gm_mv=gm_dict or None,
                         gm_prev=self._gm_prev_for(primary_ref, ref_idx),
                         **cdef_kw, **(hdr_extra or {}))
        self._gm_save(refresh, gm_dict)
        snap = end_cdf.snapshot() if cfg.cdf_update else None
        if chain and cfg.cdf_update:
            self._cdf_state = snap
        payload = assemble_frame(self.seq, fr,
                                 tiles if T > 1 else tiles[0], first=False)
        rec = (y_rec_n[:h], u_rec_n[:h // 2], v_rec_n[:h // 2])
        return payload, rec, snap

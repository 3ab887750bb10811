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
from .headers import FrameConfig, SequenceConfig, assemble_frame
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


class VideoEncoder:
    """Low-delay I/P encoder.  keyint=1 degenerates to all-intra."""

    def __init__(self, cfg: EncoderConfig, keyint: int = 64):
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

    # -------------------------------------------------------------- #

    def encode_frames(self, frames):
        """Sequential low-delay encode (each P frame references the
        previous recon, so the chain is serial — the batch API exists for
        CLI symmetry with the all-intra encoder)."""
        payloads, recons = [], []
        for f in frames:
            p, r = self.encode_frame(*f)
            payloads.append(p)
            recons.append(r)
        return payloads, recons

    def encode_frame(self, y, u, v):
        if self._idx % self.keyint == 0 or self._dpb is None:
            payloads, recons = self.intra.encode_frames([(y, u, v)])
            payload, rec = payloads[0], recons[0]
            self._cdf_state = None    # key frames reset the CDF chain
        else:
            payload, rec = self._encode_p(y, u, v)
        self._dpb = tuple(np.asarray(p) for p in rec)
        self._idx += 1
        return payload, rec

    def _p_lf_levels(self):
        """Deblock levels from the P-frame qindex (the intra encoder's
        heuristic but at the inter quantizer)."""
        cfg = self.cfg
        if cfg.lf_level == 0 or cfg.bit_depth != 8:
            return (0, 0, 0, 0)
        if cfg.lf_level > 0:
            l = min(cfg.lf_level, 63)
        else:
            q = cfg.qindex
            l = max(0, min(63, (q * q // 1100) + q // 12 - 2))
        lc = max(0, l * 3 // 4)
        return (l, l, lc, lc)

    # -------------------------------------------------------------- #

    def _encode_p(self, y, u, v):
        cfg = self.cfg
        bd = cfg.bit_depth
        h, w = y.shape
        bh, bw = h // BLK, w // BLK
        N = bh * bw
        ry, ru, rv = self._dpb

        yb = jnp.asarray(y)[None].astype(jnp.int32)
        ryp = pad_plane(jnp.asarray(ry)[None].astype(jnp.int32))
        rup = pad_plane(jnp.asarray(ru)[None].astype(jnp.int32))
        rvp = pad_plane(jnp.asarray(rv)[None].astype(jnp.int32))

        mv8, _sad = motion_estimate(jnp.asarray(y)[None],
                                    jnp.asarray(ry)[None], BLK)
        mv8f = mv8.reshape(1, N, 2)
        y0 = (jnp.arange(N) // bw * BLK)[None]
        x0 = (jnp.arange(N) % bw * BLK)[None]

        pred_new = predict_inter_blocks(ryp, y0, x0, mv8f, h, w, BLK,
                                        0, bd)
        pred_zero = predict_inter_blocks(ryp, y0, x0,
                                         jnp.zeros_like(mv8f), h, w, BLK,
                                         0, bd)
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
            yb, BLK, TX_32X32, cfg.qindex, extra, extra_rate, ok, intra_ok,
            2, P_INTRA_MODES, bd, tuple(cfg.angle_deltas))

        cands = expand_candidates(P_INTRA_MODES, tuple(cfg.angle_deltas))
        n_intra = len(cands)
        is_inter = y_mi >= n_intra                       # [1, bh, bw]
        mv_final = jnp.where((y_mi == n_intra)[..., None], mv8, 0)

        # chroma: inter blocks reuse the luma mv; intra blocks use DC
        mv_cf = mv_final.reshape(1, N, 2)
        y0c, x0c = y0 // 2, x0 // 2
        pu = predict_inter_blocks(rup, y0c, x0c, mv_cf, h, w, CBLK, 1, bd)
        pv = predict_inter_blocks(rvp, y0c, x0c, mv_cf, h, w, CBLK, 1, bd)
        c_ok = is_inter[:, None]
        c_rate = jnp.zeros((1, 1, bh, bw), jnp.float32)
        u_mi, u_lev, u_rec = encode_plane_wavefront_mixed(
            jnp.asarray(u)[None].astype(jnp.int32), CBLK, TX_16X16,
            cfg.qindex, pu.reshape(1, 1, bh, bw, CBLK, CBLK), c_rate, c_ok,
            ~is_inter, 1, (0,), bd)     # intra candidate list: DC only
        v_mi, v_lev, v_rec = encode_plane_wavefront_mixed(
            jnp.asarray(v)[None].astype(jnp.int32), CBLK, TX_16X16,
            cfg.qindex, pv.reshape(1, 1, bh, bw, CBLK, CBLK), c_rate, c_ok,
            ~is_inter, 1, (0,), bd)

        lf = self._p_lf_levels()
        if lf[0] or lf[1]:
            y_rec = deblock_plane_uniform(y_rec, BLK, 14, lf[0], lf[1])
            u_rec = deblock_plane_uniform(u_rec, CBLK, 6, lf[2], lf[2])
            v_rec = deblock_plane_uniform(v_rec, CBLK, 6, lf[3], lf[3])

        y_mi = np.asarray(y_mi)[0]
        y_lev = np.asarray(y_lev)[0]
        u_lev = np.asarray(u_lev)[0]
        v_lev = np.asarray(v_lev)[0]
        mv_np = np.asarray(mv_final)[0]

        tile, end_cdf = encode_inter_tile(
            w, h, cfg.qindex, cfg.cdf_update, y_mi, y_lev, u_lev, v_lev,
            mv_np, cands, n_intra, cdf_init=self._cdf_state)
        primary_ref = 0 if self._cdf_state is not None else 7
        fr = FrameConfig(frame_type=1, base_q_idx=cfg.qindex,
                         disable_cdf_update=not cfg.cdf_update,
                         disable_frame_end_update_cdf=not cfg.cdf_update,
                         primary_ref_frame=primary_ref,
                         filter_level=(lf[0], lf[1]),
                         filter_level_u=lf[2], filter_level_v=lf[3])
        if cfg.cdf_update:
            self._cdf_state = end_cdf.snapshot()
        payload = assemble_frame(self.seq, fr, tile, first=False)
        rec = (np.asarray(y_rec)[0], np.asarray(u_rec)[0],
               np.asarray(v_rec)[0])
        return payload, rec

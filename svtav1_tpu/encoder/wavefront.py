"""Whole-plane intra mode-decision + reconstruction as ONE jitted scan.

The anti-diagonal wavefront over fixed-size blocks runs as `lax.scan` with the
recon plane as carry — a single XLA computation per plane per frame batch
(batch axis = pictures, the reference's picture-parallelism, SURVEY.md §2.9).
All candidate modes are evaluated with the normative integer ops, so the
selected levels/recon are final (bit-exact with the decoder).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import intra
from ..ops.intra_dir import dr_pred
from ..ops.quant import dequantize, quantize
from ..ops.transforms import add_residual_clip, fwd_txfm2d, inv_txfm2d
from ..spec import tables as tbl
from ..spec.txfm import DCT_DCT

def expand_candidates(modes, angle_deltas=(0,)):
    """[(mode, delta)] — delta != 0 only for directional modes."""
    out = []
    for m in modes:
        if 1 <= m <= 8:
            out.extend((m, d) for d in angle_deltas)
        else:
            out.append((m, 0))
    return tuple(out)


DEFAULT_MODES = (intra.DC_PRED, intra.V_PRED, intra.H_PRED,
                 intra.D45_PRED, intra.D135_PRED, intra.D113_PRED,
                 intra.D157_PRED, intra.D203_PRED, intra.D67_PRED,
                 intra.SMOOTH_PRED, intra.SMOOTH_V_PRED, intra.SMOOTH_H_PRED,
                 intra.PAETH_PRED)
DIRECTIONAL = set(range(1, 9))


def _diag_tables(bh: int, bw: int):
    """Static per-diagonal block coords (+ top-right / bottom-left
    availability per the SB z-order coding rules, EbIntraPrediction.c:712),
    padded to D = min(bh, bw)."""
    ndiag = bh + bw - 1
    D = min(bh, bw)
    rs = np.zeros((ndiag, D), np.int32)
    cs = np.zeros((ndiag, D), np.int32)
    valid = np.zeros((ndiag, D), bool)
    has_tr = np.zeros((ndiag, D), bool)
    has_bl = np.zeros((ndiag, D), bool)
    for d in range(ndiag):
        r = np.arange(max(0, d - bw + 1), min(bh, d + 1), dtype=np.int32)
        c = d - r
        rs[d, :len(r)] = r
        cs[d, :len(r)] = c
        valid[d, :len(r)] = True
        qr, qc = r % 2, c % 2
        has_tr[d, :len(r)] = np.where(
            qr == 0, (r > 0) & (c + 1 < bw), (qc == 0) & (c + 1 < bw))
        has_bl[d, :len(r)] = (qr == 0) & (qc == 0) & (c > 0) & (r + 1 < bh)
    return rs, cs, valid, has_tr, has_bl


def _lambda(qindex: int) -> float:
    _, ac = tbl.qindex_to_dq(qindex, 8)
    return 0.035 * float(ac) * float(ac) / 16.0


@partial(jax.jit,
         static_argnames=("bs", "tx_size", "qindex", "modes", "bd",
                          "angle_deltas"))
def encode_plane_wavefront(src, bs: int, tx_size: int, qindex: int,
                           modes: tuple = DEFAULT_MODES, bd: int = 8,
                           angle_deltas: tuple = (0,)):
    """src [B, h, w] uint8/int32 (h, w multiples of bs) →
    (cand_idx [B, bh, bw], levels [B, bh, bw, bs, bs], recon [B, h, w]).

    The candidate list is `expand_candidates(modes, angle_deltas)`; cand_idx
    indexes into it."""
    B, h, w = src.shape
    bh, bw = h // bs, w // bs
    rs_t, cs_t, valid_t, has_tr_t, has_bl_t = _diag_tables(bh, bw)
    D = rs_t.shape[1]
    lam = _lambda(qindex)
    src = src.astype(jnp.int32)
    base = 1 << (bd - 1)

    ar = jnp.arange(bs)

    def gather_rows(plane, y, x):
        # plane [B,h,w]; y,x [D] → [B, D, bs] row at y, cols x..x+bs-1
        return plane[:, y[:, None], x[:, None] + ar[None, :]]

    def gather_cols(plane, y, x):
        return plane[:, y[:, None] + ar[None, :], x[:, None]]

    def gather_blocks(plane, y, x):
        return plane[:, y[:, None, None] + ar[None, :, None],
                     x[:, None, None] + ar[None, None, :]]

    def step(recon, xs):
        rs, cs, valid, has_tr, has_bl = xs
        y = rs * bs
        x = cs * bs
        ha = (rs > 0)[None, :, None]                     # [1, D, 1]
        hl = (cs > 0)[None, :, None]

        above_real = gather_rows(recon, jnp.maximum(y - 1, 0), x)
        left_real = gather_cols(recon, y, jnp.maximum(x - 1, 0))
        corner_real = recon[:, jnp.maximum(y - 1, 0), jnp.maximum(x - 1, 0)]

        above = jnp.where(ha, above_real,
                          jnp.where(hl, left_real[..., 0:1], base - 1))
        left = jnp.where(hl, left_real,
                         jnp.where(ha, above_real[..., 0:1], base + 1))
        ha1, hl1 = ha[..., 0], hl[..., 0]
        corner = jnp.where(ha1 & hl1, corner_real,
                           jnp.where(ha1, above_real[..., 0],
                                     jnp.where(hl1, left_real[..., 0], base)))

        # top-right / bottom-left extensions (replicate when unavailable)
        tr_real = gather_rows(recon, jnp.maximum(y - 1, 0),
                              jnp.minimum(x + bs, w - bs))
        bl_real = gather_cols(recon, jnp.minimum(y + bs, h - bs),
                              jnp.maximum(x - 1, 0))
        htr = has_tr[None, :, None]
        hbl = has_bl[None, :, None]
        above_ext = jnp.concatenate(
            [above, jnp.where(htr, tr_real, above[..., -1:])], axis=-1)
        left_ext = jnp.concatenate(
            [left, jnp.where(hbl, bl_real, left[..., -1:])], axis=-1)

        blocks = gather_blocks(src, y, x)                # [B, D, bs, bs]

        # flatten batch*diag for the mode loop
        fb = lambda t: t.reshape((B * D,) + t.shape[2:])
        f_src, f_above, f_left, f_corner = map(
            fb, (blocks, above, left, corner))
        f_above_ext, f_left_ext = map(fb, (above_ext, left_ext))
        f_ha = jnp.broadcast_to(ha1, (B, D)).reshape(-1)
        f_hl = jnp.broadcast_to(hl1, (B, D)).reshape(-1)

        best_cost = best_mi = best_lev = best_rec = None
        for mi, (mode, delta) in enumerate(
                expand_candidates(modes, angle_deltas)):
            if mode == intra.DC_PRED:
                p = [intra.dc_pred(f_above, f_left, a, l, bd)
                     for a, l in ((True, True), (True, False), (False, True),
                                  (False, False))]
                haa = f_ha[:, None, None]
                hll = f_hl[:, None, None]
                pred = jnp.where(haa & hll, p[0],
                                 jnp.where(haa, p[1],
                                           jnp.where(hll, p[2], p[3])))
            elif mode in DIRECTIONAL and (delta != 0 or mode not in
                                          (intra.V_PRED, intra.H_PRED)):
                pred = dr_pred(mode, delta, f_above_ext, f_left_ext,
                               f_corner, bs, bd)
            else:
                pred = intra.predict(mode, f_above, f_left, f_corner)
            resid = f_src - pred
            coeff = fwd_txfm2d(resid, tx_size, DCT_DCT, bd)
            lev = quantize(coeff, tx_size, qindex, bd)
            dq = dequantize(lev, tx_size, qindex, bd)
            recb = add_residual_clip(pred, inv_txfm2d(dq, tx_size, DCT_DCT,
                                                      bd), bd)
            sse = jnp.sum((f_src - recb) ** 2, axis=(-1, -2)).astype(
                jnp.float32)
            nnz = jnp.sum(lev != 0, axis=(-1, -2)).astype(jnp.float32)
            lbits = jnp.sum(jnp.log2(1.0 + jnp.abs(lev).astype(jnp.float32)),
                            axis=(-1, -2))
            cost = sse + lam * (40.0 + 8.0 * nnz + 2.0 * lbits)
            if best_cost is None:
                best_cost = cost
                best_mi = jnp.zeros_like(cost, jnp.int32)
                best_lev, best_rec = lev, recb
            else:
                take = cost < best_cost
                best_cost = jnp.where(take, cost, best_cost)
                best_mi = jnp.where(take, mi, best_mi)
                t3 = take[:, None, None]
                best_lev = jnp.where(t3, lev, best_lev)
                best_rec = jnp.where(t3, recb, best_rec)

        # scatter recon blocks (invalid lanes → dropped via OOB row index)
        rec_d = best_rec.reshape(B, D, bs, bs)
        y_eff = jnp.where(valid, y, h + bs)              # OOB → drop
        rows = y_eff[:, None, None] + ar[None, :, None]
        colx = x[:, None, None] + ar[None, None, :]
        recon = recon.at[:, rows, colx].set(rec_d, mode="drop")
        return recon, (best_mi.reshape(B, D),
                       best_lev.reshape(B, D, bs, bs))

    recon0 = jnp.zeros((B, h, w), jnp.int32)
    recon, (mi_d, lev_d) = jax.lax.scan(
        step, recon0, (jnp.asarray(rs_t), jnp.asarray(cs_t),
                       jnp.asarray(valid_t), jnp.asarray(has_tr_t),
                       jnp.asarray(has_bl_t)))

    # un-diagonalize: [ndiag, B, D, ...] → [B, bh, bw, ...]
    flat_idx = rs_t * bw + cs_t                          # [ndiag, D]
    mode_idx = jnp.zeros((B, bh * bw), jnp.int32)
    levels = jnp.zeros((B, bh * bw, bs, bs), jnp.int32)
    idx = jnp.asarray(np.where(valid_t, flat_idx, bh * bw))
    mode_idx = mode_idx.at[:, idx].set(
        jnp.moveaxis(mi_d, 1, 0), mode="drop")
    levels = levels.at[:, idx].set(
        jnp.moveaxis(lev_d, 1, 0), mode="drop")
    return (mode_idx.reshape(B, bh, bw),
            levels.reshape(B, bh, bw, bs, bs), recon)

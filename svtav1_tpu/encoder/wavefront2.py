"""Two-depth partition wavefront: 32x32 NONE vs SPLIT into 4x 16x16,
decided by closed-loop RD inside the same z-order scan.

TPU mapping of the reference's partition-depth decision
(EbProductCodingLoop.c:1687-10465 PD0/PD1 square-depth path, collapsed to
two depths): each scan sub-step evaluates BOTH the whole-block candidates
and the four z-order sub-blocks (with true neighbor recon threaded through
a local buffer), then keeps the cheaper tree.  Sub-blocks use the
no-extended-edge intra mode set (Z1/Z3 directional excluded) so their
prediction never depends on above-right/below-left availability — the
decision stays bit-exact for any partition the decoder sees.

Used for luma (bs=32) and chroma (bs=16, partition forced by luma).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import intra
from ..ops.intra_dir import dr_pred
from ..ops.quant import dequantize_dq, quantize_dq, quantize_dq_opt
from ..ops.transforms import add_residual_clip, fwd_txfm2d, inv_txfm2d
from ..spec.txfm import DCT_DCT
from ..spec import tables as tbl
from .wavefront import (DIRECTIONAL, _lambda, _quad_tables, _resid_bits,
                        expand_candidates, intra_mode_rate_table)

# sub-block intra modes: everything that never reads the above-right /
# below-left extended edges (Z2 directional keeps above/left/corner only)
SUB_MODES = (intra.DC_PRED, intra.V_PRED, intra.H_PRED,
             intra.D135_PRED, intra.D113_PRED, intra.D157_PRED,
             intra.SMOOTH_PRED, intra.SMOOTH_V_PRED, intra.SMOOTH_H_PRED,
             intra.PAETH_PRED)

# chroma mode decision lists (paired u/v wavefront): top/SB chroma blocks
# sit at quad z-positions with full extended-edge availability; 8x8 subs
# under SPLIT use the Z2-safe set like luma subs
CHROMA_TOP_MODES = (intra.DC_PRED, intra.V_PRED, intra.H_PRED,
                    intra.D45_PRED, intra.D135_PRED, intra.D113_PRED,
                    intra.D157_PRED, intra.D203_PRED, intra.D67_PRED,
                    intra.SMOOTH_PRED, intra.SMOOTH_V_PRED,
                    intra.SMOOTH_H_PRED, intra.PAETH_PRED)
CHROMA_SUB_MODES = SUB_MODES
# SB-depth chroma (32x32 under a 64x64 NONE) keeps the Z2-safe set: its
# above-right/below-left availability at that depth is not modeled by the
# quad tables, so extended-edge modes are excluded outright
CHROMA_SB_MODES = SUB_MODES


def _cdf_sym_bits(table, sym):
    hi = 32768 if sym == 0 else int(table[sym - 1])
    return -np.log2(max(hi - int(table[sym]), 1) / 32768.0)


# tx types searched on 16x16 intra luma leaves — the members of the
# reduced intra set EXT_TX_SET_DTT4_IDTX (EbDefinitions.h get_ext_tx_set)
TX_SEARCH_TYPES = (0, 3, 1, 2, 9)   # DCT, ADST_ADST, ADST_DCT, DCT_ADST, IDTX


def txt_rate_table(qindex: int):
    """[13 intra modes, 5 search types] signaling bits for the 16x16
    intra tx-type symbol from the default CDFs (intra_ext_tx_cdf set 2,
    sqr size 2; EbMdRateEstimation.c av1_ext_tx_ind path)."""
    from ..spec.cdf import CdfContext
    from ..spec.txfm import TX_16X16
    from ..ec.coeffs import EXT_TX_IND
    cdf = CdfContext(qindex)
    out = np.zeros((13, len(TX_SEARCH_TYPES)), np.float32)
    sq = tbl.txsize_sqr(TX_16X16)
    for mode in range(13):
        t = cdf.intra_ext_tx_cdf[2][sq][mode]
        for i, tt in enumerate(TX_SEARCH_TYPES):
            out[mode, i] = _cdf_sym_bits_n(t, EXT_TX_IND[2][tt], 5)
    return out


def _cdf_sym_bits_n(table, sym, nsyms):
    hi = 32768 if sym == 0 else int(table[sym - 1])
    lo = int(table[sym]) if sym < nsyms - 1 else 0
    return -np.log2(max(hi - lo, 1) / 32768.0)


def partition_bits(qindex: int, bs: int):
    """(bits_none, bits_split_total) at the top block size from the default
    partition CDFs (split total includes the four leaf NONE symbols)."""
    from ..spec.cdf import CdfContext
    from ..ec.modes import PARTITION_NONE, PARTITION_SPLIT
    cdf = CdfContext(qindex)
    bsl_top = {32: 2, 16: 1}[bs]
    t_top = cdf.partition_cdf[bsl_top * 4]
    t_leaf = cdf.partition_cdf[(bsl_top - 1) * 4]
    b_none = _cdf_sym_bits(t_top, PARTITION_NONE)
    b_split = _cdf_sym_bits(t_top, PARTITION_SPLIT) + \
        4 * _cdf_sym_bits(t_leaf, PARTITION_NONE)
    return float(b_none), float(b_split)


def partition_bits_sb(qindex: int, bs2: int):
    """(bits_none, bits_split) of the superblock-level partition symbol
    alone (the sub-tree costs already include their own partition bits)."""
    from ..spec.cdf import CdfContext
    from ..ec.modes import PARTITION_NONE, PARTITION_SPLIT
    cdf = CdfContext(qindex)
    bsl = {64: 3, 32: 2}[bs2]
    t = cdf.partition_cdf[bsl * 4]
    return (float(_cdf_sym_bits(t, PARTITION_NONE)),
            float(_cdf_sym_bits(t, PARTITION_SPLIT)))


def encode_plane_wavefront_part(src, bs: int, tx_top: int, tx_sub: int,
                                qindex: int, extra_top, extra_rate_top,
                                extra_sub, extra_rate_sub, extra_ok_top,
                                extra_ok_sub, intra_ok_top, intra_ok_sub,
                                force_part, n_extra: int,
                                modes_top: tuple, modes_sub: tuple,
                                bd: int = 8, angle_deltas: tuple = (0,),
                                kf: bool = True, tx_search: bool = False,
                                lam_scale: float = 1.0,
                                sb_search: bool = False, tx_sb: int = None,
                                extra_sb=None, extra_rate_sb=None,
                                extra_ok_sb=None, intra_ok_sb=None,
                                force_sb=None, valid_h: int = None,
                                paired: bool = False, uv_rates: bool = False,
                                modes_sbl: tuple = None,
                                uv_tx: bool = False, lam_map=None):
    """Public wrapper: computes the per-qindex RD inputs host-side and
    passes them traced so per-frame q changes reuse the compilation.

    tx_search: RD-refine the tx type of INTRA sub-block (16x16 luma)
    winners over the reduced intra set (TX_SEARCH_TYPES) — reference
    MDS3 tx-type search (Docs/Appendix-TX-Search.md).
    lam_scale: RD lambda multiplier (per-temporal-layer rate pressure,
    the reference's layer lambda weighting in EbModeDecisionConfig).

    sb_search: add the superblock (2*bs) partition depth: each 2bs x 2bs
    quad also evaluates a whole-block NONE candidate set (single
    TX_64X64/TX_32X32 transform block, intra modes_top + extras given by
    extra_sb/extra_rate_sb/extra_ok_sb, gated by intra_ok_sb, forced by
    force_sb {-1 free, 0 NONE, 1 SPLIT}) against the 32-tree RD cost —
    the reference's PD0 64x64 depth (EbProductCodingLoop.c d2 decision).
    Returns 3 extra outputs (part_sb [B,sh,sw] 0=NONE/1=split,
    mi_sb [B,sh,sw], lev_sb [B,sh,sw,32,32] coded-area levels)."""
    cands_top = expand_candidates(modes_top, angle_deltas)
    cands_sub = expand_candidates(modes_sub, (0,))
    dc, ac = tbl.qindex_to_dq(qindex, bd)
    bn, bsp = partition_bits(qindex, bs)
    mode_ids = np.array([m for m, _ in cands_sub], np.int32)
    rate_kf = "uv" if uv_rates else kf
    if sb_search:
        bn2, bsp2 = partition_bits_sb(qindex, 2 * bs)
        rate_sb = intra_mode_rate_table(
            expand_candidates(modes_sbl or modes_top, angle_deltas),
            qindex, kf=rate_kf)
    else:
        bn2 = bsp2 = 0.0
        rate_sb = np.zeros(1, np.float32)
    if lam_map is None:
        B_, h_, w_ = src.shape
        lam_map = jnp.ones((B_, h_ // bs, w_ // bs), jnp.float32)
    rd = (jnp.int32(dc), jnp.int32(ac),
          jnp.float32(_lambda(qindex) * lam_scale),
          jnp.asarray(intra_mode_rate_table(cands_top, qindex,
                                            kf=rate_kf)),
          jnp.asarray(intra_mode_rate_table(cands_sub, qindex,
                                            kf=rate_kf)),
          jnp.float32(bn), jnp.float32(bsp),
          jnp.asarray(txt_rate_table(qindex)), jnp.asarray(mode_ids),
          jnp.asarray(rate_sb), jnp.float32(bn2), jnp.float32(bsp2))
    return _wavefront_part_impl(src, rd, extra_top, extra_rate_top,
                                extra_sub, extra_rate_sub, extra_ok_top,
                                extra_ok_sub, intra_ok_top, intra_ok_sub,
                                force_part, extra_sb, extra_rate_sb,
                                extra_ok_sb, intra_ok_sb, force_sb,
                                bs, tx_top, tx_sub, n_extra,
                                modes_top, modes_sub, bd, angle_deltas, kf,
                                tx_search, sb_search, tx_sb, valid_h,
                                paired, modes_sbl, uv_tx, lam_map)


@partial(jax.jit,
         static_argnames=("bs", "tx_top", "tx_sub", "modes_top",
                          "modes_sub", "bd", "angle_deltas", "n_extra",
                          "kf", "tx_search", "sb_search", "tx_sb",
                          "valid_h", "paired", "modes_sbl", "uv_tx"))
def _wavefront_part_impl(src, rd, extra_top, extra_rate_top,
                         extra_sub, extra_rate_sub, extra_ok_top,
                         extra_ok_sub, intra_ok_top, intra_ok_sub,
                         force_part, extra_sb, extra_rate_sb, extra_ok_sb,
                         intra_ok_sb, force_sb,
                         bs: int, tx_top: int, tx_sub: int,
                         n_extra: int, modes_top: tuple, modes_sub: tuple,
                         bd: int = 8, angle_deltas: tuple = (0,),
                         kf: bool = True, tx_search: bool = False,
                         sb_search: bool = False, tx_sb: int = None,
                         valid_h: int = None, paired: bool = False,
                         modes_sbl: tuple = None, uv_tx: bool = False,
                         lam_map=None):
    """src [B,h,w] → (part [B,bh,bw] int32, mi_top [B,bh,bw],
    lev_top [B,bh,bw,bs,bs], mi_sub [B,bh,bw,4], lev_sub [B,bh,bw,4,h2,h2],
    recon [B,h,w]).

    extra_top [B,nE,bh,bw,bs,bs] / extra_sub [B,nE,bh,bw,4,h2,h2]:
    precomputed non-intra candidate predictions (z-order subs), gated by
    extra_ok_top [B,nE,bh,bw] / extra_ok_sub [B,nE,bh,bw,4] with rates
    extra_rate_top [B,nE,bh,bw] / extra_rate_sub [B,nE,bh,bw,4];
    intra_ok_top [B,bh,bw] / intra_ok_sub [B,bh,bw,4] gate intra;
    force_part [B,bh,bw]: -1 free, 0 NONE, 1 SPLIT.
    Candidate index space: [0..n_intra) intra then extras.

    valid_h: true (unpadded) frame height — left/below-left edge rows
    clamp at valid_h-1, the spec's §7.11.2 maxY bottom-edge replication
    (see wavefront.py _wavefront_impl)."""
    (dqdc, dqac, lam, rate_top, rate_sub, bits_none, bits_split,
     txt_tbl, mode_ids, rate_sb, bits_none_sb, bits_split_sb) = rd
    B, h, w = src.shape
    vh = h if valid_h is None else valid_h
    hs = bs // 2
    bs2 = bs * 2
    bh, bw = h // bs, w // bs
    sh, sw = h // bs2, w // bs2
    rs_t, cs_t, valid_t, has_tr_t, has_bl_t = _quad_tables(bh, bw)
    D = rs_t.shape[2]
    src = src.astype(jnp.int32)
    base = 1 << (bd - 1)
    cands_top = expand_candidates(modes_top, angle_deltas)
    cands_sub = expand_candidates(modes_sub, (0,))
    # tx-type signaling overhead (DCT symbol) per coded luma txb
    txb_top = 0.0 if (bs >= 32 and kf) else 1.0
    txb_sub = 2.4 if kf else 1.0
    BIG = jnp.float32(3e38)

    ar = jnp.arange(bs)
    ar2 = jnp.arange(hs)
    # pre-blocked source (per-step pixel-space gathers from the full
    # plane dominate real step time — see wavefront.py)
    src_b = src.reshape(B, bh, bs, bw, bs).transpose(0, 1, 3, 2, 4)
    src_sb = src.reshape(B, sh, 2 * bs, sw, 2 * bs).transpose(
        0, 1, 3, 2, 4)

    def gather_rows(plane, y, x, n):
        a = jnp.arange(n)
        return plane[:, y[:, None], x[:, None] + a[None, :]]

    def gather_cols(plane, y, x, n):
        a = jnp.arange(n)
        rows = jnp.minimum(y[:, None] + a[None, :], vh - 1)
        return plane[:, rows, x[:, None]]

    def gather_blocks(plane, y, x, n):
        a = jnp.arange(n)
        return plane[:, y[:, None, None] + a[None, :, None],
                     x[:, None, None] + a[None, None, :]]

    def txq(pred, f_src, tx_size, n, tx_bits, tx_type=DCT_DCT):
        resid = f_src - pred
        coeff = fwd_txfm2d(resid, tx_size, tx_type, bd)
        lev = quantize_dq_opt(coeff, tx_size, dqdc, dqac, lam, bd)
        dq = dequantize_dq(lev, tx_size, dqdc, dqac, bd)
        recb = add_residual_clip(pred, inv_txfm2d(dq, tx_size, tx_type,
                                                  bd), bd)
        sse = jnp.sum((f_src - recb) ** 2, axis=(-1, -2)).astype(jnp.float32)
        rb = _resid_bits(lev, n)
        nnz = jnp.sum(lev != 0, axis=(-1, -2))
        rb = rb + jnp.where(nnz > 0, tx_bits, 0.0)
        return lev, recb, sse, rb

    def intra_pred(mode, delta, f_above, f_left, f_corner, f_ha, f_hl, n,
                   f_above_ext=None, f_left_ext=None):
        """One intra candidate's prediction [B*D, n, n]."""
        if mode == intra.DC_PRED:
            p = [intra.dc_pred(f_above, f_left, a, l, bd)
                 for a, l in ((True, True), (True, False),
                              (False, True), (False, False))]
            haa = f_ha[:, None, None]
            hll = f_hl[:, None, None]
            return jnp.where(haa & hll, p[0],
                             jnp.where(haa, p[1],
                                       jnp.where(hll, p[2], p[3])))
        if mode in DIRECTIONAL and (delta != 0 or mode not in
                                    (intra.V_PRED, intra.H_PRED)):
            if f_above_ext is None:
                f_above_ext = jnp.concatenate(
                    [f_above, f_above[..., -1:].repeat(n, -1)], -1)
                f_left_ext = jnp.concatenate(
                    [f_left, f_left[..., -1:].repeat(n, -1)], -1)
            return dr_pred(mode, delta, f_above_ext, f_left_ext,
                           f_corner, n, bd)
        return intra.predict(mode, f_above, f_left, f_corner)

    def stack_eval(preds, rates, oks, f_src, tx_size, n, tx_bits, txq_fn,
                   tx_types=None, f_lam=None):
        """ALL candidates through ONE txq chain: preds/rates/oks are
        parallel lists ([BD,n,n] / [BD] or scalar / [BD] bool or None).
        argmin keeps the first minimum — identical tie-break to the old
        sequential `_take` loop.  Returns the old best-pack tuple.

        paired (closure): u/v halves of the batch axis pick the SAME
        candidate (one signaled uv_mode) — pair costs sum before argmin.
        tx_types: per-candidate tx type (chroma-intra implied types,
        spec compute_tx_type) — candidates group by type, one chain per
        distinct type (<=4)."""
        C = len(preds)
        BD = preds[0].shape[0]
        pred_s = jnp.stack(preds)                      # [C, BD, n, n]
        if tx_types is None or len(set(tx_types)) == 1:
            tt0 = DCT_DCT if tx_types is None else tx_types[0]
            lev, recb, sse, rb = txq_fn(
                pred_s.reshape(C * BD, n, n),
                jnp.tile(f_src, (C, 1, 1)), tt0)
        else:
            slots = [None] * C
            for tt in sorted(set(tx_types)):
                idxs = [i for i, t in enumerate(tx_types) if t == tt]
                sub = jnp.concatenate([pred_s[i] for i in idxs])
                out = txq_fn(sub, jnp.tile(f_src, (len(idxs), 1, 1)), tt)
                for k, i in enumerate(idxs):
                    slots[i] = tuple(o.reshape((len(idxs), BD) +
                                               o.shape[1:])[k]
                                     for o in out)
            lev = jnp.concatenate([s[0] for s in slots])
            recb = jnp.concatenate([s[1] for s in slots])
            sse = jnp.concatenate([s[2] for s in slots])
            rb = jnp.concatenate([s[3] for s in slots])
        sse = sse.reshape(C, BD)
        rb = rb.reshape(C, BD)
        rate_s = jnp.stack([jnp.broadcast_to(r, (BD,)) for r in rates])
        lamv = lam if f_lam is None else lam * f_lam[None, :]
        rcost_s = sse + lamv * rb
        cost_s = rcost_s + lamv * rate_s
        ok_s = jnp.stack([jnp.ones((BD,), bool) if o is None else o
                          for o in oks])
        cost_s = jnp.where(ok_s, cost_s, BIG)
        if paired:
            cp = cost_s.reshape(C, 2, BD // 2).sum(1)
            mi = jnp.tile(jnp.argmin(cp, axis=0), 2).astype(jnp.int32)
        else:
            mi = jnp.argmin(cost_s, axis=0).astype(jnp.int32)
        sel = mi[None]
        cost = jnp.take_along_axis(cost_s, sel, 0)[0]
        rcost = jnp.take_along_axis(rcost_s, sel, 0)[0]
        sel3 = mi[None, :, None, None]
        lev_b = jnp.take_along_axis(
            lev.reshape((C, BD) + lev.shape[1:]), sel3, 0)[0]
        rec_b = jnp.take_along_axis(recb.reshape(C, BD, n, n), sel3, 0)[0]
        pred_b = jnp.take_along_axis(pred_s, sel3, 0)[0]
        return cost, mi, lev_b, rec_b, pred_b, rcost

    def eval_set(f_src, f_above, f_left, f_corner, f_ha, f_hl, cands,
                 mode_rates, n, tx_size, tx_bits, f_iok, extras,
                 f_lam=None):
        """Best candidate over intra list + extras, then (optionally) RD
        tx-type refinement of intra winners.
        extras: list of (pred [B*D,n,n], rate [B*D], ok [B*D]).
        Returns (cost, mi, lev, recb, tx_idx)."""
        preds, rates, oks = [], [], []
        for mi, (mode, delta) in enumerate(cands):
            preds.append(intra_pred(mode, delta, f_above, f_left,
                                    f_corner, f_ha, f_hl, n))
            rates.append(mode_rates[mi])
            oks.append(f_iok)
        for pred, rate, ok in extras:
            preds.append(pred)
            rates.append(rate)
            oks.append(ok)
        n_intra = len(cands)
        if uv_tx:
            from ..spec.txfm import uv_intra_tx_type
            ttypes = [uv_intra_tx_type(m, tx_size) for m, _ in cands] + \
                [DCT_DCT] * len(extras)
        else:
            ttypes = None
        cost, mi, lev, recb, pred, rcost = stack_eval(
            preds, rates, oks, f_src, tx_size, n, tx_bits,
            lambda p, s, tt: txq(p, s, tx_size, n, tx_bits, tt),
            tx_types=ttypes, f_lam=f_lam)
        tx_idx = jnp.zeros_like(mi)
        if tx_search:
            m_ids = mode_ids[jnp.clip(mi, 0, len(mode_ids) - 1)]
            lamv = lam if f_lam is None else lam * f_lam
            cur_eff = rcost + lamv * txt_tbl[m_ids, 0]
            is_intra = mi < n_intra
            for ti in range(1, len(TX_SEARCH_TYPES)):
                tt = TX_SEARCH_TYPES[ti]
                lev2, recb2, sse2, rb2 = txq(pred, f_src, tx_size, n, 0.0,
                                             tt)
                new_eff = sse2 + lamv * (rb2 + txt_tbl[m_ids, ti])
                take = is_intra & (new_eff < cur_eff)
                t3 = take[:, None, None]
                cost = jnp.where(take, cost - cur_eff + new_eff, cost)
                lev = jnp.where(t3, lev2, lev)
                recb = jnp.where(t3, recb2, recb)
                tx_idx = jnp.where(take, ti, tx_idx)
                cur_eff = jnp.where(take, new_eff, cur_eff)
        return cost, mi, lev, recb, tx_idx

    def _take(best, pack):
        take = pack[0] < best[0]
        t3 = take[:, None, None]
        return (jnp.where(take, pack[0], best[0]),
                jnp.where(take, pack[1], best[1]),
                jnp.where(t3, pack[2], best[2]),
                jnp.where(t3, pack[3], best[3]),
                jnp.where(t3, pack[4], best[4]),
                jnp.where(take, pack[5], best[5]))

    def sub_step(carry, rs, cs, valid, has_tr, has_bl):
        rowbuf, colbuf = carry
        y = rs * bs
        x = cs * bs
        ha = (rs > 0)[None, :, None]
        hl = (cs > 0)[None, :, None]
        rm1 = jnp.maximum(rs - 1, 0)
        cm1 = jnp.maximum(cs - 1, 0)
        arb = jnp.arange(bs)

        above_real = rowbuf[:, rm1[:, None], x[:, None] + arb[None, :]]
        lrows = jnp.minimum(y[:, None] + arb[None, :], vh - 1)
        left_real = colbuf[:, lrows, cm1[:, None]]
        corner_real = rowbuf[:, rm1, jnp.maximum(x - 1, 0)]
        above = jnp.where(ha, above_real,
                          jnp.where(hl, left_real[..., 0:1], base - 1))
        left = jnp.where(hl, left_real,
                         jnp.where(ha, above_real[..., 0:1], base + 1))
        ha1, hl1 = ha[..., 0], hl[..., 0]
        corner = jnp.where(ha1 & hl1, corner_real,
                           jnp.where(ha1, above_real[..., 0],
                                     jnp.where(hl1, left_real[..., 0],
                                               base)))
        tr_real = rowbuf[:, rm1[:, None],
                         jnp.minimum(x + bs, w - bs)[:, None] +
                         arb[None, :]]
        brows = jnp.minimum(jnp.minimum(y + bs, h - bs)[:, None] +
                            arb[None, :], vh - 1)
        bl_real = colbuf[:, brows, cm1[:, None]]
        htr = has_tr[None, :, None]
        hbl = has_bl[None, :, None]
        above_ext = jnp.concatenate(
            [above, jnp.where(htr, tr_real, above[..., -1:])], axis=-1)
        left_ext = jnp.concatenate(
            [left, jnp.where(hbl, bl_real, left[..., -1:])], axis=-1)

        blocks = src_b[:, rs, cs]

        fb = lambda t: t.reshape((B * D,) + t.shape[2:])
        f_src = fb(blocks)
        f_above, f_left, f_corner = map(fb, (above, left, corner))
        f_above_ext, f_left_ext = map(fb, (above_ext, left_ext))
        f_ha = jnp.broadcast_to(ha1, (B, D)).reshape(-1)
        f_hl = jnp.broadcast_to(hl1, (B, D)).reshape(-1)
        f_iok = intra_ok_top[:, rs, cs].reshape(-1)
        f_lam = lam_map[:, rs, cs].reshape(-1)

        # ---- whole-block (NONE) evaluation, incl. extended-edge modes ---
        preds_t, rates_t, oks_t = [], [], []
        for mi, (mode, delta) in enumerate(cands_top):
            preds_t.append(intra_pred(mode, delta, f_above, f_left,
                                      f_corner, f_ha, f_hl, bs,
                                      f_above_ext, f_left_ext))
            rates_t.append(rate_top[mi])
            oks_t.append(f_iok)
        for e in range(n_extra):
            preds_t.append(fb(extra_top[:, e][:, rs, cs]))
            rates_t.append(extra_rate_top[:, e][:, rs, cs].reshape(-1))
            oks_t.append(extra_ok_top[:, e][:, rs, cs].reshape(-1))
        if uv_tx:
            from ..spec.txfm import uv_intra_tx_type
            tt_top = [uv_intra_tx_type(m, tx_top) for m, _ in cands_top] \
                + [DCT_DCT] * n_extra
        else:
            tt_top = None
        best_top = stack_eval(
            preds_t, rates_t, oks_t, f_src, tx_top, bs, txb_top,
            lambda p, s, tt: txq(p, s, tx_top, bs, txb_top, tt),
            tx_types=tt_top, f_lam=f_lam)

        # ---- SPLIT evaluation: 4 z-order sub-blocks ---------------------
        loc = jnp.zeros((B * D, bs, bs), jnp.int32)
        sub_cost = 0.0
        sub_mi, sub_lev, sub_tx = [], [], []
        for z, (sr, sc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            oy, ox = sr * hs, sc * hs
            s_src = f_src[:, oy:oy + hs, ox:ox + hs]
            # above edge
            if sr == 0:
                s_above_real = f_above[..., ox:ox + hs]
                s_ha = f_ha
            else:
                s_above_real = loc[:, oy - 1, ox:ox + hs]
                s_ha = jnp.ones_like(f_ha)
            if sc == 0:
                s_left_real = f_left[..., oy:oy + hs]
                s_hl = f_hl
            else:
                s_left_real = loc[:, oy:oy + hs, ox - 1]
                s_hl = jnp.ones_like(f_hl)
            # corner
            if sr == 0 and sc == 0:
                s_corner = f_corner
            elif sr == 0:
                s_corner = f_above[..., ox - 1]
            elif sc == 0:
                s_corner = f_left[..., oy - 1]
            else:
                s_corner = loc[:, oy - 1, ox - 1]
            s_above = jnp.where(s_ha[:, None], s_above_real,
                                jnp.where(s_hl[:, None],
                                          s_left_real[..., 0:1], base - 1))
            s_left = jnp.where(s_hl[:, None], s_left_real,
                               jnp.where(s_ha[:, None],
                                         s_above_real[..., 0:1], base + 1))
            s_corner = jnp.where(s_ha & s_hl, s_corner,
                                 jnp.where(s_ha, s_above_real[..., 0],
                                           jnp.where(s_hl,
                                                     s_left_real[..., 0],
                                                     base)))
            extras = []
            for e in range(n_extra):
                pred = fb(extra_sub[:, e][:, rs, cs, z])
                rate = extra_rate_sub[:, e][:, rs, cs, z].reshape(-1)
                ok = extra_ok_sub[:, e][:, rs, cs, z].reshape(-1)
                extras.append((pred, rate, ok))
            f_iok_sub = intra_ok_sub[:, rs, cs, z].reshape(-1)
            cost, mi, lev, recb, stx = eval_set(
                s_src, s_above, s_left, s_corner, s_ha, s_hl, cands_sub,
                rate_sub, hs, tx_sub, txb_sub, f_iok_sub, extras,
                f_lam=f_lam)
            sub_cost = sub_cost + cost
            sub_mi.append(mi)
            sub_lev.append(lev)
            sub_tx.append(stx)
            loc = loc.at[:, oy:oy + hs, ox:ox + hs].set(recb)

        # ---- choose ----------------------------------------------------
        cost_none = best_top[0] + lam * f_lam * bits_none
        cost_split = sub_cost + lam * f_lam * bits_split
        fp = force_part[:, rs, cs].reshape(-1)
        split = jnp.where(fp < 0, cost_split < cost_none, fp == 1)
        cost_tree = jnp.minimum(cost_none, cost_split)
        rec_final = jnp.where(split[:, None, None], loc, best_top[3])

        rec_d = rec_final.reshape(B, D, bs, bs)
        rs_eff = jnp.where(valid, rs, bh)
        y_eff = jnp.where(valid, y, h + bs)
        rowbuf = rowbuf.at[:, rs_eff[:, None],
                           x[:, None] + arb[None, :]].set(
            rec_d[:, :, -1, :], mode="drop")
        colbuf = colbuf.at[:, y_eff[:, None] + arb[None, :],
                           cs[:, None]].set(
            rec_d[:, :, :, -1], mode="drop")
        return (rowbuf, colbuf), (split.astype(jnp.int32).reshape(B, D),
                       best_top[1].reshape(B, D),
                       best_top[2].reshape(B, D, bs, bs),
                       jnp.stack(sub_mi, -1).reshape(B, D, 4),
                       jnp.stack(sub_lev, -3).reshape(B, D, 4, hs, hs),
                       jnp.stack(sub_tx, -1).reshape(B, D, 4)), \
            cost_tree.reshape(B, D), rec_d

    # ---- superblock (2bs x 2bs) NONE evaluation ------------------------
    # Single whole-SB transform block (TX_64X64 codes only its low 32x32
    # band — spec §7.13.3 adjusted tx size); intra prediction from SB
    # edges with the z-order availability of a full-SB block (above-right
    # SB is on an earlier 2:1 diagonal, below-left never available).
    nC = 32 if bs2 == 64 else bs2          # coded coefficient area
    ar_sb = jnp.arange(bs2)
    cands_sbl = expand_candidates(modes_sbl or modes_top, angle_deltas)
    txb_sb = 0.0 if kf else 1.0

    def txq_sb(pred, f_src):
        resid = f_src - pred
        coeff = fwd_txfm2d(resid, tx_sb, DCT_DCT, bd)
        if bs2 == 64:
            coeff = coeff.at[..., nC:, :].set(0)
            coeff = coeff.at[..., :, nC:].set(0)
        lev = quantize_dq_opt(coeff, tx_sb, dqdc, dqac, lam, bd)
        dq = dequantize_dq(lev, tx_sb, dqdc, dqac, bd)
        recb = add_residual_clip(pred, inv_txfm2d(dq, tx_sb, DCT_DCT, bd),
                                 bd)
        sse = jnp.sum((f_src - recb) ** 2, axis=(-1, -2)).astype(jnp.float32)
        lev_c = lev[..., :nC, :nC]
        rb = _resid_bits(lev_c, 32)
        nnz = jnp.sum(lev_c != 0, axis=(-1, -2))
        rb = rb + jnp.where(nnz > 0, txb_sb, 0.0)
        return lev_c, recb, sse, rb

    def eval_sb(carry, sbr, sbc):
        """sbr/sbc [D] → (cost [B*D], mi [B*D], lev [B*D,nC,nC],
        rec [B*D,bs2,bs2]).  Edges come from the boundary buffers: the
        SB's above row is the bottom row of block-row 2*sbr-1, its left
        col is the right col of block-col 2*sbc-1."""
        rowbuf, colbuf = carry
        y = sbr * bs2
        x = sbc * bs2
        ha = (sbr > 0)[None, :, None]
        hl = (sbc > 0)[None, :, None]
        rm1 = jnp.maximum(2 * sbr - 1, 0)
        cm1 = jnp.maximum(2 * sbc - 1, 0)
        arb2 = jnp.arange(bs2)
        above_real = rowbuf[:, rm1[:, None], x[:, None] + arb2[None, :]]
        lrows = jnp.minimum(y[:, None] + arb2[None, :], vh - 1)
        left_real = colbuf[:, lrows, cm1[:, None]]
        corner_real = rowbuf[:, rm1, jnp.maximum(x - 1, 0)]
        above = jnp.where(ha, above_real,
                          jnp.where(hl, left_real[..., 0:1], base - 1))
        left = jnp.where(hl, left_real,
                         jnp.where(ha, above_real[..., 0:1], base + 1))
        ha1, hl1 = ha[..., 0], hl[..., 0]
        corner = jnp.where(ha1 & hl1, corner_real,
                           jnp.where(ha1, above_real[..., 0],
                                     jnp.where(hl1, left_real[..., 0],
                                               base)))
        htr = (ha1 & ((sbc + 1 < sw)[None, :]))[..., None]
        tr_real = rowbuf[:, rm1[:, None],
                         jnp.minimum(x + bs2, w - bs2)[:, None] +
                         arb2[None, :]]
        above_ext = jnp.concatenate(
            [above, jnp.where(htr, tr_real, above[..., -1:])], axis=-1)
        left_ext = jnp.concatenate(
            [left, left[..., -1:].repeat(bs2, -1)], axis=-1)

        blocks = src_sb[:, sbr, sbc]
        fb = lambda t: t.reshape((B * D,) + t.shape[2:])
        f_src = fb(blocks)
        f_above, f_left, f_corner = map(fb, (above, left, corner))
        f_above_ext, f_left_ext = map(fb, (above_ext, left_ext))
        f_ha = jnp.broadcast_to(ha1, (B, D)).reshape(-1)
        f_hl = jnp.broadcast_to(hl1, (B, D)).reshape(-1)
        f_iok = intra_ok_sb[:, sbr, sbc].reshape(-1)
        f_lam_sb = lam_map[:, 2 * sbr, 2 * sbc].reshape(-1)

        preds_b, rates_b, oks_b = [], [], []
        for mi, (mode, delta) in enumerate(cands_sbl):
            preds_b.append(intra_pred(mode, delta, f_above, f_left,
                                      f_corner, f_ha, f_hl, bs2,
                                      f_above_ext, f_left_ext))
            rates_b.append(rate_sb[mi])
            oks_b.append(f_iok)
        for e in range(n_extra):
            preds_b.append(fb(extra_sb[:, e][:, sbr, sbc]))
            rates_b.append(extra_rate_sb[:, e][:, sbr, sbc].reshape(-1))
            oks_b.append(extra_ok_sb[:, e][:, sbr, sbc].reshape(-1))
        best = stack_eval(preds_b, rates_b, oks_b, f_src, tx_sb, bs2,
                          txb_sb, lambda p, s, tt: txq_sb(p, s),
                          f_lam=f_lam_sb)
        return best[0], best[1], best[2], best[3]

    def step(carry, xs):
        rs, cs, valid, has_tr, has_bl = xs
        if sb_search:
            sbr, sbc = rs[0] // 2, cs[0] // 2
            sb_cost, sb_mi, sb_lev, sb_rec = eval_sb(carry, sbr, sbc)
        outs = []
        recs = []
        cost_tot = 0.0
        for z in range(4):
            carry, o, cz, rz = sub_step(carry, rs[z], cs[z], valid[z],
                                        has_tr[z], has_bl[z])
            outs.append(o)
            recs.append(rz)
            cost_tot = cost_tot + cz
        main = tuple(jnp.stack([o[k] for o in outs], 1) for k in range(6))
        # assemble the quad's 2bs x 2bs recon from the four z blocks
        quad = jnp.concatenate(
            [jnp.concatenate([recs[0], recs[1]], -1),
             jnp.concatenate([recs[2], recs[3]], -1)], -2)
        if not sb_search:
            return carry, main + (quad,)
        lam_sb = lam * lam_map[:, rs[0], cs[0]]
        cost_none = sb_cost.reshape(B, D) + lam_sb * bits_none_sb
        cost_split = cost_tot + lam_sb * bits_split_sb
        fsb = force_sb[:, sbr, sbc]
        use_sb = jnp.where(fsb < 0, cost_none < cost_split, fsb == 0)
        rec_fin = jnp.where(use_sb[..., None, None],
                            sb_rec.reshape(B, D, bs2, bs2), quad)
        # boundary buffers must reflect the CHOSEN content (the SB-NONE
        # recon replaces the quad tree's rows/cols when it wins)
        rowbuf, colbuf = carry
        rs_eff0 = jnp.where(valid[0], 2 * sbr, bh)
        rs_eff1 = jnp.where(valid[0], 2 * sbr + 1, bh)
        x = sbc * bs2
        y = sbr * bs2
        arb2 = jnp.arange(bs2)
        cols2 = x[:, None] + arb2[None, :]
        rowbuf = rowbuf.at[:, rs_eff0[:, None], cols2].set(
            rec_fin[:, :, bs - 1, :], mode="drop")
        rowbuf = rowbuf.at[:, rs_eff1[:, None], cols2].set(
            rec_fin[:, :, bs2 - 1, :], mode="drop")
        y_eff = jnp.where(valid[0], y, h + bs2)
        rows2 = y_eff[:, None] + arb2[None, :]
        colbuf = colbuf.at[:, rows2, (2 * sbc)[:, None]].set(
            rec_fin[:, :, :, bs - 1], mode="drop")
        colbuf = colbuf.at[:, rows2, (2 * sbc + 1)[:, None]].set(
            rec_fin[:, :, :, bs2 - 1], mode="drop")
        sb_out = ((~use_sb).astype(jnp.int32),
                  sb_mi.reshape(B, D),
                  sb_lev.reshape(B, D, nC, nC))
        return (rowbuf, colbuf), main + (rec_fin,) + sb_out

    carry0 = (jnp.zeros((B, bh, w), jnp.int32),
              jnp.zeros((B, h, bw), jnp.int32))
    _, ys = jax.lax.scan(
        step, carry0, (jnp.asarray(rs_t), jnp.asarray(cs_t),
                       jnp.asarray(valid_t), jnp.asarray(has_tr_t),
                       jnp.asarray(has_bl_t)))
    part_d, mi_d, lev_d, smi_d, slev_d, stx_d, rec_q = ys[:7]
    # recon assembles from the per-step 2bs x 2bs quad outputs
    sb_flat_q = (rs_t[:, 0, :] // 2) * sw + (cs_t[:, 0, :] // 2)
    sb_idx_q = jnp.asarray(np.where(valid_t[:, 0, :], sb_flat_q, sh * sw))
    rec_all = jnp.zeros((B, sh * sw, bs2, bs2), jnp.int32)
    rec_all = rec_all.at[:, sb_idx_q].set(
        jnp.moveaxis(rec_q, 1, 0), mode="drop")
    recon = rec_all.reshape(B, sh, sw, bs2, bs2).transpose(
        0, 1, 3, 2, 4).reshape(B, h, w)

    flat_idx = rs_t * bw + cs_t
    idx = jnp.asarray(np.where(valid_t, flat_idx, bh * bw))

    def undiag(d, extra_shape):
        out = jnp.zeros((B, bh * bw) + extra_shape,
                        d.dtype)
        out = out.at[:, idx].set(jnp.moveaxis(d, 1, 0), mode="drop")
        return out.reshape((B, bh, bw) + extra_shape)

    outs = (undiag(part_d, ()), undiag(mi_d, ()),
            undiag(lev_d, (bs, bs)), undiag(smi_d, (4,)),
            undiag(slev_d, (4, hs, hs)), undiag(stx_d, (4,)), recon)
    if not sb_search:
        return outs

    sb_flat = (rs_t[:, 0, :] // 2) * sw + (cs_t[:, 0, :] // 2)
    sb_idx = jnp.asarray(np.where(valid_t[:, 0, :], sb_flat, sh * sw))

    def undiag_sb(d, extra_shape):
        out = jnp.zeros((B, sh * sw) + extra_shape, d.dtype)
        out = out.at[:, sb_idx].set(jnp.moveaxis(d, 1, 0), mode="drop")
        return out.reshape((B, sh, sw) + extra_shape)

    return outs + (undiag_sb(ys[7], ()), undiag_sb(ys[8], ()),
                   undiag_sb(ys[9], (nC, nC)))

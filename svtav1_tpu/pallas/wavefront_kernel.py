"""Pallas TPU kernel for the flat intra wavefront.

One `pallas_call` runs the WHOLE anti-diagonal schedule: the grid is the
folded z-order step sequence and the coding-order boundary state (bottom
rows / right cols of completed blocks) lives in VMEM scratch for the
entire plane — no HBM round trips between scan steps, which is what
bounded the XLA `lax.scan` wavefront (encoder/wavefront.py; the carry
gather/scatter dominated real device time).

Per grid step the kernel:
  1. assembles the AV1 §7.11.2 edge vectors for the D wavefront lanes
     from the VMEM boundary buffers (bottom-edge clamp at valid_h);
  2. predicts every candidate: the linear modes (V/H/directional/smooth)
     come from ONE [lanes, E] @ [E, n*n] MXU matmul per candidate
     (ops/intra_lin.py — exact in bf16xbf16->f32), DC and PAETH are
     computed directly;
  3. runs the full normative fwd-txfm -> quantize -> dequant -> inv-txfm
     -> reconstruct chain per candidate in VMEM (int32, the same
     butterfly stage tables as ops/transforms.py, bit-exact);
  4. RD-selects (first-minimum over the candidate order, matching the
     XLA wavefront) and writes the winner's levels/recon + the boundary
     buffers.

Matches encode_plane_wavefront (same candidate decisions, levels, recon)
up to float-reduction tie-breaks in the RD cost; streams are verified
dav1d-conformant either way.  Replaces the role of the reference's SIMD
EncDec kernels (SURVEY.md §2.8; EbEncDecProcess.c:3266 wavefront).
8-bit only; the XLA wavefront remains the general/10-bit path.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import intra
from ..ops.intra_lin import build_w
from ..spec import txfm as T
from ..spec import tables as tbl
from ..encoder.wavefront import _quad_tables, expand_candidates

# candidate classes
CLS_LIN, CLS_DC, CLS_PAETH = 0, 1, 2

# compile-bisection probe (SVT_PALLAS_PROBE=1..4): 1 = edges+boundary
# only, 2 = +DC pred/select (no txfm), 3 = +matmul preds, 4/0 = full
import os as _os
_PROBE = int(_os.environ.get("SVT_PALLAS_PROBE", "0"))


def _cls(mode: int) -> int:
    if mode == intra.DC_PRED:
        return CLS_DC
    if mode == intra.PAETH_PRED:
        return CLS_PAETH
    return CLS_LIN


# ------------------------------------------------------------------ #
# in-kernel 1D transform over the MIDDLE axis of [R, n, n] int32
# ------------------------------------------------------------------ #


def _term(w: int, v):
    if w == 0:
        return None
    if w == 1:
        return v
    if w == -1:
        return -v
    return w * v


def _apply_network_mid(x, stages, cos_bit: int, clamp_bit: int):
    """Stage weights/indices/modes are STATIC (python scalars per row) —
    pallas kernels may not capture constant arrays, and ±1/0 weights
    specialize away entirely."""
    half = 1 << (cos_bit - 1)
    n = x.shape[1]
    for ia, wa, ib, wb, mode in stages:
        rows = []
        for j in range(n):
            ta = _term(int(wa[j]), x[:, int(ia[j]):int(ia[j]) + 1, :])
            tb = _term(int(wb[j]), x[:, int(ib[j]):int(ib[j]) + 1, :])
            lin = tb if ta is None else (ta if tb is None else ta + tb)
            m = int(mode[j])
            if m == T.MODE_BTF:
                out = (lin + half) >> cos_bit
            elif m == T.MODE_ADD_CLAMP and clamp_bit:
                lim = 1 << (clamp_bit - 1)
                out = jnp.clip(lin, -lim, lim - 1)
            else:
                out = lin
            rows.append(out)
        x = jnp.concatenate(rows, axis=1)
    return x


def _round_shift_signed(x, shift: int):
    if shift == 0:
        return x
    if shift > 0:
        return (x + (1 << (shift - 1))) >> shift
    return x << (-shift)


def _clamp_bits(x, bit: int):
    return jnp.clip(x, -(1 << (bit - 1)), (1 << (bit - 1)) - 1)


def _fwd2d(x, n: int, row_kind: int, col_kind: int, bd: int):
    """Forward 2D transform of [R, n, n] residual (square, no flips)."""
    shift = T.FWD_SHIFT[(n, n)]
    wi = int(np.log2(n)) - 2
    cos_col = T.FWD_COS_BIT_COL[wi][wi]
    cos_row = T.FWD_COS_BIT_ROW[wi][wi]
    x = _round_shift_signed(x, -shift[0])
    x = _apply_network_mid(x, _stages(col_kind, n, "fwd", cos_col),
                           cos_col, 0)
    x = _round_shift_signed(x, -shift[1])
    x = jnp.swapaxes(x, -1, -2)
    x = _apply_network_mid(x, _stages(row_kind, n, "fwd", cos_row),
                           cos_row, 0)
    x = jnp.swapaxes(x, -1, -2)
    x = _round_shift_signed(x, -shift[2])
    return x


def _inv2d(x, n: int, row_kind: int, col_kind: int, bd: int):
    """Inverse 2D transform of [R, n, n] coeffs (square, no flips)."""
    shift = T.INV_SHIFT[(n, n)]
    cb = T.INV_COS_BIT
    x = _clamp_bits(x, bd + 8)
    # row pass operates width-wise (last axis)
    x = jnp.swapaxes(x, -1, -2)
    x = _apply_network_mid(x, _stages(row_kind, n, "inv", cb), cb,
                           T.opt_range(bd, False))
    x = jnp.swapaxes(x, -1, -2)
    x = _round_shift_signed(x, -shift[0])
    x = _clamp_bits(x, max(bd + 6, 16))
    x = _apply_network_mid(x, _stages(col_kind, n, "inv", cb), cb,
                           T.opt_range(bd, True))
    x = _round_shift_signed(x, -shift[1])
    return x


@lru_cache(maxsize=None)
def _stages(kind: int, n: int, direction: str, cos_bit: int):
    name = {T.DCT_1D: "dct", T.ADST_1D: "adst"}[kind]
    return T.compiled_stages(name, n, direction, cos_bit)


def _tx_kinds(tx_type: int):
    rk, ck = T.HTX_TAB[tx_type], T.VTX_TAB[tx_type]
    if rk not in (T.DCT_1D, T.ADST_1D) or ck not in (T.DCT_1D, T.ADST_1D):
        raise NotImplementedError(f"tx type {tx_type} in pallas wavefront")
    return rk, ck


def _exact_div(x, d, rcp):
    """floor(x / d) for x,d >= 1 int32 via f32 reciprocal + correction.
    The f32 estimate is within a few ulps; two correction rounds make
    the result exact over the coefficient range."""
    q = jnp.floor(x.astype(jnp.float32) * rcp).astype(jnp.int32)
    for _ in range(2):
        q = jnp.where(q * d > x, q - 1, q)
        q = jnp.where((q + 1) * d <= x, q + 1, q)
    return jnp.maximum(q, 0)


# ------------------------------------------------------------------ #
# the kernel
# ------------------------------------------------------------------ #


def _make_kernel(*, B, Dp, bs, bh, bw, h, w, vh, n_cand, cands, tx_size,
                 cand_kinds, bd, paired):
    """cand_kinds[ci] = (row_kind, col_kind) 1D transform pair."""
    dc_idx = next((i for i, (m, _d) in enumerate(cands)
                   if m == intra.DC_PRED), -1)
    paeth_idx = next((i for i, (m, _d) in enumerate(cands)
                      if m == intra.PAETH_PRED), -1)
    group_kinds = []
    for kk in cand_kinds:
        if kk not in group_kinds:
            group_kinds.append(kk)
    nn = bs * bs
    # edge layout (ops/intra_lin.py): above_ext 0..2bs-1, left_ext
    # 2bs..4bs-1, then zero pad to K0, corner at K0, ha/hl flags after.
    K0 = 128                        # 128-aligned edge block
    assert 4 * bs <= K0
    CNR = K0
    Ep = K0 + 8
    KM = K0 + 8                     # matmul K incl. corner row (flags 0)
    R = Dp * B
    LB = B * bs                     # boundary-buffer lane count
    LBp = ((LB + 127) // 128) * 128
    shift_q = tbl.tx_scale_shift(tx_size)
    lim_res = (1 << (7 + bd)) - 1 + (914 << (bd - 7))
    pmax = (1 << bd) - 1
    base = 1 << (bd - 1)
    rv = (vh - 1) // bs             # block row holding the last valid row
    vm = (vh - 1) % bs

    def kernel(sched_ref, qi_ref, qf_ref, gid_ref, gl_ref, src_ref, w_ref,
               wlo_ref, mi_ref, lev_ref, rec_ref,
               rowbuf, colbuf, edges_ref, bc_ref, bi_ref, blev_ref,
               brec_ref, pred_ref, levs_ref, recs_ref):
        # Grid = (steps, candidates): the program holds ONE txfm chain
        # (an unrolled 13-candidate body blew Mosaic's compile budget);
        # ci sweeps candidates, scratch carries the running best.
        # rowbuf [bh*bw, LBp]: row r*bw+c lane b*bs+j = bottom-row pixel
        # j of block (r, c) frame b; colbuf row c*bh+r = right cols.
        # Dynamic indexing stays on SUBLANE dims; dynamic lane offsets
        # are 128-aligned (Mosaic requirements).
        i = pl.program_id(0)
        ci = pl.program_id(1)

        @pl.when((i == 0) & (ci == 0))
        def _init():
            rowbuf[...] = jnp.zeros((bh * bw, LBp), jnp.int32)
            colbuf[...] = jnp.zeros((bh * bw, LBp), jnp.int32)

        dqdc = qi_ref[0, 0]
        dqac = qi_ref[0, 1]
        lam = qf_ref[0, 0]
        rcp_dc = qf_ref[0, 1]
        rcp_ac = qf_ref[0, 2]

        ar = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)

        # ---- 1. edge assembly into edges_ref [R, Ep] (f32), at ci==0
        @pl.when(ci == 0)
        def _edges():
            for l in range(Dp):
                r = sched_ref[0, l, 0]
                c = sched_ref[0, l, 1]
                has_tr = sched_ref[0, l, 3]
                has_bl = sched_ref[0, l, 4]
                y = r * bs
                rm1 = jnp.maximum(r - 1, 0)
                cm1 = jnp.maximum(c - 1, 0)
                ha = r > 0
                hl = c > 0

                arow = rowbuf[pl.ds(rm1 * bw + c, 1), :]       # [1, LBp]
                lrow = colbuf[pl.ds(cm1 * bh + r, 1), :]
                crow = rowbuf[pl.ds(rm1 * bw + cm1, 1), :]
                trow = rowbuf[pl.ds(rm1 * bw +
                                    jnp.minimum(c + 1, bw - 1), 1), :]
                b0 = jnp.minimum(r + 1, bh - 1)
                brow = colbuf[pl.ds(cm1 * bh + b0, 1), :]
                vrow = colbuf[pl.ds(cm1 * bh + rv, 1), :]
                lmask = y + ar <= vh - 1                       # [1, bs]
                bmask = b0 * bs + ar <= vh - 1
                for b in range(B):
                    sl = lambda row2: row2[:, b * bs:(b + 1) * bs]
                    above_real = sl(arow)                      # [1, bs]
                    vend = vrow[:, b * bs + vm:b * bs + vm + 1]
                    left_real = jnp.where(lmask, sl(lrow), vend)
                    corner_real = crow[:, b * bs + bs - 1:b * bs + bs]
                    tr_real = sl(trow)
                    bl_real = jnp.where(bmask, sl(brow), vend)

                    above = jnp.where(ha, above_real,
                                      jnp.where(hl, left_real[:, 0:1],
                                                base - 1))
                    left = jnp.where(hl, left_real,
                                     jnp.where(ha, above_real[:, 0:1],
                                               base + 1))
                    corner = jnp.where(
                        ha & hl, corner_real,
                        jnp.where(ha, above_real[:, 0:1],
                                  jnp.where(hl, left_real[:, 0:1], base)))
                    tr = jnp.where(has_tr > 0, tr_real,
                                   above[:, bs - 1:bs])
                    bl = jnp.where(has_bl > 0, bl_real,
                                   left[:, bs - 1:bs])
                    haf = jnp.where(ha, 1, 0)[None, None]
                    hlf = jnp.where(hl, 1, 0)[None, None]
                    pieces = [above, tr, left, bl]
                    if K0 > 4 * bs:
                        pieces.append(jnp.zeros((1, K0 - 4 * bs),
                                                jnp.int32))
                    pieces += [corner, haf, hlf,
                               jnp.zeros((1, Ep - K0 - 3), jnp.int32)]
                    row = jnp.concatenate(pieces, axis=1)
                    edges_ref[l * B + b:l * B + b + 1, :] = \
                        row.astype(jnp.float32)
            bc_ref[...] = jnp.full((R, 1), 3e38, jnp.float32)
            bi_ref[...] = jnp.full((R, 1), 10000, jnp.int32)

        edges = edges_ref[...]
        above_all = edges[:, 0:bs]
        left_all = edges[:, 2 * bs:3 * bs]
        corner_all = edges[:, CNR:CNR + 1]
        ha_ = edges[:, CNR + 1:CNR + 2] > 0
        hl_ = edges[:, CNR + 2:CNR + 3] > 0
        src3 = src_ref[0].reshape(R, bs, bs).astype(jnp.int32)

        def stack_rows(rows):
            return jnp.stack(rows, axis=1)                 # [R, bs, bs]

        # ---- 2. prediction for candidate ci -> pred_ref -------------
        @pl.when(ci == dc_idx)
        def _pred_dc():
            sa = jnp.sum(above_all, axis=1, keepdims=True)
            sl_ = jnp.sum(left_all, axis=1, keepdims=True)
            both = jnp.floor((sa + sl_ + bs) * (1.0 / (2 * bs)))
            onlya = jnp.floor((sa + bs // 2) * (1.0 / bs))
            onlyl = jnp.floor((sl_ + bs // 2) * (1.0 / bs))
            dc = jnp.where(ha_ & hl_, both,
                           jnp.where(ha_, onlya,
                                     jnp.where(hl_, onlyl, float(base))))
            dc2 = jnp.broadcast_to(dc.astype(jnp.int32), (R, bs))
            pred_ref[...] = stack_rows([dc2] * bs)

        @pl.when(ci == paeth_idx)
        def _pred_paeth():
            ai = above_all.astype(jnp.int32)
            li = left_all.astype(jnp.int32)
            t3 = stack_rows([ai] * bs)
            l3 = stack_rows([jnp.broadcast_to(li[:, k:k + 1], (R, bs))
                             for k in range(bs)])
            tl3 = stack_rows(
                [jnp.broadcast_to(corner_all.astype(jnp.int32),
                                  (R, bs))] * bs)
            bse = t3 + l3 - tl3
            pt = jnp.abs(bse - t3)
            plf = jnp.abs(bse - l3)
            ptl = jnp.abs(bse - tl3)
            pred_ref[...] = jnp.where((plf <= pt) & (plf <= ptl), l3,
                                      jnp.where(pt <= ptl, t3, tl3))

        @pl.when((ci != dc_idx) & (ci != paeth_idx))
        def _pred_lin():
            # K covers above_ext/left_ext AND the corner (row 128);
            # flag/pad rows have zero weights
            ebf = edges[:, :KM].astype(jnp.bfloat16)
            whi = w_ref[...]              # per-candidate slice (BlockSpec)
            wlo = wlo_ref[...]
            addv = qf_ref[0, 4 + ci]
            sclv = qf_ref[0, 4 + n_cand + ci]
            dn = (((1,), (0,)), ((), ()))
            rows = []
            for k in range(bs):
                acc = 2.0 * jax.lax.dot_general(
                    ebf, whi[:, k * bs:(k + 1) * bs], dn,
                    preferred_element_type=jnp.float32) + \
                    jax.lax.dot_general(
                        ebf, wlo[:, k * bs:(k + 1) * bs], dn,
                        preferred_element_type=jnp.float32)
                pk = jnp.floor((acc + addv) * sclv)
                rows.append(jnp.clip(pk.astype(jnp.int32), 0, pmax))
            pred_ref[...] = stack_rows(rows)

        # ---- 3. normative chain (per distinct tx-kind group) --------
        ii = jax.lax.broadcasted_iota(jnp.int32, (1, bs, bs), 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, bs, bs), 2)
        pos00 = (ii == 0) & (jj == 0)
        dqv = jnp.where(pos00, dqdc, dqac)
        rcp = jnp.where(pos00, rcp_dc, rcp_ac)
        gid = gid_ref[0, ci]

        for g, (rk, ck) in enumerate(group_kinds):
            @pl.when(gid == g)
            def _chain(rk=rk, ck=ck):
                pred3 = pred_ref[...]
                resid = src3 - pred3
                cf = _fwd2d(resid, bs, rk, ck, bd)
                scaled = jnp.abs(cf) << shift_q
                rounding = (dqv * 48) >> 7
                lv = _exact_div(scaled + rounding, dqv, rcp)
                lv = jnp.minimum(lv, (1 << 15) - 1)
                levs_ref[...] = jnp.where(cf < 0, -lv, lv)
                dq = ((lv * dqv) & 0xFFFFFF) >> shift_q
                dq = jnp.where(cf < 0, -dq, dq)
                dq = jnp.clip(dq, -(1 << (bd + 7)), (1 << (bd + 7)) - 1)
                inv = _inv2d(dq, bs, rk, ck, bd)
                res = jnp.clip(inv, -lim_res - 1, lim_res)
                recs_ref[...] = jnp.clip(pred3 + res, 0, pmax)

        # ---- 4. RD cost + running first-minimum select --------------
        lev = levs_ref[...]
        rec = recs_ref[...]
        d = src3 - rec
        sse = jnp.sum(jnp.sum(d * d, axis=1), axis=1, keepdims=True)
        nz = (lev != 0).astype(jnp.int32)
        nnz = jnp.sum(jnp.sum(nz, axis=1), axis=1,
                      keepdims=True).astype(jnp.float32)
        lb = jnp.log2(1.0 + jnp.abs(lev).astype(jnp.float32))
        lbits = jnp.sum(jnp.sum(lb, axis=1), axis=1, keepdims=True)
        if bs >= 32:
            est = 25.7 + 2.43 * nnz + 1.83 * lbits
        else:
            est = 16.2 + 2.47 * nnz + 1.58 * lbits
        rbits = jnp.where(nnz > 0, est, 1.0)
        mrate = qf_ref[0, 4 + 2 * n_cand + ci]
        cost = sse.astype(jnp.float32) + lam * (mrate + rbits)
        if paired:
            prows = []
            for l in range(Dp):
                cu = cost[l * B:l * B + B // 2]
                cv = cost[l * B + B // 2:(l + 1) * B]
                pair = cu + cv
                prows += [pair, pair]
            cost = jnp.concatenate(prows, axis=0)
        prev_c = bc_ref[...]
        prev_i = bi_ref[...]
        better = (cost < prev_c) | ((cost == prev_c) & (ci < prev_i))
        bc_ref[...] = jnp.where(better, cost, prev_c)
        bi_ref[...] = jnp.where(better, ci, prev_i)
        # bool vregs cannot be stacked (invalid i1->i32 vreg cast):
        # carry the mask as int32 and compare back
        b2 = jnp.broadcast_to(better.astype(jnp.int32), (R, bs))
        b3 = stack_rows([b2] * bs) > 0
        blev_ref[...] = jnp.where(b3, lev, blev_ref[...])
        brec_ref[...] = jnp.where(b3, rec, brec_ref[...])

        # ---- 5. outputs + boundary update at the last candidate -----
        @pl.when(ci == n_cand - 1)
        def _finish():
            mi_ref[0] = bi_ref[...]
            lev_ref[0] = blev_ref[...].reshape(
                Dp, B, bs, bs).astype(jnp.int16)
            rec_ref[0] = brec_ref[...].reshape(
                Dp, B, bs, bs).astype(jnp.uint8)
            rec3 = brec_ref[...]
            bot = rec3[:, bs - 1, :]                       # [R, bs]
            recT = jnp.swapaxes(rec3, -1, -2)
            rcol = recT[:, bs - 1, :]                      # right column
            pad1 = ([jnp.zeros((1, LBp - LB), jnp.int32)]
                    if LBp > LB else [])
            for l in range(Dp):
                r = sched_ref[0, l, 0]
                c = sched_ref[0, l, 1]
                valid = sched_ref[0, l, 2]

                @pl.when(valid > 0)
                def _upd(l=l, r=r, c=c):
                    br = jnp.concatenate(
                        [bot[l * B + b:l * B + b + 1, :]
                         for b in range(B)] + pad1, axis=1)
                    rc = jnp.concatenate(
                        [rcol[l * B + b:l * B + b + 1, :]
                         for b in range(B)] + pad1, axis=1)
                    rowbuf[pl.ds(r * bw + c, 1), :] = br
                    colbuf[pl.ds(c * bh + r, 1), :] = rc

    return kernel


# ------------------------------------------------------------------ #
# host wrapper
# ------------------------------------------------------------------ #


@lru_cache(maxsize=None)
def _sched_tables(bh: int, bw: int):
    rs, cs, valid, htr, hbl = _quad_tables(bh, bw)
    S, _, D = rs.shape
    Dp = ((D + 1) // 2) * 2                 # even lane count
    fold = lambda a: a.reshape(-1, D)
    sched = np.zeros((S * 4, Dp, 8), np.int32)
    sched[:, :D, 0] = fold(rs)
    sched[:, :D, 1] = fold(cs)
    sched[:, :D, 2] = fold(valid)
    sched[:, :D, 3] = fold(htr)
    sched[:, :D, 4] = fold(hbl)
    return sched, Dp


def _groups_for(cands, tx_type: int, uv_tx: bool, tx_size: int):
    """[(row_kind, col_kind, [ci...])] grouped by 1D transform pair."""
    out = {}
    for ci, (m, _d) in enumerate(cands):
        tt = T.uv_intra_tx_type(m, tx_size) if uv_tx else tx_type
        out.setdefault(_tx_kinds(tt), []).append(ci)
    return tuple((rk, ck, tuple(g)) for (rk, ck), g in sorted(out.items()))


@partial(jax.jit,
         static_argnames=("bs", "tx_size", "modes", "bd", "angle_deltas",
                          "valid_h", "paired", "uv_tx", "interpret"))
def _wavefront_pl_impl(src, rd, bs: int, tx_size: int, modes: tuple,
                       bd: int = 8, angle_deltas: tuple = (0,),
                       valid_h: int = None, paired: bool = False,
                       uv_tx: bool = False, interpret: bool = False):
    dqdc, dqac, lam, mode_rate = rd
    B, h, w = src.shape
    vh = h if valid_h is None else valid_h
    bh, bw = h // bs, w // bs
    cands = expand_candidates(modes, angle_deltas)
    C = len(cands)
    nn = bs * bs
    K0 = 128
    Ep = K0 + 8

    sched_np, Dp = _sched_tables(bh, bw)
    S = sched_np.shape[0]
    R = Dp * B
    cand_kinds = tuple(
        _tx_kinds(T.uv_intra_tx_type(m, tx_size) if uv_tx else T.DCT_DCT)
        for m, _d in cands)

    Wm, addv, shiftv, linear = build_w(bs, cands)
    KM = K0 + 8
    W0 = np.zeros((KM, C * nn), np.float32)
    W0[:4 * bs] = Wm[:4 * bs]
    W0[K0] = Wm[4 * bs]                     # corner row at edge col 128
    W0i = W0.astype(np.int32)               # integer weights <= 511
    assert np.array_equal(W0i, W0) and W0i.max() < 512
    # split 2*hi + lo so each bf16 factor is an exact integer <= 255
    Whi = (W0i >> 1).astype(jnp.bfloat16)
    Wlo = (W0i & 1).astype(jnp.bfloat16)
    scalev = (1.0 / (1 << shiftv)).astype(np.float32)

    # per-step source blocks [S, Dp, B, bs, bs] int16
    src_b = src.astype(jnp.int16).reshape(B, bh, bs, bw, bs).transpose(
        0, 1, 3, 2, 4)
    rs_f = jnp.asarray(sched_np[:, :, 0])
    cs_f = jnp.asarray(sched_np[:, :, 1])
    srcsteps = src_b[:, rs_f, cs_f].transpose(1, 2, 0, 3, 4)

    qi = jnp.stack([dqdc, dqac, jnp.int32(0), jnp.int32(0)])[None, :]
    qf = jnp.concatenate([
        jnp.stack([lam, 1.0 / dqdc.astype(jnp.float32),
                   1.0 / dqac.astype(jnp.float32), jnp.float32(0)]),
        jnp.asarray(addv, jnp.float32), jnp.asarray(scalev),
        mode_rate.astype(jnp.float32)])[None, :]
    cp = jnp.asarray(np.array([_cls(m) for m, _ in cands],
                              np.int32))[None, :]
    gl_np = np.zeros((1, 1), np.int32)

    group_kinds = []
    for kk in cand_kinds:
        if kk not in group_kinds:
            group_kinds.append(kk)
    gid_np = np.array([group_kinds.index(kk) for kk in cand_kinds],
                      np.int32)[None, :]
    kernel = _make_kernel(B=B, Dp=Dp, bs=bs, bh=bh, bw=bw, h=h, w=w,
                          vh=vh, n_cand=C, cands=cands, tx_size=tx_size,
                          cand_kinds=cand_kinds, bd=bd, paired=paired)

    mi_d, lev_d, rec_d = pl.pallas_call(
        kernel,
        grid=(S, C),
        in_specs=[
            pl.BlockSpec((1, Dp, 8), lambda i, ci: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4 + 3 * C), lambda i, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda i, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Dp, B, bs, bs),
                         lambda i, ci: (i, 0, 0, 0, 0)),
            pl.BlockSpec((KM, nn), lambda i, ci: (0, ci)),
            pl.BlockSpec((KM, nn), lambda i, ci: (0, ci)),
        ],
        out_specs=[
            pl.BlockSpec((1, R, 1), lambda i, ci: (i, 0, 0)),
            pl.BlockSpec((1, Dp, B, bs, bs),
                         lambda i, ci: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, Dp, B, bs, bs),
                         lambda i, ci: (i, 0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, R, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, Dp, B, bs, bs), jnp.int16),
            jax.ShapeDtypeStruct((S, Dp, B, bs, bs), jnp.uint8),
        ],
        scratch_shapes=[
            pltpu.VMEM((bh * bw, ((B * bs + 127) // 128) * 128), jnp.int32),
            pltpu.VMEM((bh * bw, ((B * bs + 127) // 128) * 128), jnp.int32),
            pltpu.VMEM((R, Ep), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.int32),
            pltpu.VMEM((R, bs, bs), jnp.int32),
            pltpu.VMEM((R, bs, bs), jnp.int32),
            pltpu.VMEM((R, bs, bs), jnp.int32),
            pltpu.VMEM((R, bs, bs), jnp.int32),
            pltpu.VMEM((R, bs, bs), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(sched_np), qi, qf, jnp.asarray(gid_np),
      jnp.asarray(gl_np), srcsteps,
      jnp.asarray(Whi), jnp.asarray(Wlo))

    # un-diagonalize (same layout contract as _wavefront_body)
    flat_idx = sched_np[:, :, 0] * bw + sched_np[:, :, 1]
    valid_f = sched_np[:, :, 2] > 0
    idx = jnp.asarray(np.where(valid_f, flat_idx, bh * bw))
    mode_idx = jnp.zeros((B, bh * bw), jnp.int32)
    levels = jnp.zeros((B, bh * bw, bs, bs), jnp.int32)
    recon_b = jnp.zeros((B, bh * bw, bs, bs), jnp.int32)
    mi_b = jnp.moveaxis(mi_d.reshape(S, Dp, B), 2, 0)    # [B, S, Dp]
    lev_b = jnp.moveaxis(lev_d.astype(jnp.int32), 2, 0)
    rec_b = jnp.moveaxis(rec_d.astype(jnp.int32), 2, 0)
    mode_idx = mode_idx.at[:, idx].set(mi_b, mode="drop")
    levels = levels.at[:, idx].set(lev_b, mode="drop")
    recon_b = recon_b.at[:, idx].set(rec_b, mode="drop")
    recon = recon_b.reshape(B, bh, bw, bs, bs).transpose(
        0, 1, 3, 2, 4).reshape(B, h, w)
    return (mode_idx.reshape(B, bh, bw),
            levels.reshape(B, bh, bw, bs, bs), recon)


def encode_plane_wavefront_pl(src, bs: int, tx_size: int, qindex: int,
                              modes, bd: int = 8, angle_deltas=(0,),
                              valid_h: int = None, paired: bool = False,
                              kf=True, uv_tx: bool = False,
                              interpret: bool = False):
    """Drop-in for encoder.wavefront.encode_plane_wavefront (8-bit)."""
    from ..encoder.wavefront import rd_params
    cands = expand_candidates(modes, tuple(angle_deltas))
    rd = rd_params(qindex, bd, cands, kf=kf)
    return _wavefront_pl_impl(src, rd, bs, tx_size, tuple(modes), bd,
                              tuple(angle_deltas), valid_h, paired,
                              uv_tx, interpret)

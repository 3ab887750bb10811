"""Whole-plane intra mode-decision + reconstruction as ONE jitted scan.

The schedule is a 2:1 anti-diagonal wavefront over *quads* (2x2 blocks — the
SB grouping: 64x64 SB of 32x32 luma blocks, 32x32 chroma region of 16x16
blocks) with the four blocks of each quad coded z-order inside the step, so
the recon carry always contains every neighbor the AV1 coding order makes
available — including the above-right and below-left extended edges the
directional predictors read.  Dependency audit (quad (R,C) at step
d = 2R + C, blocks r = 2R+qr, c = 2C+qc):
  above (r-1,c):  same quad z-order, or quad (R-1,C) at d-2
  left  (r,c-1):  same quad z-order, or quad (R,C-1) at d-1
  above-right (r-1,c+1): z0→(R-1,C) d-2; z1→(R-1,C+1) d-1; z2→same-quad z1
  below-left  (r+1,c-1): only z0 has it → (R,C-1) z3 at d-1
This replaces the reference's EncDec segment wavefront
(EbEncDecProcess.c:3266); picture batch = the reference's picture
parallelism (SURVEY.md §2.9).  All candidate modes are evaluated with the
normative integer ops, so the selected levels/recon are bit-final.

Throughput note (round 4): every candidate — intra modes and precomputed
inter predictions — is STACKED into one [n_cand * lanes, bs, bs] tensor and
pushed through a single fwd-txfm/quant/recon chain per z-position, instead
of one unrolled chain per candidate.  The transform matmuls then fill the
MXU and the scan body stays small; selection is argmin over the candidate
axis (first-minimum = the old loop's tie-break).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import intra
from ..ops.intra_dir import dr_pred
from ..ops.quant import dequantize_dq, quantize_dq
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


def _quad_tables(bh: int, bw: int):
    """Static schedule tables [nsteps, 4, D]: block coords + availability
    for the quad z-order wavefront.  Availability matches the decoder's
    z-order rules (has_tr/has_bl as in EbIntraPrediction.c:712 semantics)."""
    assert bh % 2 == 0 and bw % 2 == 0, "plane must be a whole number of SBs"
    QH, QW = bh // 2, bw // 2
    nsteps = 2 * (QH - 1) + (QW - 1) + 1
    D = 0
    steps = []
    for d in range(nsteps):
        Rs = [R for R in range(QH) if 0 <= d - 2 * R < QW]
        steps.append(Rs)
        D = max(D, len(Rs))
    rs = np.zeros((nsteps, 4, D), np.int32)
    cs = np.zeros((nsteps, 4, D), np.int32)
    valid = np.zeros((nsteps, 4, D), bool)
    has_tr = np.zeros((nsteps, 4, D), bool)
    has_bl = np.zeros((nsteps, 4, D), bool)
    for d, Rs in enumerate(steps):
        for z, (qr, qc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            for i, R in enumerate(Rs):
                C = d - 2 * R
                r, c = 2 * R + qr, 2 * C + qc
                rs[d, z, i] = r
                cs[d, z, i] = c
                valid[d, z, i] = True
                if qr == 0:
                    has_tr[d, z, i] = (r > 0) and (c + 1 < bw)
                else:
                    has_tr[d, z, i] = (qc == 0) and (c + 1 < bw)
                has_bl[d, z, i] = (qr == 0 and qc == 0 and c > 0 and
                                   r + 1 < bh)
    return rs, cs, valid, has_tr, has_bl


def _lambda(qindex: int) -> float:
    """RD lambda (bits ↔ SSE).  Base constant calibrated by a rate sweep
    against the real tile coder (λ-scale sweep on synthetic content:
    0.25x the round-1 value is BD-rate-neutral-to-better at low q and
    clearly better at high q)."""
    import os
    _, ac = tbl.qindex_to_dq(qindex, 8)
    scale = float(os.environ.get("SVT_TPU_LAMBDA_SCALE", "1.0"))
    return scale * 0.00875 * float(ac) * float(ac) / 16.0


def _cdf_bits(table, sym: int) -> float:
    """-log2 P(sym) from a default [icdf..., counter] table slice."""
    hi = 32768 if sym == 0 else int(table[sym - 1])
    lo = int(table[sym])
    p = max(hi - lo, 1) / 32768.0
    return -np.log2(p)


def intra_mode_rate_table(cands, qindex: int, kf: bool = True) -> np.ndarray:
    """Per-candidate mode-signaling bits from the default CDFs (context
    (0,0) / size-group 3) + angle-delta bits — the CDF-derived rate the
    reference's MD uses (EbMdRateEstimation.c) instead of a constant."""
    from ..spec.cdf import CdfContext
    cdf = CdfContext(qindex)
    out = np.zeros(len(cands), np.float32)
    for i, (mode, delta) in enumerate(cands):
        if kf == "uv":
            # uv_mode CDF (cfl_allowed ctx, y_mode=DC column): the paired
            # chroma wavefront's signaling cost (EbMdRateEstimation.c
            # intra_uv_mode_fac_bits)
            bits = _cdf_bits(cdf.uv_mode_cdf[1][0], mode)
        elif kf:
            bits = _cdf_bits(cdf.kf_y_cdf[0][0], mode)
        else:
            bits = _cdf_bits(cdf.y_mode_cdf[3], mode)
        if 1 <= mode <= 8:
            bits += _cdf_bits(cdf.angle_delta_cdf[mode - 1], delta + 3)
        out[i] = bits
    return out


def _resid_bits(lev, bs: int):
    """Residual-bit estimate calibrated against the real tile coder
    (least-squares on measured txb bits; see tools: rel err ~0.2 vs ~1.0
    for the round-1 heuristic)."""
    nnz = jnp.sum(lev != 0, axis=(-1, -2)).astype(jnp.float32)
    lbits = jnp.sum(jnp.log2(1.0 + jnp.abs(lev).astype(jnp.float32)),
                    axis=(-1, -2))
    if bs >= 32:
        est = 25.7 + 2.43 * nnz + 1.83 * lbits
    else:
        est = 16.2 + 2.47 * nnz + 1.58 * lbits
    return jnp.where(nnz > 0, est, 1.0)


def rd_params(qindex: int, bd: int, cands, kf: bool = True):
    """Traced RD inputs for a wavefront call: (dc, ac, lambda, mode-rate
    table).  Passing these as arrays (not static ints) means per-frame
    qindex changes reuse the compiled wavefront."""
    dc, ac = tbl.qindex_to_dq(qindex, bd)
    return (jnp.int32(dc), jnp.int32(ac), jnp.float32(_lambda(qindex)),
            jnp.asarray(intra_mode_rate_table(cands, qindex, kf=kf)))


def encode_plane_wavefront(src, bs: int, tx_size: int, qindex: int,
                           modes: tuple = DEFAULT_MODES, bd: int = 8,
                           angle_deltas: tuple = (0,), valid_h: int = None,
                           paired: bool = False, kf: bool = True,
                           uv_tx: bool = False):
    """paired=True: src stacks two planes [U...V...] on the batch axis and
    each (u,v) pair must pick the SAME candidate (one uv_mode is signaled
    for both chroma planes, spec 5.11.5) — costs sum across the pair."""
    cands = expand_candidates(modes, angle_deltas)
    rd = rd_params(qindex, bd, cands, kf=kf)
    return _wavefront_impl(src, rd, bs, tx_size, modes, bd, angle_deltas,
                           valid_h, paired, uv_tx)


def encode_plane_wavefront_mixed(src, bs: int, tx_size: int, qindex: int,
                                 extra_preds, extra_rate, extra_ok,
                                 intra_ok, n_extra: int,
                                 modes: tuple = DEFAULT_MODES, bd: int = 8,
                                 angle_deltas: tuple = (0,),
                                 valid_h: int = None,
                                 paired: bool = False):
    cands = expand_candidates(modes, angle_deltas)
    rd = rd_params(qindex, bd, cands, kf=False)
    return _wavefront_mixed_impl(src, rd, extra_preds, extra_rate,
                                 extra_ok, intra_ok, bs, tx_size, n_extra,
                                 modes, bd, angle_deltas, valid_h, paired)


@partial(jax.jit,
         static_argnames=("bs", "tx_size", "modes", "bd", "angle_deltas",
                          "valid_h", "paired", "uv_tx"))
def _wavefront_impl(src, rd, bs: int, tx_size: int,
                    modes: tuple = DEFAULT_MODES, bd: int = 8,
                    angle_deltas: tuple = (0,), valid_h: int = None,
                    paired: bool = False, uv_tx: bool = False):
    """src [B, h, w] uint8/int32 (h, w multiples of 2*bs) →
    (cand_idx [B, bh, bw], levels [B, bh, bw, bs, bs], recon [B, h, w]).

    The candidate list is `expand_candidates(modes, angle_deltas)`; cand_idx
    indexes into it.

    valid_h: true (unpadded) frame height.  Left/below-left edge pixel
    rows clamp at valid_h-1 — exactly the spec's bottom-edge rule (§7.11.2
    maxY = MiRows*4-1 with replication of the last in-frame pixel), so
    blocks overhanging an SB-padded bottom predict bit-identically to a
    conformant decoder at the true frame size."""
    return _wavefront_body(src, rd, None, None, None, None, bs, tx_size, 0,
                           modes, bd, angle_deltas, valid_h, paired, uv_tx)


@partial(jax.jit,
         static_argnames=("bs", "tx_size", "modes", "bd", "angle_deltas",
                          "n_extra", "valid_h", "paired"))
def _wavefront_mixed_impl(src, rd, extra_preds, extra_rate, extra_ok,
                          intra_ok, bs: int, tx_size: int, n_extra: int,
                          modes: tuple = DEFAULT_MODES, bd: int = 8,
                          angle_deltas: tuple = (0,), valid_h: int = None,
                          paired: bool = False):
    """Wavefront mode decision with precomputed non-intra candidates
    (the inter path of the EncDec loop, EbProductCodingLoop.c MDSx inter
    classes → here dense candidate tensors evaluated alongside intra).

    extra_preds [B, nE, bh, bw, bs, bs] int32 — bit-final predictions
    (e.g. NEWMV / GLOBALMV motion compensation); extra_rate [B, nE, bh, bw]
    float32 — rate estimate (bits); extra_ok [B, nE, bh, bw] bool;
    intra_ok [B, bh, bw] bool.  Returns (cand_idx, levels, recon) where
    cand_idx < n_intra selects the intra candidate list and cand_idx >=
    n_intra selects extra candidate (cand_idx - n_intra).

    valid_h: true frame height — see _wavefront_impl."""
    return _wavefront_body(src, rd, extra_preds, extra_rate, extra_ok,
                           intra_ok, bs, tx_size, n_extra, modes, bd,
                           angle_deltas, valid_h, paired)


def _wavefront_body(src, rd, extra_preds, extra_rate, extra_ok, intra_ok,
                    bs: int, tx_size: int, n_extra: int, modes, bd: int,
                    angle_deltas, valid_h, paired: bool = False,
                    uv_tx: bool = False):
    dqdc, dqac, lam, mode_rate = rd
    B, h, w = src.shape
    vh = h if valid_h is None else valid_h
    bh, bw = h // bs, w // bs
    rs_t, cs_t, valid_t, has_tr_t, has_bl_t = _quad_tables(bh, bw)
    D = rs_t.shape[2]
    src = src.astype(jnp.int32)
    base = 1 << (bd - 1)
    cands = expand_candidates(modes, angle_deltas)
    n_intra = len(cands)
    BIG = jnp.float32(3e38)

    ar = jnp.arange(bs)

    # The scan carry holds ONLY the coding-order boundary state: the
    # bottom row of every completed block (rowbuf [B, bh, w]) and the
    # right column (colbuf [B, h, bw]) — ~2MB at 1080p vs the 33MB full
    # recon.  The full-plane carry's dynamic gather/scatter dominated the
    # REAL device time (~1ms/step, measured with fetch-synced timing; the
    # full recon assembles from the per-step block outputs afterwards).
    # The source pre-blocks OUTSIDE the scan for the same reason: per-step
    # pixel-space gathers from the 8MB plane are far costlier than an
    # indexed pick of whole blocks.
    src_b = src.reshape(B, bh, bs, bw, bs).transpose(0, 1, 3, 2, 4)

    def sub_step(carry, rs, cs, valid, has_tr, has_bl):
        """Encode one z-position's D blocks; returns updated boundary
        buffers + (best candidate index, levels, recon block)."""
        rowbuf, colbuf = carry
        y = rs * bs
        x = cs * bs
        ha = (rs > 0)[None, :, None]                     # [1, D, 1]
        hl = (cs > 0)[None, :, None]
        rm1 = jnp.maximum(rs - 1, 0)
        cm1 = jnp.maximum(cs - 1, 0)

        # above row (bottom row of the block above), left col (right col
        # of the block left), corner, TR/BL extensions — all from the
        # boundary buffers; bottom-edge rows clamp at vh-1 (§7.11.2 maxY)
        above_real = rowbuf[:, rm1[:, None], x[:, None] + ar[None, :]]
        lrows = jnp.minimum(y[:, None] + ar[None, :], vh - 1)
        left_real = colbuf[:, lrows, cm1[:, None]]
        corner_real = rowbuf[:, rm1, jnp.maximum(x - 1, 0)]

        above = jnp.where(ha, above_real,
                          jnp.where(hl, left_real[..., 0:1], base - 1))
        left = jnp.where(hl, left_real,
                         jnp.where(ha, above_real[..., 0:1], base + 1))
        ha1, hl1 = ha[..., 0], hl[..., 0]
        corner = jnp.where(ha1 & hl1, corner_real,
                           jnp.where(ha1, above_real[..., 0],
                                     jnp.where(hl1, left_real[..., 0], base)))

        # top-right / bottom-left extensions (replicate when unavailable —
        # the schedule guarantees available ones are already in the carry)
        tr_real = rowbuf[:, rm1[:, None],
                         jnp.minimum(x + bs, w - bs)[:, None] + ar[None, :]]
        brows = jnp.minimum(jnp.minimum(y + bs, h - bs)[:, None] +
                            ar[None, :], vh - 1)
        bl_real = colbuf[:, brows, cm1[:, None]]
        htr = has_tr[None, :, None]
        hbl = has_bl[None, :, None]
        above_ext = jnp.concatenate(
            [above, jnp.where(htr, tr_real, above[..., -1:])], axis=-1)
        left_ext = jnp.concatenate(
            [left, jnp.where(hbl, bl_real, left[..., -1:])], axis=-1)

        blocks = src_b[:, rs, cs]                        # [B, D, bs, bs]

        # flatten batch*lane for the candidate stack
        fb = lambda t: t.reshape((B * D,) + t.shape[2:])
        f_src, f_above, f_left, f_corner = map(
            fb, (blocks, above, left, corner))
        f_above_ext, f_left_ext = map(fb, (above_ext, left_ext))
        f_ha = jnp.broadcast_to(ha1, (B, D)).reshape(-1)
        f_hl = jnp.broadcast_to(hl1, (B, D)).reshape(-1)

        # --- candidate stack: [C, B*D, bs, bs] preds + [C, B*D] rate/ok
        preds = []
        rates = []
        oks = []
        if intra_ok is None:
            f_iok = None
        else:
            f_iok = intra_ok[:, rs, cs].reshape(-1)      # [B*D]
        for mi, (mode, delta) in enumerate(cands):
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
            preds.append(pred)
            rates.append(jnp.broadcast_to(mode_rate[mi], (B * D,)))
            oks.append(f_iok if f_iok is not None else None)
        for e in range(n_extra):
            preds.append(fb(extra_preds[:, e][:, rs, cs]))
            rates.append(extra_rate[:, e][:, rs, cs].reshape(-1))
            oks.append(extra_ok[:, e][:, rs, cs].reshape(-1))

        C = len(preds)
        pred_s = jnp.stack(preds)                        # [C, BD, bs, bs]
        rate_s = jnp.stack(rates)                        # [C, BD]
        flat = pred_s.reshape(C * B * D, bs, bs)
        resid = jnp.tile(f_src, (C, 1, 1)) - flat
        # chroma intra txbs use the uv_mode-implied tx type (spec
        # compute_tx_type; reference EbCommonUtils.h:67) — group the
        # candidate stack by type, one chain per distinct type (<=4)
        if uv_tx:
            from ..spec.txfm import uv_intra_tx_type
            types = [uv_intra_tx_type(m, tx_size) for m, _ in cands] + \
                [DCT_DCT] * n_extra
        else:
            types = [DCT_DCT] * C

        def txchain(res, tt):
            lv = quantize_dq(fwd_txfm2d(res, tx_size, tt, bd), tx_size,
                             dqdc, dqac, bd)
            dqv = dequantize_dq(lv, tx_size, dqdc, dqac, bd)
            return lv, inv_txfm2d(dqv, tx_size, tt, bd)

        if len(set(types)) == 1:
            lev, inv = txchain(resid, types[0])
        else:
            resid_c = resid.reshape(C, B * D, bs, bs)
            lev_slots = [None] * C
            inv_slots = [None] * C
            for tt in sorted(set(types)):
                idxs = [i for i, t in enumerate(types) if t == tt]
                sub = jnp.concatenate([resid_c[i] for i in idxs])
                lv, iv = txchain(sub, tt)
                lv = lv.reshape(len(idxs), B * D, bs, bs)
                iv = iv.reshape(len(idxs), B * D, bs, bs)
                for k, i in enumerate(idxs):
                    lev_slots[i] = lv[k]
                    inv_slots[i] = iv[k]
            lev = jnp.concatenate(lev_slots).reshape(C * B * D, bs, bs)
            inv = jnp.concatenate(inv_slots).reshape(C * B * D, bs, bs)
        recb = add_residual_clip(flat, inv, bd)
        sse = jnp.sum((jnp.tile(f_src, (C, 1, 1)) - recb) ** 2,
                      axis=(-1, -2)).astype(jnp.float32).reshape(C, B * D)
        cost = sse + lam * (rate_s +
                            _resid_bits(lev, bs).reshape(C, B * D))
        if any(o is not None for o in oks):
            ok_s = jnp.stack([jnp.ones((B * D,), bool) if o is None else o
                              for o in oks])
            cost = jnp.where(ok_s, cost, BIG)
        if paired:
            # u/v pairing: halves of the batch axis must agree on the
            # candidate (one signaled uv_mode) — sum the pair's costs
            P2 = (B // 2) * D
            cp = cost.reshape(C, 2, P2).sum(axis=1)
            best_mi = jnp.tile(jnp.argmin(cp, axis=0), 2).astype(jnp.int32)
        else:
            best_mi = jnp.argmin(cost, axis=0).astype(jnp.int32)  # 1st-min
        lev_c = lev.reshape(C, B * D, bs, bs)
        rec_c = recb.reshape(C, B * D, bs, bs)
        sel = best_mi[None, :, None, None]
        best_lev = jnp.take_along_axis(lev_c, sel, axis=0)[0]
        best_rec = jnp.take_along_axis(rec_c, sel, axis=0)[0]

        # update boundary buffers (invalid lanes → dropped via OOB index)
        rec_d = best_rec.reshape(B, D, bs, bs)
        rs_eff = jnp.where(valid, rs, bh)                # OOB → drop
        y_eff = jnp.where(valid, y, h + bs)
        rowbuf = rowbuf.at[:, rs_eff[:, None],
                           x[:, None] + ar[None, :]].set(
            rec_d[:, :, -1, :], mode="drop")
        colbuf = colbuf.at[:, y_eff[:, None] + ar[None, :],
                           cs[:, None]].set(
            rec_d[:, :, :, -1], mode="drop")
        return ((rowbuf, colbuf), best_mi.reshape(B, D),
                best_lev.reshape(B, D, bs, bs), rec_d)

    def step(carry, xs):
        rs, cs, valid, has_tr, has_bl = xs               # each [D]
        carry, mi, lev, rec = sub_step(carry, rs, cs, valid, has_tr,
                                       has_bl)
        return carry, (mi, lev, rec)

    # z-positions FOLD INTO the scan axis (z-order preserved: the xs
    # sequence is step-major, z-minor) — the scan body holds ONE
    # sub_step instead of four, so the compiled program is ~4x smaller.
    # Program size is a first-class cost here: the executable uploads
    # through the same ~30MB/s tunnel as the data.
    fold = lambda a: a.reshape((-1,) + a.shape[2:])
    carry0 = (jnp.zeros((B, bh, w), jnp.int32),
              jnp.zeros((B, h, bw), jnp.int32))
    _, (mi_d, lev_d, rec_d) = jax.lax.scan(
        step, carry0, tuple(jnp.asarray(fold(a)) for a in
                            (rs_t, cs_t, valid_t, has_tr_t, has_bl_t)))
    # mi_d [nsteps*4, B, D]; lev_d/rec_d [nsteps*4, B, D, bs, bs]

    # un-diagonalize: → [B, bh, bw, ...]; recon assembles from the
    # per-step block outputs (ONE scatter, outside the scan)
    flat_idx = rs_t * bw + cs_t                          # [nsteps, 4, D]
    mode_idx = jnp.zeros((B, bh * bw), jnp.int32)
    levels = jnp.zeros((B, bh * bw, bs, bs), jnp.int32)
    recon_b = jnp.zeros((B, bh * bw, bs, bs), jnp.int32)
    idx = jnp.asarray(np.where(fold(valid_t), fold(flat_idx), bh * bw))
    mode_idx = mode_idx.at[:, idx].set(
        jnp.moveaxis(mi_d, 1, 0), mode="drop")
    levels = levels.at[:, idx].set(
        jnp.moveaxis(lev_d, 1, 0), mode="drop")
    recon_b = recon_b.at[:, idx].set(
        jnp.moveaxis(rec_d, 1, 0), mode="drop")
    recon = recon_b.reshape(B, bh, bw, bs, bs).transpose(
        0, 1, 3, 2, 4).reshape(B, h, w)
    return (mode_idx.reshape(B, bh, bw),
            levels.reshape(B, bh, bw, bs, bs), recon)

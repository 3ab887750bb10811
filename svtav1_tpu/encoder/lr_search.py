"""Loop-restoration RDO: per-unit SGR parameter search.

Reference: svt_av1_pick_filter_restoration / search_sgrproj
(EbRestorationPick.c:1-1634): for each restoration unit, fit the
self-guided projection weights by least squares (get_proj_subspace),
clamp to the signalable xqd range, and pick NONE vs SGRPROJ per unit by
rate-distortion.

TPU mapping: the two guided-filter components are computed for the WHOLE
plane in one jitted dispatch per ep (16 candidates), and the per-unit
normal-equation sums reduce on-device; only the tiny 2x2 solves and the
RD pick run on host.  The search approximates stripe boundaries with
plane-edge replication (the reference's optimized_lr makes the same
simplification); the recon/decode path applies exact striped semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ec.lr_syntax import (RESTORE_NONE, RESTORE_SGRPROJ, SGR_R,
                            SGRPROJ_PRJ_MAX0, SGRPROJ_PRJ_MAX1,
                            SGRPROJ_PRJ_MIN0, SGRPROJ_PRJ_MIN1)
from ..ops.lr_frame import unit_count
from ..ops.restoration import _sgr_filter_r1, _sgr_filter_r2, SGR_PARAMS

PRJ = 7            # SGRPROJ_PRJ_BITS
RST = 4            # SGRPROJ_RST_BITS


def _unit_sums(x, uh, uw, usize, H, W):
    """Per-unit sums of x [H, W] → [uh, uw] (last unit absorbs tail)."""
    # SB-aligned frames: exact usize tiling
    return x.reshape(uh, usize, uw, usize).sum(axis=(1, 3))


@partial(jax.jit, static_argnames=("eps", "uh", "uw", "usize", "bd"))
def _ep_stats(ext, src, dgd, eps: int, uh: int, uw: int, usize: int,
              bd: int):
    """Normal-equation per-unit sums for one ep candidate."""
    r0, r1 = SGR_R[eps]
    (_, _), (s0, s1) = SGR_PARAMS[eps]
    u = (dgd.astype(jnp.int32) << RST).astype(jnp.float32)
    b = (src.astype(jnp.int32) << RST).astype(jnp.float32) - u
    H, W = dgd.shape
    zeros = jnp.zeros_like(u)
    f0 = (_sgr_filter_r2(ext, s0, bd).astype(jnp.float32) - u) if r0 \
        else zeros
    f1 = (_sgr_filter_r1(ext, s1, bd).astype(jnp.float32) - u) if r1 \
        else zeros
    us = lambda x: _unit_sums(x, uh, uw, usize, H, W)
    return (us(f0 * f0), us(f1 * f1), us(f0 * f1), us(f0 * b),
            us(f1 * b), us(b * b))


def _pad3(x):
    return np.pad(np.asarray(x, np.int32), 3, mode="edge")


def sgr_search(src, dgd, lam: float, usize: int, bd: int = 8):
    """Per-unit SGR search for one plane (src vs post-CDEF recon dgd);
    returns units dict or None if every unit chose NONE."""
    src = np.asarray(src, np.int64)
    dgd_n = np.asarray(dgd, np.int64)
    return _sgr_search(src, dgd_n, _pad3(dgd), lam, bd, usize)


# approximate signaling cost in bits (ep literal + two subexp values +
# use flag; reference uses exact CDF costs)
SGR_BITS = 18.0
NONE_BITS = 1.0


def _sgr_search(src, dgd, ext, lam, bd, usize):
    H, W = dgd.shape
    uh, uw = unit_count(usize, H), unit_count(usize, W)
    if uh * usize != H or uw * usize != W:
        # only SB-aligned planes searched (encoder enforces %64 frames)
        return None
    none_err = np.asarray(
        _unit_sums(((src - dgd) ** 2).astype(np.float64), uh, uw, usize,
                   H, W))
    best_err = none_err * (1 << (2 * RST))    # scaled-domain comparison
    best = None                                # (eps, xqd0, xqd1) arrays
    scale2 = float(1 << (2 * PRJ))
    for eps in range(16):
        h00, h11, h01, c0, c1, bb = (
            np.asarray(a, np.float64) for a in _ep_stats(
                jnp.asarray(ext), jnp.asarray(src, jnp.int32),
                jnp.asarray(dgd, jnp.int32), eps, uh, uw, usize, bd))
        r0, r1 = SGR_R[eps]
        x0 = np.zeros((uh, uw))
        x1 = np.zeros((uh, uw))
        if r0 and r1:
            det = h00 * h11 - h01 * h01
            ok = det > 1e-9
            x0 = np.where(ok, (c0 * h11 - c1 * h01) / np.where(ok, det, 1),
                          0)
            x1 = np.where(ok, (c1 * h00 - c0 * h01) / np.where(ok, det, 1),
                          0)
        elif r0:
            ok = h00 > 1e-9
            x0 = np.where(ok, c0 / np.where(ok, h00, 1), 0)
        else:
            ok = h11 > 1e-9
            x1 = np.where(ok, c1 / np.where(ok, h11, 1), 0)
        xq0 = np.round(x0 * (1 << PRJ)).astype(np.int64)
        xq1 = np.round(x1 * (1 << PRJ)).astype(np.int64)
        # clamp through the signalable xqd domain (decode_xq inverse)
        if r0 and r1:
            xqd0 = np.clip(xq0, SGRPROJ_PRJ_MIN0, SGRPROJ_PRJ_MAX0)
            xqd1 = np.clip((1 << PRJ) - xqd0 - xq1, SGRPROJ_PRJ_MIN1,
                           SGRPROJ_PRJ_MAX1)
            q0, q1 = xqd0, (1 << PRJ) - xqd0 - xqd1
        elif r1 == 0:
            xqd0 = np.clip(xq0, SGRPROJ_PRJ_MIN0, SGRPROJ_PRJ_MAX0)
            xqd1 = np.clip((1 << PRJ) - xqd0, SGRPROJ_PRJ_MIN1,
                           SGRPROJ_PRJ_MAX1)
            q0, q1 = xqd0, np.zeros_like(xqd0)
        else:
            xqd1 = np.clip((1 << PRJ) - xq1, SGRPROJ_PRJ_MIN1,
                           SGRPROJ_PRJ_MAX1)
            xqd0 = np.zeros_like(xqd1)
            q0, q1 = xqd0, (1 << PRJ) - xqd1
        # quadratic error in the (<<RST, <<PRJ) domain, per unit:
        # E = (bb*2^14 - 2 q·C*2^7 ... ) / 2^14  — normalize to <<RST dom
        err = (bb * scale2 + q0 * q0 * h00 + q1 * q1 * h11 +
               2.0 * q0 * q1 * h01 - 2.0 * q0 * c0 * (1 << PRJ) -
               2.0 * q1 * c1 * (1 << PRJ)) / scale2
        if best is None:
            best = (np.full((uh, uw), eps, np.int32),
                    xqd0.astype(np.int32), xqd1.astype(np.int32))
            sgr_err = err
        else:
            take = err < sgr_err
            best = (np.where(take, eps, best[0]),
                    np.where(take, xqd0, best[1]).astype(np.int32),
                    np.where(take, xqd1, best[2]).astype(np.int32))
            sgr_err = np.minimum(sgr_err, err)
    # RD pick per unit: NONE vs best SGR (errors in <<RST² domain)
    sc = float(1 << (2 * RST))
    use = (sgr_err / sc + lam * SGR_BITS) < (none_err + lam * NONE_BITS)
    if not use.any():
        return None
    units = {"type": np.where(use, RESTORE_SGRPROJ,
                              RESTORE_NONE).astype(np.int32),
             "eps": best[0], "xqd": np.stack(best[1:], -1),
             "taps_v": np.zeros((uh, uw, 3), np.int32),
             "taps_h": np.zeros((uh, uw, 3), np.int32)}
    return units


# ------------------------------------------------------------------ #
# Wiener: alternating separable least squares
# (wiener_decompose_sep_sym, EbRestorationPick.c:906; float equivalent —
# taps are quantized to the signalable grid and the final error is
# measured with the normative integer filter, so solver precision only
# affects RD quality, not conformance)
# ------------------------------------------------------------------ #

from ..ec.lr_syntax import (RESTORE_SWITCHABLE, RESTORE_WIENER,
                            WIENER_TAP_MAX, WIENER_TAP_MIN)
from ..ops.lr_frame import _wiener_kernel
from ..ops.restoration import wiener_filter

WIENER_BITS = 32.0


def _solve_sym3(z, x):
    """z: [7, N] filtered rows/cols; solve symmetric normalized 7-tap:
    f[k]=f[6-k], f3 = 1-2(f0+f1+f2).  Returns float taps [7]."""
    g = np.stack([z[0] + z[6], z[1] + z[5], z[2] + z[4]]) - 2 * z[3]
    t = x - z[3]
    A = g @ g.T
    c = g @ t
    try:
        f3 = np.linalg.solve(A + 1e-6 * np.eye(3), c)
    except np.linalg.LinAlgError:
        return None
    f = np.empty(7)
    f[:3] = f3
    f[4:] = f3[::-1]
    f[3] = 1.0 - 2.0 * f3.sum()
    return f


def _wiener_solve_unit(src_w, ext_w, chroma: bool, iters: int = 5):
    """Solve separable Wiener taps for one unit.  src_w [h, w];
    ext_w [h+6, w+6].  Returns (taps_v3, taps_h3) coded taps or None."""
    avg = ext_w.mean()
    d = ext_w.astype(np.float64) - avg
    x = (src_w.astype(np.float64) - avg).ravel()
    h, w = src_w.shape
    # start from the midpoint filter
    fv = np.array([3, -7, 15, 106, 15, -7, 3], np.float64) / 128.0
    fh = fv.copy()
    for _ in range(iters):
        # fix fh → rows convolved horizontally at each dy
        zc = np.stack([
            sum(fh[k] * d[dy:dy + h, k:k + w] for k in range(7)).ravel()
            for dy in range(7)])
        f = _solve_sym3(zc, x)
        if f is not None:
            fv = f
        zr = np.stack([
            sum(fv[k] * d[k:k + h, dx:dx + w] for k in range(7)).ravel()
            for dx in range(7)])
        f = _solve_sym3(zr, x)
        if f is not None:
            fh = f

    def quant(fl, chroma):
        t = np.round(fl * 128).astype(np.int64)
        out = []
        for i in range(3):
            v = 0 if (chroma and i == 0) else int(
                np.clip(t[i], WIENER_TAP_MIN[i], WIENER_TAP_MAX[i]))
            out.append(v)
        return out

    return quant(fv, chroma), quant(fh, chroma)


def wiener_refine(src, dgd, units, lam: float, usize: int,
                  chroma: bool, bd: int = 8):
    """Per-unit: solve Wiener taps, measure exact filtered error with
    the normative kernel, and upgrade units where Wiener beats the
    current choice (NONE or SGR) in RD.  Mutates/returns units."""
    src = np.asarray(src, np.int64)
    dgd_n = np.asarray(dgd, np.int64)
    H, W = dgd_n.shape
    uh, uw = unit_count(usize, H), unit_count(usize, W)
    if uh * usize != H or uw * usize != W:
        return units
    ext = _pad3(dgd)
    created = False
    if units is None:
        units = {"type": np.zeros((uh, uw), np.int32),
                 "eps": np.zeros((uh, uw), np.int32),
                 "xqd": np.zeros((uh, uw, 2), np.int32),
                 "taps_v": np.zeros((uh, uw, 3), np.int32),
                 "taps_h": np.zeros((uh, uw, 3), np.int32)}
        created = True
    for ur in range(uh):
        for uc in range(uw):
            r0, c0 = ur * usize, uc * usize
            sw = src[r0:r0 + usize, c0:c0 + usize]
            dw = dgd_n[r0:r0 + usize, c0:c0 + usize]
            ew = ext[r0:r0 + usize + 6, c0:c0 + usize + 6]
            taps = _wiener_solve_unit(sw, ew, chroma)
            if taps is None:
                continue
            tv, th = taps
            from ..ops.lr_frame import wiener_unit
            flt = np.asarray(wiener_unit(
                ew.astype(np.int32), jnp.asarray(_wiener_kernel(th)),
                jnp.asarray(_wiener_kernel(tv)), bd), np.int64)
            werr = float(((flt - sw) ** 2).sum())
            cur = int(units["type"][ur, uc])
            if cur == RESTORE_NONE:
                cur_cost = float(((dw - sw) ** 2).sum()) + lam * NONE_BITS
            else:
                # keep SGR unless Wiener clearly wins: recompute SGR's
                # exact error with the integer filter
                from ..ops.lr_frame import sgr_unit
                sf = np.asarray(sgr_unit(
                    ew.astype(np.int32), int(units["eps"][ur, uc]),
                    jnp.int32(units["xqd"][ur, uc, 0]),
                    jnp.int32(units["xqd"][ur, uc, 1]), bd), np.int64)
                cur_cost = float(((sf - sw) ** 2).sum()) + lam * SGR_BITS
            if werr + lam * WIENER_BITS < cur_cost:
                units["type"][ur, uc] = RESTORE_WIENER
                units["taps_v"][ur, uc] = tv
                units["taps_h"][ur, uc] = th
    if created and not units["type"].any():
        return None
    return units


def lr_search_frame(src_planes, cdef_planes, lam: float, bd: int = 8,
                    wiener: bool = True):
    """Search all planes; returns (frame_types tuple, per-plane units
    list) — units[p] is None when the plane is NONE."""
    types = []
    infos = []
    for p in range(3):
        usize = 64 if p == 0 else 32
        units = sgr_search(src_planes[p], cdef_planes[p], lam, usize, bd)
        if wiener:
            units = wiener_refine(src_planes[p], cdef_planes[p], units,
                                  lam, usize, p > 0, bd)
        infos.append(units)
        if units is None:
            types.append(RESTORE_NONE)
        else:
            has_w = (units["type"] == RESTORE_WIENER).any()
            has_s = (units["type"] == RESTORE_SGRPROJ).any()
            if has_w and has_s:
                types.append(RESTORE_SWITCHABLE)
            elif has_w:
                types.append(RESTORE_WIENER)
            else:
                types.append(RESTORE_SGRPROJ)
    return tuple(types), infos

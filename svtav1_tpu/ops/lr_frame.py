"""Loop-restoration frame assembly: striped filtering with boundary rules.

Spec §7.17; reference flow: svt_av1_loop_restoration_filter_frame /
svt_aom_foreach_rest_unit_in_frame with the stripe boundary handling of
EbRestoration.c:257-420 (svt_aom_get_stripe_boundary_info /
svt_aom_setup_processing_stripe_boundary) and the saved boundary lines of
EbRestoration.c:1522-1704 (deblocked rows at interior stripe edges, CDEF
rows at the frame edges).

Geometry (single-tile, no superres):
- stripes are 64>>ss_y rows tall, offset up by 8>>ss_y (first stripe is
  short);
- a stripe's 3 context rows above/below come from
  * the frame edge: replicated outermost CDEF row,
  * otherwise: the 2 saved post-deblock (pre-CDEF) rows adjacent to the
    stripe edge, expanded 2→3 by duplicating the outermost row;
- horizontal context is 3 replicated columns (frame edges) or the
  neighboring unit's CDEF pixels;
- restoration units are 64 luma px (32 chroma at 4:2:0) — one per
  superblock; the last unit in a row/column absorbs the remainder.

Both the encoder (recon path) and the decoder call lr_apply_frame, so a
single implementation defines the normative output.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .restoration import apply_sgr, wiener_filter


@partial(jax.jit, static_argnames=("eps", "bd"))
def sgr_unit(ext, eps: int, xqd0, xqd1, bd: int):
    """Jitted per-window SGR (xqd traced: one compile per shape/eps)."""
    return apply_sgr(ext, eps, xqd0, xqd1, bd)


@partial(jax.jit, static_argnames=("bd",))
def wiener_unit(ext, kh, kv, bd: int):
    """Jitted per-window Wiener (taps traced: one compile per shape)."""
    return wiener_filter(ext, kh, kv, bd)

BORDER = 3
CTX = 2                    # saved deblock rows per stripe edge


def unit_count(size: int, extent: int) -> int:
    """count_units_in_frame (spec): offset grid, >= 1."""
    return max((extent + (size >> 1)) // size, 1)


def _unit_range(i: int, n: int, size: int, extent: int):
    """Pixel span of unit i of n along one axis (last absorbs tail)."""
    lo = i * size
    hi = extent if i == n - 1 else (i + 1) * size
    return lo, hi


def _unit_range_v(i: int, n: int, size: int, extent: int, off: int):
    """Vertical span of unit row i: shifted up by the stripe offset so
    unit rows align with processing stripes
    (foreach_rest_unit_in_tile, EbRestoration.c:1266-1273: v_start/v_end
    -= RESTORATION_UNIT_OFFSET except at the frame edges)."""
    lo = max(0, i * size - off)
    hi = extent if i == n - 1 else (i + 1) * size - off
    return lo, hi


def _stripes(H: int, sh: int, off: int):
    """Yield (y0, y1) stripe row ranges."""
    s = 0
    while True:
        y0 = max(0, s * sh - off)
        if y0 >= H:
            return
        y1 = min((s + 1) * sh - off, H)
        yield y0, y1
        s += 1


def _stripe_ext(cdef: np.ndarray, db: np.ndarray, y0: int, y1: int,
                H: int, W: int) -> np.ndarray:
    """[y1-y0+6, W+6] extended stripe: CDEF interior rows, boundary-rule
    context rows, 3-col horizontal replication."""
    rows = [None] * 3
    if y0 == 0:
        rows[0] = rows[1] = rows[2] = cdef[0]
    else:
        a0 = db[y0 - 2]
        a1 = db[y0 - 1]
        rows[0] = rows[1] = a0
        rows[2] = a1
    below = [None] * 3
    if y1 >= H:
        below[0] = below[1] = below[2] = cdef[H - 1]
    else:
        b0 = db[y1]
        b1 = db[min(y1 + 1, H - 1)]
        below[0] = b0
        below[1] = below[2] = b1
    body = np.concatenate([np.stack(rows), cdef[y0:y1],
                           np.stack(below)], axis=0)
    out = np.empty((body.shape[0], W + 2 * BORDER), body.dtype)
    out[:, BORDER:BORDER + W] = body
    out[:, :BORDER] = body[:, :1]
    out[:, BORDER + W:] = body[:, -1:]
    return out


RESTORE_NONE = 0
RESTORE_WIENER = 1
RESTORE_SGRPROJ = 2
RESTORE_SWITCHABLE = 3


def _wiener_kernel(taps3):
    """3 coded taps -> 7-tap kernel (center from normalization,
    EbDecParseBlock.c read_wiener_filter center rule)."""
    t0, t1, t2 = (int(t) for t in taps3)
    c = -2 * (t0 + t1 + t2)
    return np.array([t0, t1, t2, c, t2, t1, t0], np.int32)


def lr_apply_plane(cdef: np.ndarray, db: np.ndarray, units: dict,
                   ss_y: int, usize: int, bd: int = 8) -> np.ndarray:
    """Apply per-unit restoration to one plane.

    cdef: post-CDEF plane (LR input); db: post-deblock pre-CDEF plane
    (stripe context source); units: {"type": [uh, uw], "eps": [uh, uw],
    "xqd": [uh, uw, 2], "taps_v": [uh, uw, 3], "taps_h": [uh, uw, 3]}.
    """
    H, W = cdef.shape
    sh = 64 >> ss_y
    off = 8 >> ss_y
    types = units["type"]
    uh, uw = types.shape
    out = np.array(cdef, np.int32, copy=True)
    if not types.any():
        return out
    cdef = np.asarray(cdef, np.int32)
    db = np.asarray(db, np.int32)
    for y0, y1 in _stripes(H, sh, off):
        ext = None
        for uc in range(uw):
            # units whose row range intersects this stripe, per column
            for ur in range(uh):
                r0, r1 = _unit_range_v(ur, uh, usize, H, off)
                if r1 <= y0 or r0 >= y1:
                    continue
                t = int(types[ur, uc])
                if t == RESTORE_NONE:
                    continue
                if ext is None:
                    ext = _stripe_ext(cdef, db, y0, y1, H, W)
                c0, c1 = _unit_range(uc, uw, usize, W)
                # rows of this unit within the stripe
                ry0, ry1 = max(r0, y0), min(r1, y1)
                win = ext[ry0 - y0:ry1 - y0 + 2 * BORDER,
                          c0:c1 + 2 * BORDER]
                if t == RESTORE_SGRPROJ:
                    flt = sgr_unit(win, int(units["eps"][ur, uc]),
                                   jnp.int32(units["xqd"][ur, uc, 0]),
                                   jnp.int32(units["xqd"][ur, uc, 1]), bd)
                else:
                    kv = _wiener_kernel(units["taps_v"][ur, uc])
                    kh = _wiener_kernel(units["taps_h"][ur, uc])
                    flt = wiener_unit(win, jnp.asarray(kh),
                                      jnp.asarray(kv), bd)
                out[ry0:ry1, c0:c1] = np.asarray(flt)
    return out


def lr_apply_frame(cdef_planes, db_planes, unit_infos, bd: int = 8):
    """(y, u, v) planes; unit_infos: per-plane units dict or None."""
    out = []
    for p, (cd, dbp) in enumerate(zip(cdef_planes, db_planes)):
        info = unit_infos[p]
        if info is None:
            out.append(np.asarray(cd, np.int32))
            continue
        ss = 0 if p == 0 else 1
        usz = 64 >> ss
        out.append(lr_apply_plane(np.asarray(cd), np.asarray(dbp), info,
                                  ss, usz, bd))
    return tuple(out)

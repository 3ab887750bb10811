"""CDEF strength search + frame application (encoder side).

Reference behavior: svt_av1_cdef_search / finish_cdef_search
(/root/reference/Source/Lib/Encoder/Codec/EbEncCdef.c) orchestrated by
EbCdefProcess.c:147 (damping = 3 + base_q_idx//64), with the greedy dual
luma/chroma strength-set selection of svt_search_one_dual.

TPU mapping: ONE jitted dispatch evaluates every candidate (pri, sec)
strength pair — a `lax.map` over the candidate axis filters the whole
frame and reduces per-64x64-unit SSE against the source; the greedy
joint set selection (tiny: units x candidates^2) runs host-side; a
second dispatch applies the chosen per-unit strengths normatively
(shared with the decoder via ops.cdef.cdef_apply_frame).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cdef import (adjust_strength_map, cdef_filter_plane_map,
                        find_dir_plane, pad_plane_j)

# candidate pri x sec strength pairs (subset of the 16x4 space, like the
# reference's gated search levels; sec value 3 is not signalable)
PRI_CAND = (0, 1, 2, 3, 4, 6, 8, 12)
SEC_CAND = (0, 1, 2, 4)
CAND_PAIRS = tuple((p, s) for p in PRI_CAND for s in SEC_CAND)


def _unit_sse(diff2, nonskip8, block: int):
    """diff2 [H, W] int32 squared errors → per-64x64-unit sums over
    non-skip blocks.  nonskip8 [H//block, W//block] bool."""
    H, W = diff2.shape[-2], diff2.shape[-1]
    bh, bw = H // block, W // block
    per_blk = diff2.reshape(bh, block, bw, block).sum((1, 3))
    per_blk = jnp.where(nonskip8, per_blk, 0)
    # one 64x64 luma unit = 8x8 blocks of 8 (luma) or, at half plane
    # resolution, 8x8 blocks of 4 (4:2:0 chroma) — u = 8 either way
    u = 8
    return per_blk.reshape(bh // u, u, bw // u, u).sum((1, 3))


@partial(jax.jit, static_argnames=("bd",))
def cdef_candidate_sse(src_y, src_u, src_v, rec_y, rec_u, rec_v, skip8,
                       cands, damping, bd: int = 8):
    """Per-unit SSE for every candidate strength pair, one dispatch.

    cands [N, 2] int32 (pri, sec); returns (mse_y [N, uh, uw],
    mse_uv [N, uh, uw], ident_y [uh, uw], ident_uv [uh, uw]) — the
    identity (0,0) errors are included in the candidate axis wherever
    cands contains (0,0)."""
    cs = bd - 8
    rec_y = jnp.asarray(rec_y).astype(jnp.int32)
    rec_u = jnp.asarray(rec_u).astype(jnp.int32)
    rec_v = jnp.asarray(rec_v).astype(jnp.int32)
    dirs, var = find_dir_plane(rec_y, cs)
    ypad = pad_plane_j(rec_y)
    upad = pad_plane_j(rec_u)
    vpad = pad_plane_j(rec_v)
    nonskip = ~jnp.asarray(skip8)

    sy = jnp.asarray(src_y).astype(jnp.int32)
    su = jnp.asarray(src_u).astype(jnp.int32)
    sv = jnp.asarray(src_v).astype(jnp.int32)

    def one_y(c):
        py, ss = c[0] << cs, c[1] << cs
        pmap = jnp.broadcast_to(py, dirs.shape)
        smap = jnp.broadcast_to(ss, dirs.shape)
        pri_adj = adjust_strength_map(pmap, var)
        d = jnp.where(pmap > 0, dirs, 0)
        yf = cdef_filter_plane_map(ypad, d, pri_adj, smap,
                                   damping + cs, damping + cs, 8, cs)
        return _unit_sse((yf - sy) ** 2, nonskip, 8)

    def one_uv(c):
        py, ss = c[0] << cs, c[1] << cs
        pmap = jnp.broadcast_to(py, dirs.shape)
        smap = jnp.broadcast_to(ss, dirs.shape)
        d = jnp.where(pmap > 0, dirs, 0)
        uf = cdef_filter_plane_map(upad, d, pmap, smap, damping + cs - 1,
                                   damping + cs - 1, 4, cs)
        vf = cdef_filter_plane_map(vpad, d, pmap, smap, damping + cs - 1,
                                   damping + cs - 1, 4, cs)
        return _unit_sse((uf - su) ** 2, nonskip, 4) + \
            _unit_sse((vf - sv) ** 2, nonskip, 4)

    mse_y = jax.lax.map(one_y, cands)
    mse_uv = jax.lax.map(one_uv, cands)
    return mse_y, mse_uv


def _greedy_dual(my, muv, n: int):
    """svt_search_one_dual analogue: pick n (luma, chroma) candidate-index
    pairs greedily (+ one refinement sweep) minimizing total per-unit-min
    SSE.  my/muv: [U, N] float64.  Returns (pairs list, per-unit best)."""
    U, N = my.shape
    comb = my[:, :, None] + muv[:, None, :]              # [U, Ny, Nuv]
    cur = np.full(U, np.inf)
    pairs = []
    for _ in range(n):
        tot = np.minimum(cur[:, None, None], comb).sum(0)
        iy, iuv = np.unravel_index(np.argmin(tot), tot.shape)
        pairs.append((int(iy), int(iuv)))
        cur = np.minimum(cur, comb[:, iy, iuv])
    # refinement: re-choose each member holding the others fixed
    for _ in range(2):
        changed = False
        for j in range(len(pairs)):
            others = [p for k, p in enumerate(pairs) if k != j]
            if others:
                base = np.min(np.stack([comb[:, a, b] for a, b in others],
                                       1), 1)
            else:
                base = np.full(U, np.inf)
            tot = np.minimum(base[:, None, None], comb).sum(0)
            iy, iuv = np.unravel_index(np.argmin(tot), tot.shape)
            if (iy, iuv) != pairs[j] and tot[iy, iuv] < \
                    np.minimum(base, comb[:, pairs[j][0],
                                          pairs[j][1]]).sum():
                pairs[j] = (int(iy), int(iuv))
                changed = True
        if not changed:
            break
    stack = np.stack([comb[:, a, b] for a, b in pairs], 1)   # [U, n]
    return pairs, stack


def cdef_search_frame(src, rec, skip8, qindex: int, lam: float,
                      bd: int = 8):
    """Full CDEF RDO for one frame.

    src/rec: (y, u, v) numpy planes (rec = post-deblock);
    skip8 [H/8, W/8] bool.  Returns (params dict, filtered (y,u,v))
    where params = {damping, bits, y_strengths, uv_strengths, idx_map
    [sb_rows, sb_cols]}; strengths are (pri, sec) tuples, sec ∈
    {0,1,2,4}."""
    damping = 3 + (qindex >> 6)
    cands = jnp.asarray(np.array(CAND_PAIRS, np.int32))
    mse_y, mse_uv = cdef_candidate_sse(
        src[0], src[1], src[2], rec[0], rec[1], rec[2],
        jnp.asarray(skip8), cands, jnp.int32(damping), bd)
    my = np.asarray(mse_y, np.float64).reshape(len(CAND_PAIRS), -1).T
    muv = np.asarray(mse_uv, np.float64).reshape(len(CAND_PAIRS), -1).T
    uh, uw = np.asarray(mse_y).shape[1:]
    n_coded = int((~np.asarray(skip8)).reshape(uh, 8, uw, 8)
                  .any((1, 3)).sum())

    best = None
    for bits in range(4):
        n = 1 << bits
        pairs, stack = _greedy_dual(my, muv, n)
        tot = stack.min(1).sum()
        rate = n * 12 + n_coded * bits
        cost = tot + lam * rate
        if best is None or cost < best[0]:
            idx = stack.argmin(1).reshape(uh, uw)
            best = (cost, bits, pairs, idx)
    _, bits, pairs, idx_map = best

    y_str = [CAND_PAIRS[a] for a, _ in pairs]
    uv_str = [CAND_PAIRS[b] for _, b in pairs]
    return {"damping": damping, "bits": bits,
            "y_strengths": y_str, "uv_strengths": uv_str,
            "idx_map": idx_map.astype(np.int32)}


def build_skip8(part, y_lev, u_lev, v_lev, y_slev, u_slev, v_slev,
                part_sb=None, y_lev_sb=None, u_lev_sb=None, v_lev_sb=None):
    """Per-8x8 coded-skip map [4*bh, 4*bw] bool from one tile's partition
    and level arrays — must match the tile coder's skip semantics
    (tile_codec.py: skip = all three planes' levels zero).  part_sb plus
    the *_lev_sb arrays add the 64x64 NONE depth."""
    bh, bw = part.shape
    skip32 = ~(y_lev.reshape(bh, bw, -1).any(-1) |
               u_lev.reshape(bh, bw, -1).any(-1) |
               v_lev.reshape(bh, bw, -1).any(-1))
    skip16 = ~(y_slev.reshape(bh, bw, 4, -1).any(-1) |
               u_slev.reshape(bh, bw, 4, -1).any(-1) |
               v_slev.reshape(bh, bw, 4, -1).any(-1))
    s32 = np.repeat(np.repeat(skip32, 4, 0), 4, 1)
    z = skip16.reshape(bh, bw, 2, 2)                  # [.., sr, sc]
    s16 = np.repeat(np.repeat(
        z.transpose(0, 2, 1, 3).reshape(bh * 2, bw * 2), 2, 0), 2, 1)
    pm = np.repeat(np.repeat(part.astype(bool), 4, 0), 4, 1)
    out = np.where(pm, s16, s32)
    if part_sb is not None:
        sh, sw = part_sb.shape
        skip64 = ~(y_lev_sb.reshape(sh, sw, -1).any(-1) |
                   u_lev_sb.reshape(sh, sw, -1).any(-1) |
                   v_lev_sb.reshape(sh, sw, -1).any(-1))
        s64 = np.repeat(np.repeat(skip64, 8, 0), 8, 1)
        psb = np.repeat(np.repeat(part_sb.astype(bool), 8, 0), 8, 1)
        out = np.where(psb, out, s64)
    return out


def cdef_frame_config_fields(params):
    """FrameConfig kwargs from a search result."""
    return dict(cdef_damping=params["damping"], cdef_bits=params["bits"],
                cdef_y_strengths=tuple(params["y_strengths"]),
                cdef_uv_strengths=tuple(params["uv_strengths"]))

"""Intra prediction as one matmul: every AV1 intra mode except DC and
PAETH is a LINEAR map of the edge pixels followed by a per-mode
round-and-shift, so a whole candidate stack of predictions is a single
[lanes, E] @ [E, n_cand*n*n] contraction — MXU food for the Pallas
wavefront kernel (pallas/wavefront_kernel.py).

Edge vector layout per lane (length E = 4n+1, corner LAST so the first
4n columns form the 128-aligned matmul block for n=32):
    [0 .. 2n-1]    above_ext (above row + top-right extension)
    [2n .. 4n-1]   left_ext  (left col + bottom-left extension)
    [4n]           above-left corner

Exactness: pixels are <= 255 (8-bit) and weights <= 256, both exact in
bfloat16; MXU bf16 x bf16 products accumulate in f32 and every partial
sum stays < 2^19, so the matmul is bit-exact integer arithmetic.  The
per-mode epilogue pred = floor((acc + h) * 2^-s) reproduces the
normative rounding (spec §7.11.2; EbIntraPrediction.c z1/z2/z3 +
smooth_pred) exactly.

Behavioral spec: ops/intra.py + ops/intra_dir.py (golden-tested vs the
reference); this module is tested equal to those.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from . import intra
from .intra_dir import MODE_ANGLE, _z1_maps, _z2_maps, _z3_maps


def _col(W, n, ci):
    """Flat column index of output pixel (i, j) for candidate ci."""
    return ci * n * n


@lru_cache(maxsize=None)
def build_w(n: int, cands: tuple):
    """cands: tuple of (mode, delta).  Returns (W [4n+1, C*n*n] float32,
    add [C] int32, shift [C] int32, linear [C] bool).  Non-linear
    candidates (DC, PAETH) get zero columns and linear[ci] = False."""
    E = 4 * n + 1
    C = len(cands)
    W = np.zeros((E, C * n * n), np.float32)
    add = np.zeros(C, np.int32)
    shift = np.zeros(C, np.int32)
    linear = np.zeros(C, bool)
    A = 0                 # above_ext base in E
    L = 2 * n             # left_ext base in E
    CNR = 4 * n           # corner

    for ci, (mode, delta) in enumerate(cands):
        base = ci * n * n

        def put(e_idx, i, j, w):
            W[e_idx, base + i * n + j] += w

        if mode in (intra.DC_PRED, intra.PAETH_PRED):
            continue
        linear[ci] = True
        if mode == intra.V_PRED and delta == 0:
            for i in range(n):
                for j in range(n):
                    put(A + j, i, j, 1.0)
            continue
        if mode == intra.H_PRED and delta == 0:
            for i in range(n):
                for j in range(n):
                    put(L + i, i, j, 1.0)
            continue
        if mode == intra.SMOOTH_PRED:
            wh = intra.SM_WEIGHTS[n:n + n]
            ww = intra.SM_WEIGHTS[n:n + n]
            sc = 1 << intra.SM_WEIGHT_LOG2_SCALE
            for i in range(n):
                for j in range(n):
                    put(A + j, i, j, float(wh[i]))
                    put(L + n - 1, i, j, float(sc - wh[i]))   # below-left
                    put(L + i, i, j, float(ww[j]))
                    put(A + n - 1, i, j, float(sc - ww[j]))   # top-right
            add[ci] = 1 << intra.SM_WEIGHT_LOG2_SCALE
            shift[ci] = intra.SM_WEIGHT_LOG2_SCALE + 1
            continue
        if mode == intra.SMOOTH_V_PRED:
            wh = intra.SM_WEIGHTS[n:n + n]
            sc = 1 << intra.SM_WEIGHT_LOG2_SCALE
            for i in range(n):
                for j in range(n):
                    put(A + j, i, j, float(wh[i]))
                    put(L + n - 1, i, j, float(sc - wh[i]))
            add[ci] = 1 << (intra.SM_WEIGHT_LOG2_SCALE - 1)
            shift[ci] = intra.SM_WEIGHT_LOG2_SCALE
            continue
        if mode == intra.SMOOTH_H_PRED:
            ww = intra.SM_WEIGHTS[n:n + n]
            sc = 1 << intra.SM_WEIGHT_LOG2_SCALE
            for i in range(n):
                for j in range(n):
                    put(L + i, i, j, float(ww[j]))
                    put(A + n - 1, i, j, float(sc - ww[j]))
            add[ci] = 1 << (intra.SM_WEIGHT_LOG2_SCALE - 1)
            shift[ci] = intra.SM_WEIGHT_LOG2_SCALE
            continue
        # directional (incl. V/H with nonzero delta)
        angle = MODE_ANGLE[mode] + 3 * delta
        add[ci] = 16
        shift[ci] = 5
        if angle < 90:
            i0, i1, sh, over = _z1_maps(n, angle)
            for i in range(n):
                for j in range(n):
                    if over[i, j]:
                        put(A + 2 * n - 1, i, j, 32.0)
                    else:
                        put(A + int(i0[i, j]), i, j, float(32 - sh[i, j]))
                        put(A + int(i1[i, j]), i, j, float(sh[i, j]))
        elif angle == 90:
            for i in range(n):
                for j in range(n):
                    put(A + j, i, j, 32.0)
        elif angle < 180:
            ua, a0, a1, s1, l0, l1, s2 = _z2_maps(n, angle)

            def eidx_above(k):      # [corner | above[:n]] index -> E
                return CNR if k == 0 else A + k - 1

            def eidx_left(k):
                return CNR if k == 0 else L + k - 1
            for i in range(n):
                for j in range(n):
                    if ua[i, j]:
                        put(eidx_above(int(a0[i, j])), i, j,
                            float(32 - s1[i, j]))
                        put(eidx_above(int(a1[i, j])), i, j,
                            float(s1[i, j]))
                    else:
                        put(eidx_left(int(l0[i, j])), i, j,
                            float(32 - s2[i, j]))
                        put(eidx_left(int(l1[i, j])), i, j,
                            float(s2[i, j]))
        elif angle == 180:
            for i in range(n):
                for j in range(n):
                    put(L + i, i, j, 32.0)
        else:
            i0, i1, sh, over = _z3_maps(n, angle)
            for i in range(n):
                for j in range(n):
                    if over[i, j]:
                        put(L + 2 * n - 1, i, j, 32.0)
                    else:
                        put(L + int(i0[i, j]), i, j, float(32 - sh[i, j]))
                        put(L + int(i1[i, j]), i, j, float(sh[i, j]))
    return W, add, shift, linear


def predict_linear_np(edges: np.ndarray, n: int, cands: tuple):
    """NumPy oracle: edges [B, 4n+1] int32 -> preds [C, B, n, n] int32
    for the linear candidates (zeros for DC/PAETH columns)."""
    W, add, shift, linear = build_w(n, cands)
    acc = edges.astype(np.int64) @ W.astype(np.int64)     # [B, C*n*n]
    C = len(cands)
    acc = acc.reshape(-1, C, n * n).transpose(1, 0, 2)
    out = (acc + add[:, None, None]) >> shift[:, None, None]
    return out.reshape(C, -1, n, n).astype(np.int32)

"""Batched AV1 loop restoration — Wiener + self-guided (SGR), spec §7.17.

Reference behavior: /root/reference/Source/Lib/Common/Codec/EbRestoration.c
(selfguided_restoration_* :668-955, svt_apply_selfguided_restoration_c :958)
and convolve.c:57-145 (wiener convolve add-src).

The SGR box sums become 2D cumulative-sum differences over the whole unit;
the A/B guidance maps and both cross-shaped blends are fully vectorized.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SGRPROJ_SGR_BITS = 8
SGRPROJ_SGR = 1 << SGRPROJ_SGR_BITS
SGRPROJ_RST_BITS = 4
SGRPROJ_PRJ_BITS = 7
SGRPROJ_MTABLE_BITS = 20
SGRPROJ_RECIP_BITS = 12
BORDER = 3  # SGRPROJ_BORDER_VERT/HORZ

# (r0, e0, r1, e1) with s = normative mtable values
# (EbRestoration.c:85-103)
SGR_PARAMS = [
    ((2, 1), (140, 3236)), ((2, 1), (112, 2158)), ((2, 1), (93, 1618)),
    ((2, 1), (80, 1438)), ((2, 1), (70, 1295)), ((2, 1), (58, 1177)),
    ((2, 1), (47, 1079)), ((2, 1), (37, 996)), ((2, 1), (30, 925)),
    ((2, 1), (25, 863)), ((0, 1), (-1, 2589)), ((0, 1), (-1, 1618)),
    ((0, 1), (-1, 1177)), ((0, 1), (-1, 925)), ((2, 0), (56, -1)),
    ((2, 0), (22, -1)),
]

X_BY_XPLUS1 = np.array([
    1, 128, 171, 192, 205, 213, 219, 224, 228, 230, 233, 235, 236, 238, 239,
    240, 241, 242, 243, 243, 244, 244, 245, 245, 246, 246, 247, 247, 247, 247,
    248, 248, 248, 248, 249, 249, 249, 249, 249, 250, 250, 250, 250, 250, 250,
    250, 251, 251, 251, 251, 251, 251, 251, 251, 251, 251, 252, 252, 252, 252,
    252, 252, 252, 252, 252, 252, 252, 252, 252, 252, 252, 252, 252, 253, 253,
    253, 253, 253, 253, 253, 253, 253, 253, 253, 253, 253, 253, 253, 253, 253,
    253, 253, 253, 253, 253, 253, 253, 253, 253, 253, 253, 253, 254, 254, 254,
    254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254,
    254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254,
    254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254,
    254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254, 254,
    254, 254, 254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    256,
], np.int32)

ONE_BY_X = np.array([4096, 2048, 1365, 1024, 819, 683, 585, 512, 455, 410,
                     372, 341, 315, 293, 273, 256, 241, 228, 216, 205, 195,
                     186, 178, 171, 164], np.int32)


def _rpot(x, b):
    return (x + (1 << (b - 1))) >> b if b > 0 else x


def _boxsum(x, r):
    """Full-window (2r+1)^2 box sums; x [..., H, W] → same minus 2r edge."""
    c = jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)
    c = jnp.pad(c, [(0, 0)] * (c.ndim - 2) + [(1, 0), (1, 0)])
    n = 2 * r + 1
    return (c[..., n:, n:] - c[..., n:, :-n] - c[..., :-n, n:] +
            c[..., :-n, :-n])


def _sgr_ab(dgd_ext, r, s, bit_depth):
    """A/B guidance over positions [-1..h+1) x [-1..w+1) of the interior.

    dgd_ext [..., h+2*BORDER, w+2*BORDER] int32 → A, B [..., h+2, w+2].
    """
    n = (2 * r + 1) * (2 * r + 1)
    # interior position (i,j) → ext (i+BORDER, j+BORDER); need i from -1..h
    # boxsum output index (i) corresponds to ext window centered i+r
    bs_b = _boxsum(dgd_ext, r)
    bs_a = _boxsum(dgd_ext * dgd_ext, r)
    # center (i + BORDER) → boxsum idx (i + BORDER - r); take i=-1..h+1
    o = BORDER - 1 - r
    H = dgd_ext.shape[-2] - 2 * BORDER
    W = dgd_ext.shape[-1] - 2 * BORDER
    A0 = bs_a[..., o:o + H + 2, o:o + W + 2]
    B0 = bs_b[..., o:o + H + 2, o:o + W + 2]
    a = _rpot(A0, 2 * (bit_depth - 8)) if bit_depth > 8 else A0
    b = _rpot(B0, bit_depth - 8) if bit_depth > 8 else B0
    p = jnp.maximum(a * n - b * b, 0)
    # z = round2(p*s, 20): p*s can reach 2^32 (uint32 in C) — split the
    # multiply to stay in int32: p = hi*2^10 + lo
    hi = p >> 10
    lo = p & 1023
    t = lo * s + (1 << (SGRPROJ_MTABLE_BITS - 1))
    z = (hi * s + (t >> 10)) >> 10
    A = jnp.take(jnp.asarray(X_BY_XPLUS1), jnp.minimum(z, 255))
    B = _rpot((SGRPROJ_SGR - A) * B0 * int(ONE_BY_X[n - 1]),
              SGRPROJ_RECIP_BITS)
    return A, B


def _sgr_filter_r2(dgd_ext, s, bit_depth):
    """Fast (r=2) path: A/B on odd interior rows, 5-neighbor blends."""
    A, B = _sgr_ab(dgd_ext, 2, s, bit_depth)   # [..., h+2, w+2], idx0 = -1
    H = dgd_ext.shape[-2] - 2 * BORDER
    W = dgd_ext.shape[-1] - 2 * BORDER
    dgd = dgd_ext[..., BORDER:BORDER + H, BORDER:BORDER + W]
    out = jnp.zeros(dgd.shape, jnp.int32)

    # even rows i: use A/B rows i-1 and i+1 (both odd)
    iw = np.arange(0, H, 2)
    up = iw[:, None]          # A-index of row i-1 = i-1+1 = i
    dn = iw[:, None] + 2
    jj = np.arange(W)[None, :]
    aidx = lambda r_, c_: (..., r_, c_)

    def gA(rr, cc):
        return A[..., rr, cc]

    def gB(rr, cc):
        return B[..., rr, cc]

    a_e = (gA(up, jj + 1) + gA(dn, jj + 1)) * 6 + \
        (gA(up, jj) + gA(dn, jj) + gA(up, jj + 2) + gA(dn, jj + 2)) * 5
    b_e = (gB(up, jj + 1) + gB(dn, jj + 1)) * 6 + \
        (gB(up, jj) + gB(dn, jj) + gB(up, jj + 2) + gB(dn, jj + 2)) * 5
    v_e = a_e * dgd[..., iw, :] + b_e
    out = out.at[..., iw, :].set(_rpot(v_e, SGRPROJ_SGR_BITS + 5 -
                                       SGRPROJ_RST_BITS))

    io = np.arange(1, H, 2)
    ce = io[:, None] + 1
    a_o = gA(ce, jj + 1) * 6 + (gA(ce, jj) + gA(ce, jj + 2)) * 5
    b_o = gB(ce, jj + 1) * 6 + (gB(ce, jj) + gB(ce, jj + 2)) * 5
    v_o = a_o * dgd[..., io, :] + b_o
    out = out.at[..., io, :].set(_rpot(v_o, SGRPROJ_SGR_BITS + 4 -
                                       SGRPROJ_RST_BITS))
    return out


def _sgr_filter_r1(dgd_ext, s, bit_depth):
    """Full-resolution (r=1) path: 3x3 cross blend weights 4/3."""
    A, B = _sgr_ab(dgd_ext, 1, s, bit_depth)
    H = dgd_ext.shape[-2] - 2 * BORDER
    W = dgd_ext.shape[-1] - 2 * BORDER
    dgd = dgd_ext[..., BORDER:BORDER + H, BORDER:BORDER + W]

    def w3(M):
        c = M[..., 1:H + 1, 1:W + 1]
        n4 = (c + M[..., 1:H + 1, :W] + M[..., 1:H + 1, 2:] +
              M[..., :H, 1:W + 1] + M[..., 2:, 1:W + 1]) * 4
        n3 = (M[..., :H, :W] + M[..., :H, 2:] + M[..., 2:, :W] +
              M[..., 2:, 2:]) * 3
        return n4 + n3

    v = w3(A) * dgd + w3(B)
    return _rpot(v, SGRPROJ_SGR_BITS + 5 - SGRPROJ_RST_BITS)


def apply_sgr(dgd_ext, eps: int, xqd0: int, xqd1: int, bit_depth: int = 8):
    """Self-guided restoration of the interior of dgd_ext
    [..., h+6, w+6] (3-pixel borders) → restored [..., h, w]."""
    (r0, r1), (s0, s1) = SGR_PARAMS[eps]
    H = dgd_ext.shape[-2] - 2 * BORDER
    W = dgd_ext.shape[-1] - 2 * BORDER
    x = jnp.asarray(dgd_ext).astype(jnp.int32)
    dgd = x[..., BORDER:BORDER + H, BORDER:BORDER + W]
    u = dgd << SGRPROJ_RST_BITS
    v = u << SGRPROJ_PRJ_BITS
    if r0 == 0:
        xq0, xq1 = 0, (1 << SGRPROJ_PRJ_BITS) - xqd1
    elif r1 == 0:
        xq0, xq1 = xqd0, 0
    else:
        xq0 = xqd0
        xq1 = (1 << SGRPROJ_PRJ_BITS) - xq0 - xqd1
    if r0 > 0:
        flt0 = _sgr_filter_r2(x, s0, bit_depth)
        v = v + xq0 * (flt0 - u)
    if r1 > 0:
        flt1 = _sgr_filter_r1(x, s1, bit_depth)
        v = v + xq1 * (flt1 - u)
    w = _rpot(v, SGRPROJ_PRJ_BITS + SGRPROJ_RST_BITS)
    return jnp.clip(w, 0, (1 << bit_depth) - 1)


# --------------------------------------------------------------------- #
# Wiener
# --------------------------------------------------------------------- #

FILTER_BITS = 7
WIENER_ROUND0 = 3


def wiener_filter(src_ext, filter_x, filter_y, bd: int = 8):
    """Wiener restoration of the interior of src_ext [..., h+6, w+6]
    (3-pixel borders) with 7-tap filters (filter_x/y = 8-tap kernels whose
    tap 7 is 0 and center tap includes the +128 add-src term)."""
    x = jnp.asarray(src_ext).astype(jnp.int32)
    H = x.shape[-2] - 2 * BORDER
    W = x.shape[-1] - 2 * BORDER
    round1 = 2 * FILTER_BITS - WIENER_ROUND0

    # horizontal: rows -3..h+3, taps over cols
    fx = jnp.asarray(filter_x)
    hsum = None
    for k in range(7):
        t = fx[k] * x[..., :, k:k + W]
        hsum = t if hsum is None else hsum + t
    center = x[..., :, 3:3 + W]
    hsum = hsum + (center << FILTER_BITS) + (1 << (bd + FILTER_BITS - 1))
    limit = (1 << (bd + 1 + FILTER_BITS - WIENER_ROUND0)) - 1
    im = jnp.clip(_rpot(hsum, WIENER_ROUND0), 0, limit)

    fy = jnp.asarray(filter_y)
    vsum = None
    for k in range(7):
        t = fy[k] * im[..., k:k + H, :]
        vsum = t if vsum is None else vsum + t
    vcenter = im[..., 3:3 + H, :]
    vsum = vsum + (vcenter << FILTER_BITS) - (1 << (bd + round1 - 1))
    return jnp.clip(_rpot(vsum, round1), 0, (1 << bd) - 1)

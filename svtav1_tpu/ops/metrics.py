"""Batched distortion / analysis metrics (SAD, SSE, variance, satd).

Replaces the reference's SAD/variance RTCD families
(Encoder/ASM_*/sad*, variance*; SURVEY.md §2.8) with jnp reductions that XLA
maps onto the VPU; the block-matching shapes (one query against many
candidate positions) become a single batched tensor op — the building block
for HME/ME (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sad(a, b):
    """Sum of absolute differences over the last two axes."""
    return jnp.sum(jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)),
                   axis=(-1, -2))


def sse(a, b):
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.sum(d * d, axis=(-1, -2))


def variance(a):
    """n·variance over the last two axes: sse - sum²/n, like the reference
    variance kernels (Encoder/ASM_*/variance*).

    Exact int32 math without int64 (which JAX silently truncates to int32
    unless x64 is enabled): every intermediate is computed mod 2^32 — sum
    of squares wraps, and sum²//n is decomposed with s = q·n + r (n = pixel
    count, a power of two) so s²//n = q²·n + 2·q·r + r²//n holds exactly
    mod 2^32.  The wrapped difference equals the true result whenever the
    true result < 2^31: all 8-bit blocks up to 128x128, 10-bit up to 64x64,
    12-bit up to 16x16 — the full range ME/TF/variance-boost use."""
    x = a.astype(jnp.int32)
    n = a.shape[-1] * a.shape[-2]
    k = n.bit_length() - 1
    assert n == 1 << k, "block pixel count must be a power of two"
    s = jnp.sum(x, axis=(-1, -2))                      # ≤ 2^26 — exact
    ss = jnp.sum(x * x, axis=(-1, -2))                 # mod 2^32 (wraps)
    q, r = s >> k, s & (n - 1)
    s2n = (q * q) * n + 2 * q * r + (r * r) // n       # s²//n mod 2^32
    return ss - s2n


def hadamard_satd(block):
    """SATD via 2D Hadamard transform (reference: hadamard/satd kernels).
    block [..., n, n] with n in {4, 8, 16, 32} (power of two)."""
    x = block.astype(jnp.int32)

    # log2(n) butterfly passes of (even+odd, even-odd)
    def hadamard(v):
        m = v.shape[-1]
        step = 1
        while step < m:
            v = v.reshape(v.shape[:-1] + (m // (2 * step), 2, step))
            a = v[..., 0, :]
            b = v[..., 1, :]
            v = jnp.concatenate([a + b, a - b], axis=-1)
            v = v.reshape(v.shape[:-2] + (m,))
            step *= 2
        return v

    y = hadamard(x)
    y = hadamard(jnp.swapaxes(y, -1, -2))
    return jnp.sum(jnp.abs(y), axis=(-1, -2))


def sad_field(query, candidates):
    """One query block vs many candidates: query [..., h, w],
    candidates [..., n, h, w] → [..., n] SADs (the ME search primitive)."""
    return jnp.sum(jnp.abs(candidates.astype(jnp.int32) -
                           query[..., None, :, :].astype(jnp.int32)),
                   axis=(-1, -2))


def ssim_plane(a, b, peak: int = 255) -> float:
    """Mean SSIM over 8x8 windows stepped by 4 — the reference's
    aom_ssim2 evaluation used by its --stat-report SSIM numbers
    (EbPsnr.c / aom_dsp ssim.c: ssim_8x8 grid, stride 4, standard
    k1=0.01/k2=0.03 constants scaled to the bit-depth peak)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    h, w = a.shape
    if h < 8 or w < 8:
        return 1.0
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2

    def win_sums(x):
        # [nh, nw] sums of 8x8 windows at stride 4 via cumsum
        ii = np.zeros((h + 1, w + 1))
        ii[1:, 1:] = x.cumsum(0).cumsum(1)
        r = np.arange(0, h - 7, 4)
        c = np.arange(0, w - 7, 4)
        return (ii[np.ix_(r + 8, c + 8)] - ii[np.ix_(r, c + 8)] -
                ii[np.ix_(r + 8, c)] + ii[np.ix_(r, c)])

    n = 64.0
    sa, sb = win_sums(a), win_sums(b)
    saa, sbb = win_sums(a * a), win_sums(b * b)
    sab = win_sums(a * b)
    ma, mb = sa / n, sb / n
    va = saa / n - ma * ma
    vb = sbb / n - mb * mb
    cov = sab / n - ma * mb
    ssim = ((2 * ma * mb + c1) * (2 * cov + c2) /
            ((ma * ma + mb * mb + c1) * (va + vb + c2)))
    return float(ssim.mean())


def downsample2x(plane):
    """2x decimation by averaging (picture-analysis pyramid,
    EbPictureAnalysisProcess.c:1825)."""
    x = plane.astype(jnp.int32)
    return (x[..., ::2, ::2] + x[..., ::2, 1::2] + x[..., 1::2, ::2] +
            x[..., 1::2, 1::2] + 2) >> 2

"""Quantization / dequantization.

Dequantization is normative (AV1 spec §7.13.3; reference behavior
/root/reference/Source/Lib/Decoder/Codec/EbDecInverseQuantize.c:120-180):
    dq = (abs(level) * dqv) & 0xffffff, >> tx_scale_shift, re-signed,
    clamped to ±2^(bd+7).

Forward quantization is an encoder choice; we use a deadzone quantizer with
the reference's rounding factor (48/128 of the step) which reproduces
libaom/SVT-AV1 rate-distortion behavior closely.  All ops are batched
elementwise over whole coefficient tensors (VPU-friendly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import tables as tbl


def _dqv_map(tx_size: int, dc: int, ac: int, shape):
    """Per-position dequant value: dc at (0,0), ac elsewhere."""
    m = np.full(shape, ac, np.int32)
    m[..., 0, 0] = dc
    return m


def _dqv_traced(dc, ac, h, w):
    """Per-position dequant map from traced dc/ac scalars."""
    m = jnp.full((h, w), ac, jnp.int32)
    return m.at[0, 0].set(dc)


def quantize_dq(coeffs, tx_size: int, dc, ac, bd: int = 8):
    """Deadzone quantization with traced dc/ac dequant steps (so per-frame
    qindex changes don't recompile the enclosing jit)."""
    shift = tbl.tx_scale_shift(tx_size)
    h, w = coeffs.shape[-2], coeffs.shape[-1]
    dqv = _dqv_traced(dc, ac, h, w)
    scaled = jnp.abs(coeffs).astype(jnp.int32) << shift
    rounding = (dqv * 48) >> 7
    level = (scaled + rounding) // dqv
    level = jnp.clip(level, 0, (1 << 15) - 1)
    return jnp.sign(coeffs) * level


def dequantize_dq(levels, tx_size: int, dc, ac, bd: int = 8):
    """Normative dequantization with traced dc/ac steps."""
    shift = tbl.tx_scale_shift(tx_size)
    h, w = levels.shape[-2], levels.shape[-1]
    dqv = _dqv_traced(dc, ac, h, w)
    absl = jnp.abs(levels).astype(jnp.int32)
    v = (absl * dqv) & 0xFFFFFF
    v = v >> shift
    v = jnp.sign(levels) * v
    lim = 1 << (bd + 7)
    return jnp.clip(v, -lim, lim - 1)


@partial(jax.jit, static_argnames=("tx_size", "qindex", "bd"))
def quantize(coeffs, tx_size: int, qindex: int, bd: int = 8):
    """Deadzone quantization of transform coefficients [..., h, w] → levels."""
    dc, ac = tbl.qindex_to_dq(qindex, bd)
    return quantize_dq(coeffs, tx_size, jnp.int32(dc), jnp.int32(ac), bd)


@partial(jax.jit, static_argnames=("tx_size", "qindex", "bd"))
def dequantize(levels, tx_size: int, qindex: int, bd: int = 8):
    """Normative dequantization of levels [..., h, w] → coefficients."""
    dc, ac = tbl.qindex_to_dq(qindex, bd)
    return dequantize_dq(levels, tx_size, jnp.int32(dc), jnp.int32(ac), bd)


def quantize_batch(coeffs, n: int, qindex: int, bd: int = 8):
    sq = {4: 0, 8: 1, 16: 2, 32: 3, 64: 4}[n]
    return quantize(coeffs, sq, qindex, bd)


def dequantize_batch(levels, n: int, qindex: int, bd: int = 8):
    sq = {4: 0, 8: 1, 16: 2, 32: 3, 64: 4}[n]
    return dequantize(levels, sq, qindex, bd)


# ---- coefficient optimization (encoder-side, non-normative) ----------- #

@partial(jax.jit, static_argnames=("tx_size", "bd"))
def _txg_probe(tx_size: int, bd: int):
    """Pixel-SSE per unit coefficient-SSE for a tx size (the integer
    transforms are not orthonormal; this gain converts coefficient-domain
    error to pixel-domain SSE for RD decisions)."""
    from .transforms import inv_txfm2d
    from ..spec.txfm import DCT_DCT
    h, w = tbl.TX_H[tx_size], tbl.TX_W[tx_size]
    c = jnp.zeros((1, h, w), jnp.int32).at[0, h // 4, w // 4].set(1024)
    r = inv_txfm2d(c, tx_size, DCT_DCT, bd)
    return jnp.sum(r.astype(jnp.float32) ** 2) / (1024.0 * 1024.0)


_TXG_CACHE = {}


def tx_gain(tx_size: int, bd: int = 8) -> float:
    if (tx_size, bd) not in _TXG_CACHE:
        # may be called while tracing an enclosing jit (tx_size is
        # static there) — force eager evaluation of the probe
        with jax.ensure_compile_time_eval():
            _TXG_CACHE[(tx_size, bd)] = float(_txg_probe(tx_size, bd))
    return _TXG_CACHE[(tx_size, bd)]


def quantize_dq_opt(coeffs, tx_size: int, dc, ac, lam, bd: int = 8):
    """Deadzone quantization + one-step coefficient optimization: each
    level considers stepping down by 1 (including to zero) when the
    distortion increase is cheaper than the estimated rate saving — the
    vectorized one-pass analogue of the reference's coefficient
    optimization (EbFullLoop.c:1462 svt_aom_quantize_inv_quantize RDOQ
    path).  lam = pixel-domain RD lambda (traced); the coefficient → pixel
    error conversion uses the tx gain probe (tx_gain)."""
    shift = tbl.tx_scale_shift(tx_size)
    g = tx_gain(tx_size, bd)           # pixel SSE per unit coeff SSE
    h, w = coeffs.shape[-2], coeffs.shape[-1]
    dqv = _dqv_traced(dc, ac, h, w)
    scaled = jnp.abs(coeffs).astype(jnp.int32) << shift
    rounding = (dqv * 48) >> 7
    l0 = jnp.minimum((scaled + rounding) // dqv, (1 << 15) - 1)
    # scaled-domain reconstruction errors at l0 and l0-1
    e0 = (scaled - l0 * dqv).astype(jnp.float32)
    e1 = e0 + dqv.astype(jnp.float32)
    # pixel-domain distortion increase of stepping the level down
    dd = (e1 * e1 - e0 * e0) * (g / float(4 ** shift))
    l0f = jnp.maximum(l0, 1).astype(jnp.float32)
    # marginal rate of the current level (calibrated _resid_bits shape):
    # a vanishing coefficient also saves its nnz term
    dr = jnp.where(l0 == 1, 2.43 + 1.83,
                   1.83 * (jnp.log2(1.0 + l0f) - jnp.log2(l0f)))
    down = (l0 > 0) & (dd < lam * dr)
    lev = l0 - down.astype(jnp.int32)
    return jnp.sign(coeffs) * lev

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

"""Compact device->host transfer of quantized coefficients.

The encode pipeline is device-compute-light but transfer-heavy: a 4-frame
1080p batch's dense levels + recon is ~100MB and the TPU tunnel moves
~20MB/s device->host, so the wire format IS the e2e budget.  (The
reference never faces this: its EncDec and EC share one address space,
EbEncDecProcess.c; here the split is device/host, so the wire format is
part of the architecture.)

Format v2 (round 5).  Every AV1 level fits int16 (quantize clamps to
2^15-1), and almost every AC level fits int8; only the DC and a few ACs
overflow a byte.  So the wire is:

  round 1:  eob [nb] int32 (tiny) — picks the scan-prefix length K
  round 2:  dc16 [nb] int16                      (scan position 0)
            p8   [nb, K-1] int8                  (low bytes, positions 1..K-1)
            hi_idx/hi_val [M] sparse high bytes  (the few |v| > 127 ACs)
            rows16 [m, n] int16                  (full rows of eob>K blocks)

Worst-case content (dense noise) degrades to one int8 plane + sparse
highs — 4x smaller than the dense int32 fetch, with no scan gather on
device (the K=n path ships the flat layout directly).  Typical content
fits K=64..128 → ~30x smaller.

Round-4's scan_pack/fetch_scanned API is gone: callers hand the dense
levels tensor straight to fetch_levels (no 33MB scan-order copy, no 80ms
device gather per plane).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import tables as tbl

# static prefix ladder (entries < n are scan-prefix fetches; n itself
# ships the flat layout with no gather)
_K_CHOICES = (64, 128, 256)
_M_HI = 4096          # sparse high-byte capacity per fetch


def _scan_np(tx_size: int, tx_type: int) -> np.ndarray:
    return tbl.scan(tx_size, tx_type).astype(np.int32)


@partial(jax.jit, static_argnames=("tx_size", "tx_type"))
def _eob_jit(levels, tx_size: int, tx_type: int):
    """Per-block eob (last nonzero scan position + 1) — elementwise,
    no scan-order materialization."""
    scan = _scan_np(tx_size, tx_type)
    n = scan.shape[0]
    inv = np.zeros(n, np.int32)
    inv[scan] = np.arange(n, dtype=np.int32)         # flat idx -> scan pos
    flat = levels.reshape(levels.shape[:-2] + (-1,))
    pos1 = jnp.asarray(inv) + 1
    return jnp.max(jnp.where(flat != 0, pos1, 0), axis=-1).astype(jnp.int32)


def _split8(v):
    """int16-range v -> (low int8, high) with v == low + (high << 8)."""
    low = ((v + 128) & 255) - 128
    return low, (v - low) >> 8


@partial(jax.jit, static_argnames=("tx_size", "tx_type", "k"))
def _pack_prefix(levels, tx_size: int, tx_type: int, k: int):
    """(dc16, p8, hi_idx, hi_val, hi_cnt) for scan positions [0, k)."""
    scan = _scan_np(tx_size, tx_type)
    n = scan.shape[0]
    flat = levels.reshape(-1, flat_n(levels))
    dc16 = flat[:, scan[0]].astype(jnp.int16)
    if k >= n:
        # flat layout, no gather; position 0 low byte is redundant w/ dc16
        body = flat
    else:
        body = flat[:, scan[1:k]]
    low, hi = _split8(body)
    p8 = low.astype(jnp.int8)
    hi_flat = hi.reshape(-1)
    if k >= n:
        # don't re-ship the dc high byte through the sparse channel
        hi_flat = hi_flat.at[jnp.arange(flat.shape[0]) * n + scan[0]].set(0)
    cnt = jnp.sum(hi_flat != 0).astype(jnp.int32)
    idx = jnp.nonzero(hi_flat, size=_M_HI, fill_value=0)[0].astype(jnp.int32)
    val = hi_flat[idx].astype(jnp.int16)
    val = jnp.where(jnp.arange(_M_HI) < cnt, val, 0)
    return dc16, p8, idx, val, cnt


@partial(jax.jit, static_argnames=("tx_size", "tx_type", "k"))
def _pack_prefix16(levels, tx_size: int, tx_type: int, k: int):
    """Fallback when the sparse high-byte channel overflows: int16 body."""
    scan = _scan_np(tx_size, tx_type)
    n = scan.shape[0]
    flat = levels.reshape(-1, flat_n(levels))
    if k >= n:
        return flat.astype(jnp.int16)
    return flat[:, scan[:k]].astype(jnp.int16)


@partial(jax.jit, static_argnames=("m", "tx_size", "tx_type"))
def _rows16(levels, idx, m: int, tx_size: int, tx_type: int):
    """Full scan-order rows (int16) of the eob-overflow blocks."""
    scan = _scan_np(tx_size, tx_type)
    flat = levels.reshape(-1, flat_n(levels))
    return flat[idx][:, scan].astype(jnp.int16)


def flat_n(levels) -> int:
    return levels.shape[-1] * levels.shape[-2]


def fetch_levels(levels, tx_size: int, tx_type: int,
                 shape2d: tuple) -> np.ndarray:
    """Adaptive fetch of a device levels tensor [..., h, w] -> host dense
    int32 array of the same shape (shape2d = (h, w) of the tx)."""
    lead = levels.shape[:-2]
    n = flat_n(levels)
    eob_np = np.asarray(_eob_jit(levels, tx_size, tx_type)).reshape(-1)
    nb = eob_np.size
    k = n
    ovf = np.zeros(0, np.int64)
    for kc in _K_CHOICES:
        if kc >= n:
            break
        over = np.nonzero(eob_np > kc)[0]
        if over.size <= max(8, nb // 32):
            k, ovf = kc, over
            break
    dc16, p8, hi_idx, hi_val, hi_cnt = _pack_prefix(
        levels, tx_size, tx_type, k)
    # dispatch the (rare) row-overflow gather before blocking on fetches
    rows = None
    if ovf.size:
        m = 1 << max(3, int(np.ceil(np.log2(ovf.size))))
        pad = np.zeros(m, np.int32)
        pad[:ovf.size] = ovf
        rows = _rows16(levels, jnp.asarray(pad), m, tx_size, tx_type)
    cnt = int(hi_cnt)
    scan = _scan_np(tx_size, tx_type)
    out = np.zeros((nb, n), np.int32)
    if cnt > _M_HI:
        body = np.asarray(_pack_prefix16(levels, tx_size, tx_type, k)
                          ).astype(np.int32)
        if k >= n:
            out[:] = body
        else:
            out[:, scan[:k]] = body
            out[:, scan[0]] = np.asarray(dc16)
    else:
        p8_np = np.asarray(p8).astype(np.int32)
        if cnt:
            flat_hi = np.zeros(p8_np.size, np.int32)
            idx = np.asarray(hi_idx)[:cnt]
            val = np.asarray(hi_val)[:cnt].astype(np.int32)
            np.add.at(flat_hi, idx, val << 8)
            p8_np += flat_hi.reshape(p8_np.shape)
        if k >= n:
            out[:] = p8_np
        else:
            out[:, scan[1:k]] = p8_np
        out[:, scan[0]] = np.asarray(dc16)
    if rows is not None:
        out[ovf[:, None], scan[None, :]] = np.asarray(rows)[:ovf.size]
    return out.reshape(tuple(lead) + tuple(shape2d))

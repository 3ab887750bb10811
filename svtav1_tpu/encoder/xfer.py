"""Compact device->host transfer of quantized coefficients.

The encode pipeline is device-compute-light but transfer-heavy: a 4-frame
1080p batch's dense levels + recon is ~100MB, and the TPU tunnel moves
~30MB/s device->host, so the dense fetch (3.4s/batch) — not the wavefront
(tens of ms) and not the native entropy coder (41ms/frame) — was the whole
e2e budget (round-3 bench: 1.25 fps).

Fix: the device emits levels in SCAN order plus a per-block EOB.  The host
fetches the tiny EOB array, picks a small static prefix K that covers all
but a handful of blocks, fetches [..., :K] as int16 for everyone, and
dense-fetches only the overflow blocks through a device-side gather.
Typical q=100 1080p content fits in K=64..128 of 1024 — a ~15-30x cut.
(The reference never faces this: its EncDec and EC share one address
space, EbEncDecProcess.c; here the split is device/host, so the wire
format is part of the architecture.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import tables as tbl

# static prefix ladder; full length is used past the last entry
_K_CHOICES = (32, 64, 128, 256, 512)


@partial(jax.jit, static_argnames=("tx_size", "tx_type"))
def scan_pack(levels, tx_size: int, tx_type: int):
    """levels [..., bh_tx, bw_tx] int32 -> (scanned [..., n] int32,
    eob [...] int32).  scanned[i] = coefficient at scan position i."""
    scan = jnp.asarray(tbl.scan(tx_size, tx_type).astype(np.int32))
    n = int(scan.shape[0])
    flat = levels.reshape(levels.shape[:-2] + (-1,))
    sc = flat[..., scan]
    nz = sc != 0
    eob = jnp.where(nz.any(-1), n - jnp.argmax(nz[..., ::-1], axis=-1), 0)
    return sc, eob.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def _prefix8(scanned, k: int):
    """First k scan positions as int8 + each block's max |level| (the
    host dense-fetches blocks whose levels overflow int8 or whose eob
    exceeds k)."""
    flat = scanned.reshape(-1, scanned.shape[-1])
    mx = jnp.max(jnp.abs(flat), axis=-1)
    return flat[:, :k].astype(jnp.int8), mx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("m",))
def _take_blocks(scanned, idx, m: int):
    flat = scanned.reshape(-1, scanned.shape[-1])
    return flat[idx]                                    # [m, n] int32


def fetch_scanned(scanned, eob) -> np.ndarray:
    """Adaptive two-tier transfer; returns the full scanned array
    [..., n] int32 on host (dense layout, zeros past each block's eob)."""
    n = int(scanned.shape[-1])
    eob_np = np.asarray(eob).reshape(-1)                # tiny fetch
    nb = eob_np.size
    k = n
    for kc in _K_CHOICES:
        if kc >= n:
            break
        if int((eob_np > kc).sum()) <= max(8, nb // 32):
            k = kc
            break
    p8, mx = _prefix8(scanned, min(k, n))
    p8 = np.asarray(p8)
    mx = np.asarray(mx)
    sc = np.zeros((nb, n), np.int32)
    sc[:, :p8.shape[1]] = p8
    ovf = np.nonzero((eob_np > k) | (mx > 127))[0]
    if ovf.size > nb // 4:
        return np.asarray(scanned).reshape(nb, n)       # mostly dense
    if ovf.size:
        m = 1 << max(3, int(np.ceil(np.log2(ovf.size))))
        idx = np.zeros(m, np.int32)
        idx[:ovf.size] = ovf
        blocks = np.asarray(_take_blocks(scanned, jnp.asarray(idx), m))
        sc[ovf] = blocks[:ovf.size]
    return sc


def unscan(sc: np.ndarray, tx_size: int, tx_type: int,
           shape2d: tuple, lead_shape: tuple) -> np.ndarray:
    """Host: scan-order [nb, n] -> dense [*lead_shape, h, w] int32."""
    scan = tbl.scan(tx_size, tx_type).astype(np.int32)
    full = np.zeros(sc.shape, np.int32)
    full[..., scan] = sc
    return full.reshape(tuple(lead_shape) + tuple(shape2d))


def fetch_levels(scanned, eob, tx_size: int, tx_type: int,
                 shape2d: tuple) -> np.ndarray:
    """Convenience wrapper: two-tier fetch + unscan to the dense layout."""
    lead = scanned.shape[:-1]
    return unscan(fetch_scanned(scanned, eob), tx_size, tx_type,
                  shape2d, lead)

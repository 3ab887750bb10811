"""Motion-compensated temporal filtering (MCTF) for anchor pictures.

Maps the reference's alt-ref/key-frame temporal filter
(EbTemporalFiltering.c:250-277 svt_av1_init_temporal_filtering and the
apply path: block ME against each neighbour source picture, per-pixel
squared-difference window statistics, exponential decay weights,
weighted average into the filtered anchor) onto one jitted TPU pass:

- neighbours ride the batch axis of the existing HME/ME pyramid
  (encoder/me.py), so every 32x32 block of every neighbour is searched
  simultaneously;
- motion-compensated alignment reuses the normative subpel MC kernel
  (ops/mc.py) — the same gather/convolve shape the inter path compiles;
- the per-pixel decay weight uses a 5x5 windowed mean of squared
  residuals (box filter via two cumsum passes) with a q-scaled decay,
  the same statistic libaom/SVT compute per plane;
- the center frame carries a fixed anchor weight, neighbours get
  per-pixel weights in [0, TF_WEIGHT_SCALE].

Encoder-side only: the output replaces the anchor SOURCE before normal
encoding, so conformance is unaffected.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mc import MV_PRED_PAD, pad_plane, predict_inter_blocks

TF_WEIGHT_SCALE = 16.0       # center (self) weight; neighbour max weight
TF_WINDOW = 5                # squared-error smoothing window


def _box5(x):
    """5x5 box mean with edge clamping ([..., H, W] float32)."""
    pad = TF_WINDOW // 2
    nd = x.ndim
    xp = jnp.pad(x, [(0, 0)] * (nd - 2) + [(pad, pad), (pad, pad)],
                 mode="edge")
    win = (1,) * (nd - 2) + (TF_WINDOW, TF_WINDOW)
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, win, (1,) * nd,
                              "valid")
    return s / (TF_WINDOW * TF_WINDOW)


def _blocks_to_plane(blocks, bh: int, bw: int, bs: int):
    """[K, N, bs, bs] raster blocks -> [K, bh*bs, bw*bs]."""
    K = blocks.shape[0]
    return (blocks.reshape(K, bh, bw, bs, bs)
            .transpose(0, 1, 3, 2, 4)
            .reshape(K, bh * bs, bw * bs))


@jax.jit
def _tf_blend(center, aligned, decay, self_w):
    """center [H,W] f32; aligned [K,H,W] f32; per-pixel weights from the
    5x5 windowed MSE with exponential decay."""
    err = (aligned - center[None]) ** 2
    d = _box5(err)
    w = TF_WEIGHT_SCALE * jnp.exp(-d / decay)
    num = self_w * center + (w * aligned).sum(0)
    den = self_w + w.sum(0)
    return num / den


def temporal_filter_plane(center, neighbors, mv8, bs: int, ss: int,
                          frame_h: int, frame_w: int, decay: float,
                          bd: int = 8):
    """center [H,W]; neighbors [K,H,W] (plane-res); mv8 [K,N,2] luma
    1/8-pel MVs per 32x32-luma block.  Returns filtered float32 plane."""
    K = neighbors.shape[0]
    H, W = center.shape
    pbs = bs >> ss
    bh, bw = H // pbs, W // pbs
    N = bh * bw
    y0 = (jnp.arange(N) // bw * pbs)[None].repeat(K, 0)
    x0 = (jnp.arange(N) % bw * pbs)[None].repeat(K, 0)
    padded = pad_plane(neighbors.astype(jnp.int32))
    pred = predict_inter_blocks(padded, y0, x0, mv8, frame_h, frame_w,
                                pbs, ss, bd)
    aligned = _blocks_to_plane(pred, bh, bw, pbs).astype(jnp.float32)
    self_w = jnp.float32(TF_WEIGHT_SCALE)
    return _tf_blend(center.astype(jnp.float32), aligned,
                     jnp.float32(decay), self_w)


def tf_decay(qindex: int, n_neighbors: int) -> float:
    """q-scaled squared-error decay (reference: adjust_filter_strength —
    stronger filtering at higher q / more distant quality targets)."""
    q = max(1.0, qindex / 4.0)
    base = 2.0 * q
    # more neighbours -> each contributes at slightly lower strength
    return float(base * (1.0 + 0.1 * max(0, n_neighbors - 2)))


def temporal_filter_frame(center, neighbors, qindex: int, bd: int = 8):
    """center (y, u, v) uint8/uint16 arrays; neighbors list of planes
    tuples.  Returns filtered (y, u, v) same dtype, or center unchanged
    when no neighbours are supplied."""
    if not neighbors:
        return center
    from ..encoder.me import motion_estimate

    cy, cu, cv = (np.asarray(p) for p in center)
    th, W = cy.shape
    # SB-pad odd heights (source-side filter — output is cropped back)
    ph = -(-th // 64) * 64
    if ph != th:
        from ..encoder.geometry import pad_plane_bottom
        cy = pad_plane_bottom(cy, ph)
        cu = pad_plane_bottom(cu, ph // 2)
        cv = pad_plane_bottom(cv, ph // 2)
        neighbors = [tuple(pad_plane_bottom(np.asarray(p), ph >> s)
                           for p, s in zip(n, (0, 1, 1)))
                     for n in neighbors]
    H = ph
    K = len(neighbors)
    ny = jnp.stack([jnp.asarray(n[0]) for n in neighbors])
    nu = jnp.stack([jnp.asarray(n[1]) for n in neighbors])
    nv = jnp.stack([jnp.asarray(n[2]) for n in neighbors])
    cyj = jnp.asarray(cy)
    # one batched ME: all neighbours at once (center tiled on batch)
    mv8, _ = motion_estimate(jnp.broadcast_to(cyj, (K, H, W)), ny, 32)
    mv8 = mv8.reshape(K, -1, 2)
    decay = tf_decay(qindex, K)
    fy = temporal_filter_plane(cyj, ny, mv8, 32, 0, H, W, decay, bd)
    fu = temporal_filter_plane(jnp.asarray(cu), nu, mv8, 32, 1, H, W,
                               decay * 0.5, bd)
    fv = temporal_filter_plane(jnp.asarray(cv), nv, mv8, 32, 1, H, W,
                               decay * 0.5, bd)
    peak = (1 << bd) - 1
    dt = cy.dtype
    out = tuple(np.asarray(jnp.clip(jnp.round(p), 0, peak)).astype(dt)
                for p in (fy, fu, fv))
    if ph != th:
        out = (out[0][:th], out[1][:th // 2], out[2][:th // 2])
    return out

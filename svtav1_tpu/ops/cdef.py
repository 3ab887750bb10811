"""Batched CDEF (Constrained Directional Enhancement Filter) — spec §7.15.

Reference behavior: /root/reference/Source/Lib/Common/Codec/EbCdef.c
(svt_aom_cdef_find_dir_c :151, svt_cdef_filter_block_c :253).

TPU-native formulation:
- direction search: the 8 directional partial-sum projections become one
  [64 → 8x15] indicator matmul per block batch (MXU), costs reduced with the
  normative div_table weights;
- the filter: 16 fixed tap offsets per direction — a gather over a padded
  plane + constrain() arithmetic, fully vectorized over all 8x8 blocks.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

CDEF_VERY_LARGE = 0x7F7F

# (dy, dx) tap offsets per direction (Cdef_Directions, spec §7.15.3)
DIRECTIONS = [
    [(-1, 1), (-2, 2)], [(0, 1), (-1, 2)], [(0, 1), (0, 2)],
    [(0, 1), (1, 2)], [(1, 1), (2, 2)], [(1, 0), (2, 1)],
    [(1, 0), (2, 0)], [(1, 0), (2, -1)],
]

PRI_TAPS = [[4, 2], [3, 3]]
SEC_TAPS = [[2, 1], [2, 1]]

_DIV_TABLE = np.array([0, 840, 420, 280, 210, 168, 140, 120, 105], np.int64)


@lru_cache(maxsize=None)
def _partial_mats():
    """[8, 64, 15] indicator matrices: partial[d] = M_d.T @ x_flat."""
    M = np.zeros((8, 64, 15), np.int32)
    for i in range(8):
        for j in range(8):
            f = i * 8 + j
            M[0, f, i + j] = 1
            M[1, f, i + j // 2] = 1
            M[2, f, i] = 1
            M[3, f, 3 + i - j // 2] = 1
            M[4, f, 7 + i - j] = 1
            M[5, f, 3 - i // 2 + j] = 1
            M[6, f, j] = 1
            M[7, f, i // 2 + j] = 1
    return M


def find_dir(blocks, coeff_shift: int = 0):
    """blocks [B, 8, 8] uint16/int32 → (dir [B], var [B]) per spec."""
    x = (blocks.astype(jnp.int32) >> coeff_shift) - 128
    flat = x.reshape(x.shape[:-2] + (64,))
    M = jnp.asarray(_partial_mats())                      # [8, 64, 15]
    partial = jnp.einsum("bf,dfk->bdk", flat, M)          # [B, 8, 15]
    # int32 wraparound matches the reference C exactly (cost is int32 there)
    p2 = partial.astype(jnp.int32) ** 2

    div = jnp.asarray(_DIV_TABLE)
    cost = []
    for d in (0, 4):
        c = jnp.sum(p2[:, d, :7] * div[1:8][None, :], axis=-1) \
            + jnp.sum(p2[:, d, 8:15] * div[1:8][None, ::-1], axis=-1) \
            + p2[:, d, 7] * div[8]
        cost.append(c)
    c2 = jnp.sum(p2[:, 2, :8], axis=-1) * div[8]
    c6 = jnp.sum(p2[:, 6, :8], axis=-1) * div[8]
    odd = []
    for d in (1, 3, 5, 7):
        c = jnp.sum(p2[:, d, 3:8], axis=-1) * div[8]
        c = c + jnp.sum((p2[:, d, 0:3] + p2[:, d, 8:11][:, ::-1]) *
                        div[2:8:2][None, :], axis=-1)
        odd.append(c)
    costs = jnp.stack([cost[0], odd[0], c2, odd[1], cost[1], odd[2], c6,
                       odd[3]], axis=-1)                  # [B, 8]
    best_dir = jnp.argmax(costs, axis=-1).astype(jnp.int32)
    best_cost = jnp.max(costs, axis=-1)
    ortho = jnp.take_along_axis(costs, ((best_dir + 4) & 7)[:, None],
                                axis=-1)[:, 0]
    var = ((best_cost - ortho) >> 10).astype(jnp.int32)
    return best_dir, var


def _constrain(diff, strength: int, damping: int):
    if strength == 0:
        return jnp.zeros_like(diff)
    # shift = max(0, damping - get_msb(strength))
    shift = max(0, damping - (int(strength).bit_length() - 1))
    ad = jnp.abs(diff)
    return jnp.sign(diff) * jnp.minimum(
        ad, jnp.maximum(0, strength - (ad >> shift)))


def cdef_filter_plane(padded, dirs, pri_strength: int, sec_strength: int,
                      pri_damping: int, sec_damping: int,
                      coeff_shift: int = 0):
    """Filter all 8x8 blocks of a plane.

    padded: [H+4, W+4] int32 with CDEF_VERY_LARGE outside the frame
            (2-pixel border); interior = pre-CDEF (post-deblock) pixels.
    dirs:   [H//8, W//8] int32 directions per block (from find_dir).
    Returns the filtered [H, W] plane (int32).
    """
    H = padded.shape[-2] - 4
    W = padded.shape[-1] - 4
    x = padded[..., 2:2 + H, 2:2 + W]
    pri_idx = (pri_strength >> coeff_shift) & 1
    pri_taps = PRI_TAPS[pri_idx]
    sec_taps = SEC_TAPS[pri_idx]

    # per-pixel direction map
    dmap = jnp.repeat(jnp.repeat(dirs, 8, axis=-2), 8, axis=-1)   # [H, W]

    def shifted(dy, dx):
        return padded[..., 2 + dy:2 + dy + H, 2 + dx:2 + dx + W]

    sum_ = jnp.zeros_like(x)
    mx = x
    mn = x
    for d in range(8):
        sel = dmap == d
        for k in range(2):
            contrib = jnp.zeros_like(x)
            cmx, cmn = x, x
            # primary taps along d
            for sgn in (1, -1):
                dy, dx = DIRECTIONS[d][k]
                p = shifted(sgn * dy, sgn * dx)
                if pri_strength:
                    contrib = contrib + pri_taps[k] * _constrain(
                        p - x, pri_strength, pri_damping)
                cmx = jnp.maximum(cmx, jnp.where(p == CDEF_VERY_LARGE, cmx, p))
                cmn = jnp.minimum(cmn, p)
            # secondary taps along d±2
            for dd in ((d + 2) & 7, (d - 2) & 7):
                for sgn in (1, -1):
                    dy, dx = DIRECTIONS[dd][k]
                    s = shifted(sgn * dy, sgn * dx)
                    if sec_strength:
                        contrib = contrib + sec_taps[k] * _constrain(
                            s - x, sec_strength, sec_damping)
                    cmx = jnp.maximum(cmx,
                                      jnp.where(s == CDEF_VERY_LARGE, cmx, s))
                    cmn = jnp.minimum(cmn, s)
            sum_ = jnp.where(sel, sum_ + contrib, sum_)
            mx = jnp.where(sel, jnp.maximum(mx, cmx), mx)
            mn = jnp.where(sel, jnp.minimum(mn, cmn), mn)

    y = x + ((8 + sum_ - (sum_ < 0)) >> 4)
    return jnp.clip(y, mn, mx)


def pad_plane(plane) -> np.ndarray:
    """2-pixel CDEF_VERY_LARGE border around the frame."""
    H, W = plane.shape[-2], plane.shape[-1]
    out = np.full(plane.shape[:-2] + (H + 4, W + 4), CDEF_VERY_LARGE,
                  np.int32)
    out[..., 2:2 + H, 2:2 + W] = np.asarray(plane)
    return out

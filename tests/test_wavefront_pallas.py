"""Pallas wavefront kernel vs the XLA scan wavefront.

Selection ties can in principle break differently (float reduction
order), so the bar is: levels/recon IDENTICAL wherever the chosen
candidate agrees, and >=99% of blocks choose the same candidate.  In
practice runs here agree on every block.
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow      # interpret-mode compiles are minutes

from svtav1_tpu.encoder.intra_encoder import CAND_MODES
from svtav1_tpu.encoder.wavefront import encode_plane_wavefront
from svtav1_tpu.pallas.wavefront_kernel import encode_plane_wavefront_pl
from svtav1_tpu.spec.txfm import TX_16X16, TX_32X32


def _src(rng, B, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for b in range(B):
        f = np.clip(120 + 60 * np.sin((xx + 7 * b) / 17.0) +
                    40 * np.cos((yy + 3 * b) / 11.0) +
                    rng.randint(-6, 7, (h, w)), 0, 255)
        out.append(f)
    return np.stack(out).astype(np.uint8)


def _agree(ref, got, label):
    mi_r, lev_r, rec_r = [np.asarray(a) for a in ref]
    mi_g, lev_g, rec_g = [np.asarray(a) for a in got]
    same = mi_r == mi_g
    frac = same.mean()
    assert frac >= 0.99, f"{label}: only {frac:.4f} of modes agree"
    np.testing.assert_array_equal(lev_r[same], lev_g[same],
                                  err_msg=f"{label} levels")
    if frac == 1.0:
        np.testing.assert_array_equal(rec_r.astype(np.int32),
                                      rec_g.astype(np.int32),
                                      err_msg=f"{label} recon")


def test_luma_flat_kernel():
    rng = np.random.RandomState(0)
    src = _src(rng, 2, 128, 192)
    ref = encode_plane_wavefront(src, 32, TX_32X32, 100, CAND_MODES, 8)
    got = encode_plane_wavefront_pl(src, 32, TX_32X32, 100, CAND_MODES, 8,
                                    interpret=True)
    _agree(ref, got, "luma")


def test_luma_valid_h():
    rng = np.random.RandomState(1)
    src = _src(rng, 1, 128, 128)
    ref = encode_plane_wavefront(src, 32, TX_32X32, 120, CAND_MODES, 8,
                                 valid_h=100)
    got = encode_plane_wavefront_pl(src, 32, TX_32X32, 120, CAND_MODES, 8,
                                    valid_h=100, interpret=True)
    _agree(ref, got, "valid_h")


def test_chroma_paired_uv_tx():
    rng = np.random.RandomState(2)
    src = _src(rng, 4, 64, 96)          # 2 frames' U+V stacked
    ref = encode_plane_wavefront(src, 16, TX_16X16, 100, CAND_MODES, 8,
                                 paired=True, kf="uv", uv_tx=True)
    got = encode_plane_wavefront_pl(src, 16, TX_16X16, 100, CAND_MODES, 8,
                                    paired=True, kf="uv", uv_tx=True,
                                    interpret=True)
    _agree(ref, got, "chroma")

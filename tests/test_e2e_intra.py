"""E2E conformance: encode → decode with dav1d (via libavcodec) → recon must
match bit-exactly.  Same bar as the reference e2e suite (RefDecoder.cc)."""

import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

TOOLS = Path(__file__).parent.parent / "tools"
AV1DEC = TOOLS / "av1dec"


def _ensure_av1dec():
    if AV1DEC.exists():
        return True
    r = subprocess.run(
        f"gcc -O2 -o {AV1DEC} {TOOLS}/av1dec.c -lavformat -lavcodec -lavutil",
        shell=True, capture_output=True)
    return r.returncode == 0


pytestmark_slow = pytest.mark.slow
pytestmark = [pytestmark_slow, pytest.mark.skipif(not _ensure_av1dec(),
                                reason="no libavcodec available")]


def _synth(w, h, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(100 + 50 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0) +
                rng.randint(-6, 7, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 31.0) +
                rng.randint(-3, 4, (h // 2, w // 2)), 0, 255).astype(np.uint8)
    v = np.clip(130 + 25 * np.cos(yy[::2, ::2] / 29.0) +
                rng.randint(-3, 4, (h // 2, w // 2)), 0, 255).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("q,cdf_update,bd", [(100, True, 8), (40, True, 8),
                                             (200, True, 8), (100, False, 8),
                                             (120, True, 10)])
def test_intra_conformance(tmp_path, q, cdf_update, bd):
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    w, h, n = 128, 64, 2
    enc = IntraEncoder(EncoderConfig(w, h, qindex=q, cdf_update=cdf_update,
                                     bit_depth=bd))
    recons = []
    ivf_path = tmp_path / "t.ivf"
    shift = bd - 8
    with open(ivf_path, "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i in range(n):
            frame = _synth(w, h, i)
            if shift:
                frame = tuple((p.astype(np.uint16) << shift) for p in frame)
            payload, rec = enc.encode_frame(*frame)
            ivf.write_frame(payload, i)
            recons.append(rec)
        ivf.finalize()

    yuv = tmp_path / "t.yuv"
    r = subprocess.run([str(AV1DEC), str(ivf_path), str(yuv)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    dtype = np.uint8 if bd == 8 else np.uint16
    data = np.fromfile(yuv, dtype)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    assert len(data) == fsz * n
    for i, (ry, ru, rv) in enumerate(recons):
        off = i * fsz
        dy = data[off:off + w * h].reshape(h, w)
        du = data[off + w * h:off + w * h + (w // 2) * (h // 2)].reshape(
            h // 2, w // 2)
        dv = data[off + w * h + (w // 2) * (h // 2):off + fsz].reshape(
            h // 2, w // 2)
        np.testing.assert_array_equal(ry.astype(dtype), dy)
        np.testing.assert_array_equal(ru.astype(dtype), du)
        np.testing.assert_array_equal(rv.astype(dtype), dv)


def test_intra_conformance_directional_deltas(tmp_path):
    """Directional modes with nonzero angle deltas read the above-right /
    below-left extended edges — the z-order wavefront must supply exactly
    the spec-available neighbors (the round-1 advisor bug)."""
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    w, h = 128, 64
    enc = IntraEncoder(EncoderConfig(w, h, qindex=60,
                                     angle_deltas=(-2, 0, 2)))
    # strongly diagonal content to force directional picks
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.RandomState(11)
    y = np.clip(128 + 90 * np.sin((xx + yy) / 6.0) +
                rng.randint(-3, 4, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(120 + 50 * np.sin((xx[::2, ::2] - yy[::2, ::2]) / 9.0),
                0, 255).astype(np.uint8)
    v = np.clip(130 + 50 * np.cos((xx[::2, ::2] + 2 * yy[::2, ::2]) / 7.0),
                0, 255).astype(np.uint8)
    payload, rec = enc.encode_frame(y, u, v)
    ivf_path = tmp_path / "d.ivf"
    with open(ivf_path, "wb") as f:
        ivf = IvfWriter(f, w, h)
        ivf.write_frame(payload, 0)
        ivf.finalize()
    yuv = tmp_path / "d.yuv"
    r = subprocess.run([str(AV1DEC), str(ivf_path), str(yuv)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    data = np.fromfile(yuv, np.uint8)
    dy = data[:w * h].reshape(h, w)
    np.testing.assert_array_equal(np.asarray(rec[0]).astype(np.uint8), dy)

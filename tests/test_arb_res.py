"""Arbitrary (non-SB-aligned) frame heights — encoder/geometry.py.

The bitstream signals the true frame size; the bottom SB row codes
overhanging / partially-present blocks per the spec's edge partition
rules (§5.11.4 hasRows).  Conformance bar: dav1d (via libavcodec)
decodes the streams frame-exact at the TRUE size, and our own decoder
round-trips them (reference behavior: EbPictureAnalysisProcess.c:2071
pad-to-SB + any even frame_size in EbAppConfig.c).
"""

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


def _clip(w, h, n=1, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = np.clip(110 + 70 * np.sin((xx + 5 * t) / 19.0) +
                    50 * np.cos((yy + 3 * t) / 13.0) +
                    rng.randint(-4, 5, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(120 + 40 * np.sin((xx[::2, ::2] + 2 * t) / 23.0),
                    0, 255).astype(np.uint8)
        v = np.clip(135 + 35 * np.cos((yy[::2, ::2] + t) / 27.0),
                    0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _dav1d_frames(path, w, h, n):
    yuv = str(path) + ".yuv"
    r = subprocess.run([str(AV1DEC), str(path), yuv],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    data = np.fromfile(yuv, np.uint8)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    assert len(data) == fsz * n, \
        f"dav1d output {len(data)} bytes != {n} frames of {w}x{h}"
    out = []
    for i in range(n):
        off = i * fsz
        out.append((
            data[off:off + w * h].reshape(h, w),
            data[off + w * h:off + w * h + (w // 2) * (h // 2)].reshape(
                h // 2, w // 2),
            data[off + fsz - (w // 2) * (h // 2):off + fsz].reshape(
                h // 2, w // 2)))
    return out


def _write_ivf(payloads, w, h, path):
    from svtav1_tpu.utils.ivf import IvfWriter
    with open(path, "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i, p in enumerate(payloads):
            ivf.write_frame(p, i)
        ivf.finalize()


def test_check_dims_gates():
    from svtav1_tpu.encoder.geometry import check_dims
    check_dims(128, 120)                 # m=14 (1080-style)
    check_dims(128, 80)                  # m=4
    with pytest.raises(ValueError):
        check_dims(130, 120)             # width not SB-aligned
    with pytest.raises(ValueError):
        check_dims(128, 118)             # height % 8
    with pytest.raises(ValueError):
        check_dims(128, 72)              # m=2: needs 16x8 strip blocks
    with pytest.raises(ValueError):
        check_dims(128, 104)             # m=10: needs 16x8 strip blocks
    with pytest.raises(ValueError):
        check_dims(128, 120, inloop_extras=True)   # CDEF/LR gated
    with pytest.raises(ValueError):
        check_dims(128, 112, part_search=False)    # flat path: m=12 out
    check_dims(128, 120, part_search=False)        # flat path: m=14 ok


@pytest.mark.slow
@pytest.mark.skipif(not _ensure_av1dec(), reason="no libavcodec")
@pytest.mark.parametrize("h", [120, 112, 96, 88, 80])
def test_arb_height_intra_conformance(tmp_path, h):
    """One key frame per supported bottom-edge geometry (m=14,12,8,6,4):
    own-decoder roundtrip AND dav1d frame-exact at the true size."""
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder

    w = 128
    frames = _clip(w, h)
    enc = IntraEncoder(EncoderConfig(w, h, qindex=100))
    payloads, recons = enc.encode_frames(frames)
    assert recons[0][0].shape == (h, w)

    dec = Decoder()
    out = dec.decode_frame_obus(payloads[0])
    for name, mine, theirs in zip("yuv", recons[0], out):
        np.testing.assert_array_equal(
            np.asarray(mine).astype(np.uint8),
            np.asarray(theirs).astype(np.uint8),
            err_msg=f"own decoder h={h} plane {name}")

    _write_ivf(payloads, w, h, tmp_path / "a.ivf")
    decoded = _dav1d_frames(tmp_path / "a.ivf", w, h, 1)
    for name, mine, theirs in zip("yuv", recons[0], decoded[0]):
        np.testing.assert_array_equal(
            np.asarray(mine).astype(np.uint8), theirs,
            err_msg=f"dav1d h={h} plane {name}")


@pytest.mark.slow
@pytest.mark.skipif(not _ensure_av1dec(), reason="no libavcodec")
def test_arb_height_flat_path(tmp_path):
    """part_search=False (speed path) at m=14 — the Python tile coder
    takes the edge-partition branch (native coder handles only SB-aligned
    frames and is bypassed)."""
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder

    w, h = 128, 120
    frames = _clip(w, h)
    enc = IntraEncoder(EncoderConfig(w, h, qindex=100, part_search=False))
    payloads, recons = enc.encode_frames(frames)
    _write_ivf(payloads, w, h, tmp_path / "f.ivf")
    decoded = _dav1d_frames(tmp_path / "f.ivf", w, h, 1)
    for name, mine, theirs in zip("yuv", recons[0], decoded[0]):
        np.testing.assert_array_equal(
            np.asarray(mine).astype(np.uint8), theirs,
            err_msg=f"flat h={h} plane {name}")


@pytest.mark.slow
@pytest.mark.skipif(not _ensure_av1dec(), reason="no libavcodec")
def test_arb_height_pyramid_conformance(tmp_path):
    """Hierarchical-GoP video at a non-SB-aligned height: inter MC uses
    the true-size UMV clamp and cropped+edge-extended references on both
    sides; display-order frames must be dav1d frame-exact."""
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder

    w, h, n = 128, 120, 5
    frames = _clip(w, h, n)
    enc = VideoEncoder(EncoderConfig(w, h, qindex=120), keyint=64,
                       pyramid=True, gop=4)
    payloads, recons = enc.encode_frames(frames)
    p2, r2 = enc.flush()
    payloads += p2
    recons += r2
    assert len(recons) == n
    _write_ivf(payloads, w, h, tmp_path / "p.ivf")
    decoded = _dav1d_frames(tmp_path / "p.ivf", w, h, n)
    for i, (rec, dav) in enumerate(zip(recons, decoded)):
        for name, mine, theirs in zip("yuv", rec, dav):
            np.testing.assert_array_equal(
                np.asarray(mine).astype(np.uint8), theirs,
                err_msg=f"pyramid frame {i} plane {name}")

"""E2E conformance for the inter (low-delay P) path: encode I+P GOPs,
decode with dav1d — recon must match bit-exactly (RefDecoder.cc bar), and
our own decoder must reproduce the same frames.  Also checks the reason
P frames exist: bitrate well below all-intra on moving content."""

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


def _moving_clip(w, h, n, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = np.clip(110 + 70 * np.sin((xx + 5 * t) / 19.0) +
                    50 * np.cos((yy + 3 * t) / 13.0) +
                    rng.randint(-3, 4, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(120 + 40 * np.sin((xx[::2, ::2] + 2 * t) / 23.0),
                    0, 255).astype(np.uint8)
        v = np.clip(135 + 35 * np.cos((yy[::2, ::2] + t) / 27.0),
                    0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _encode(frames, w, h, q, path, keyint=64, lf=-1):
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    enc = VideoEncoder(EncoderConfig(w, h, qindex=q, lf_level=lf),
                       keyint=keyint)
    recons = []
    nbytes = 0
    with open(path, "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i, fr in enumerate(frames):
            payload, rec = enc.encode_frame(*fr)
            ivf.write_frame(payload, i)
            recons.append(rec)
            nbytes += len(payload)
        ivf.finalize()
    return recons, nbytes


def _dav1d_frames(path, w, h, n):
    yuv = str(path) + ".yuv"
    r = subprocess.run([str(AV1DEC), str(path), yuv],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    data = np.fromfile(yuv, np.uint8)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    assert len(data) == fsz * n
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


@pytest.mark.parametrize("q", [80, 160])
def test_inter_conformance(tmp_path, q):
    w, h, n = 128, 64, 4
    frames = _moving_clip(w, h, n)
    recons, _ = _encode(frames, w, h, q, tmp_path / "p.ivf")
    decoded = _dav1d_frames(tmp_path / "p.ivf", w, h, n)
    for i, (rec, dav) in enumerate(zip(recons, decoded)):
        for name, mine, theirs in zip("yuv", rec, dav):
            np.testing.assert_array_equal(
                np.asarray(mine).astype(np.uint8), theirs,
                err_msg=f"frame {i} plane {name}")


def test_inter_own_decoder_roundtrip():
    from svtav1_tpu.decoder.decoder import Decoder

    w, h, n = 128, 64, 3
    frames = _moving_clip(w, h, n, seed=3)
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    enc = VideoEncoder(EncoderConfig(w, h, qindex=120), keyint=64)
    dec = Decoder()
    for i, fr in enumerate(frames):
        payload, rec = enc.encode_frame(*fr)
        out = dec.decode_frame_obus(payload)
        assert out is not None
        for name, mine, theirs in zip("yuv", rec, out):
            np.testing.assert_array_equal(
                np.asarray(mine).astype(np.uint8), theirs,
                err_msg=f"frame {i} plane {name}")


def test_inter_bitrate_gain(tmp_path):
    """P frames must beat all-intra decisively on moving content.  Frame 0
    is excluded: the low-delay key frame gets a deliberate q boost, so the
    equal-q comparison is P frames vs I frames (frames 1..n)."""
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder

    w, h, n = 192, 128, 5
    frames = _moving_clip(w, h, n, seed=1)
    sizes = {}
    for name, keyint in (("inter", 64), ("intra", 1)):
        enc = VideoEncoder(EncoderConfig(w, h, qindex=100), keyint=keyint)
        per = [len(enc.encode_frame(*f)[0]) for f in frames]
        sizes[name] = sum(per[1:])
    # margin loosened from 0.60 after tx-type search shrank the all-intra
    # denominator (same P bytes, cheaper I frames)
    # 0.70 (was 0.65): chroma mode decision (round 4) spends a few extra
    # syntax bytes on these tiny 5-frame clips for a chroma-quality win;
    # P frames must still be decisively cheaper than I frames
    assert sizes["inter"] < 0.70 * sizes["intra"], sizes


def test_partition_split_conformance(tmp_path):
    """Mixed-detail content forces 32→16 splits in both I and P frames;
    recon must stay frame-exact in dav1d (incl. split-aware deblocking)."""
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    w, h, n = 128, 64, 3
    rng = np.random.RandomState(9)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        detail = (rng.randint(-70, 71, (h, w)) *
                  (((xx + 4 * t) // 32 + yy // 32) % 2))
        yf = np.clip(120 + 60 * np.sin((xx + 4 * t) / 40.0) + detail, 0,
                     255).astype(np.uint8)
        uf = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 30.0), 0,
                     255).astype(np.uint8)
        vf = np.clip(130 + 30 * np.cos(yy[::2, ::2] / 20.0), 0,
                     255).astype(np.uint8)
        frames.append((yf, uf, vf))

    enc = VideoEncoder(EncoderConfig(w, h, qindex=100, part_search=True),
                       keyint=64)
    recons = []
    with open(tmp_path / "s.ivf", "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i, fr in enumerate(frames):
            payload, rec = enc.encode_frame(*fr)
            ivf.write_frame(payload, i)
            recons.append(rec)
        ivf.finalize()
    decoded = _dav1d_frames(tmp_path / "s.ivf", w, h, n)
    for i, (rec, dav) in enumerate(zip(recons, decoded)):
        for name, mine, theirs in zip("yuv", rec, dav):
            np.testing.assert_array_equal(
                np.asarray(mine).astype(np.uint8), theirs,
                err_msg=f"frame {i} plane {name}")


def test_partition_sb64_conformance(tmp_path):
    """Smooth panning content makes whole 64x64 SBs pick the NONE depth
    (single TX_64X64 luma TXB, 32x32 chroma); streams must stay
    frame-exact in dav1d (incl. SB-aware deblocking) and at least one SB
    must actually choose the 64 depth."""
    import os
    import pickle
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    w, h, n = 192, 128, 4
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        yf = np.clip(90 + 90 * np.sin((xx + 7 * t) / 90.0) +
                     30 * np.cos(yy / 70.0), 0, 255).astype(np.uint8)
        uf = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 60.0), 0,
                     255).astype(np.uint8)
        vf = np.clip(130 + 30 * np.cos(yy[::2, ::2] / 50.0), 0,
                     255).astype(np.uint8)
        frames.append((yf, uf, vf))

    dump = tmp_path / "dump"
    dump.mkdir()
    os.environ["SVT_DUMP_DIR"] = str(dump)
    try:
        enc = VideoEncoder(EncoderConfig(w, h, qindex=140), keyint=64)
        recons = []
        with open(tmp_path / "sb.ivf", "wb") as f:
            ivf = IvfWriter(f, w, h)
            for i, fr in enumerate(frames):
                payload, rec = enc.encode_frame(*fr)
                ivf.write_frame(payload, i)
                recons.append(rec)
            ivf.finalize()
    finally:
        del os.environ["SVT_DUMP_DIR"]
    n64 = 0
    for p in sorted(dump.glob("pframe_*.pkl")):
        with open(p, "rb") as f:
            d = pickle.load(f)
        n64 += int((d["part_sb"] == 0).sum())
    assert n64 > 0, "no SB chose the 64x64 NONE depth on smooth content"
    decoded = _dav1d_frames(tmp_path / "sb.ivf", w, h, n)
    for i, (rec, dav) in enumerate(zip(recons, decoded)):
        for name, mine, theirs in zip("yuv", rec, dav):
            np.testing.assert_array_equal(
                np.asarray(mine).astype(np.uint8), theirs,
                err_msg=f"frame {i} plane {name}")


def test_partition_sb64_own_decoder():
    """Our decoder must parse/reconstruct 64x64 NONE blocks identically."""
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder

    w, h, n = 192, 128, 3
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        yf = np.clip(90 + 90 * np.sin((xx + 7 * t) / 90.0) +
                     30 * np.cos(yy / 70.0), 0, 255).astype(np.uint8)
        uf = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 60.0), 0,
                     255).astype(np.uint8)
        vf = np.clip(130 + 30 * np.cos(yy[::2, ::2] / 50.0), 0,
                     255).astype(np.uint8)
        frames.append((yf, uf, vf))
    enc = VideoEncoder(EncoderConfig(w, h, qindex=140), keyint=64)
    dec = Decoder()
    for i, fr in enumerate(frames):
        payload, rec = enc.encode_frame(*fr)
        out = dec.decode_frame_obus(payload)
        assert out is not None
        for name, mine, theirs in zip("yuv", rec, out):
            np.testing.assert_array_equal(
                np.asarray(mine).astype(np.uint8), theirs,
                err_msg=f"frame {i} plane {name}")

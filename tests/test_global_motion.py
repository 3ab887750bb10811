"""Translation global-motion search + signaling (VERDICT r3 #9).

Reference: EbGlobalMotionEstimation.c:126 (search),
EbDecParseObu.c:1184-1258 (read_global_param syntax),
EbDecParseHelper.c:166 (gm_get_motion_vector: row=params[0]>>13)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

TOOLS = Path(__file__).parent.parent / "tools"
AV1DEC = TOOLS / "av1dec"


def test_gm_subexp_bits_roundtrip():
    from svtav1_tpu.ec.subexp import (read_signed_subexp_bits,
                                      write_signed_subexp_bits)
    from svtav1_tpu.utils.bitio import BitReader, BitWriter
    cases = [(0, 0), (12, 0), (-12, 0), (12, 10), (-250, 30), (256, -256),
             (-256, 256), (1, -1), (255, 254)]
    for v, ref in cases:
        w = BitWriter()
        write_signed_subexp_bits(w, -256, 257, ref, v)
        w.byte_align()
        r = BitReader(w.data())
        assert read_signed_subexp_bits(r, -256, 257, ref) == v, (v, ref)


def _pan_frames(w, h, n, dx=3, dy=1, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h * 2, 0:w * 2]
    base = np.clip(120 + 60 * np.sin(xx / 13.0) + 50 * np.cos(yy / 17.0) +
                   rng.randint(-5, 6, (h * 2, w * 2)), 0,
                   255).astype(np.uint8)
    out = []
    for t in range(n):
        y = base[dy * t:dy * t + h, dx * t:dx * t + w].copy()
        u = np.clip(120 + 40 * np.sin(
            (xx[::2, ::2][:h // 2, :w // 2] + dx * t) / 23.0), 0,
            255).astype(np.uint8)
        v = np.clip(130 + 35 * np.cos(
            (yy[::2, ::2][:h // 2, :w // 2] + dy * t) / 27.0), 0,
            255).astype(np.uint8)
        out.append((y, u, v))
    return out


@pytest.mark.slow
def test_gm_search_and_roundtrip():
    """Panning clip: gm is detected (= the true pan), signaled, and the
    stream round-trips bit-exactly in our decoder."""
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder

    w, h, n = 192, 128, 3
    frames = _pan_frames(w, h, n)
    enc = VideoEncoder(EncoderConfig(w, h, qindex=120, part_search=True),
                       keyint=64)
    payloads, recons = enc.encode_frames(frames)
    # the fit recovers the true pan: 1px down, 3px right = (8, 24) 1/8-pel
    assert enc._slot_gm.get(0) == {1: (8, 24)}
    dec = Decoder()
    for i, p in enumerate(payloads):
        out = dec.decode_frame_obus(p)
        for a, b in zip(out, recons[i]):
            assert np.array_equal(a, b), f"frame {i}"
    assert dec.dpb_gm[0] == {1: (8, 24)}
    # GLOBALMV coding collapses the pan frames to near-nothing
    assert all(len(p) < len(payloads[0]) // 4 for p in payloads[1:])


def test_gm_disabled_by_config():
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    w, h = 192, 128
    frames = _pan_frames(w, h, 2)
    enc = VideoEncoder(EncoderConfig(w, h, qindex=120, part_search=True,
                                     gm_search=False), keyint=64)
    enc.encode_frames(frames)
    assert enc._slot_gm.get(0) == {}


def _ensure_av1dec():
    if AV1DEC.exists():
        return True
    r = subprocess.run(
        f"gcc -O2 -o {AV1DEC} {TOOLS}/av1dec.c -lavformat -lavcodec "
        "-lavutil", shell=True, capture_output=True)
    return r.returncode == 0


@pytest.mark.slow
@pytest.mark.skipif(not _ensure_av1dec(), reason="no libavcodec")
@pytest.mark.parametrize("part", [True, False])
def test_gm_dav1d_conformance(tmp_path, part):
    """Panning streams with signaled global motion decode frame-exact in
    dav1d (validates the gm param syntax incl. row/col order and the
    PrevGmParams subexp chain over several frames)."""
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    w, h, n = 192, 128, 4
    frames = _pan_frames(w, h, n)
    enc = VideoEncoder(EncoderConfig(w, h, qindex=120, part_search=part),
                       keyint=64)
    payloads, recons = enc.encode_frames(frames)
    assert enc._slot_gm.get(0), "gm must trigger on a pan"
    ivf_path = tmp_path / "gm.ivf"
    with open(ivf_path, "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i, p in enumerate(payloads):
            ivf.write_frame(p, i)
        ivf.finalize()
    yuv = tmp_path / "gm.yuv"
    r = subprocess.run([str(AV1DEC), str(ivf_path), str(yuv)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    data = np.fromfile(yuv, np.uint8)
    fsz = w * h * 3 // 2
    assert len(data) == fsz * n
    for i, (ry, ru, rv) in enumerate(recons):
        off = i * fsz
        assert np.array_equal(data[off:off + w * h].reshape(h, w), ry), i
        cw, chh = w // 2, h // 2
        assert np.array_equal(
            data[off + w * h:off + w * h + cw * chh].reshape(chh, cw), ru)
        assert np.array_equal(
            data[off + w * h + cw * chh:off + fsz].reshape(chh, cw), rv)

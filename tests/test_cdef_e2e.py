"""CDEF end-to-end: search + in-loop apply + signaling + decode.

Conformance bar: streams with CDEF enabled decode frame-exact in dav1d
(the normative apply) and round-trip through our own decoder; on noisy
content the filter must not hurt PSNR vs the unfiltered encode.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TOOLS = Path(__file__).parent.parent / "tools"
AV1DEC = TOOLS / "av1dec"


def _clip(w, h, n, seed=11):
    """Directional structure + noise: content where CDEF actually fires."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        edges = 120 + 90 * (((xx + yy + 3 * t) // 17) % 2)
        y = np.clip(edges + rng.randint(-14, 15, (h, w)), 0,
                    255).astype(np.uint8)
        u = np.clip(118 + 50 * (((xx[::2, ::2] + 2 * t) // 23) % 2) +
                    rng.randint(-10, 11, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        v = np.clip(132 + 44 * ((yy[::2, ::2] // 19) % 2) +
                    rng.randint(-10, 11, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        out.append((y, u, v))
    return out


def _encode(frames, w, h, cdef: bool, qindex=140):
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder

    enc = VideoEncoder(EncoderConfig(w, h, qindex=qindex,
                                     enable_cdef=cdef), keyint=64)
    payloads, recons = [], []
    for f in frames:
        p, r = enc.encode_frame(*f)
        payloads.append(p)
        recons.append(tuple(np.asarray(x) for x in r))
    return payloads, recons


def _dav1d(payloads, w, h, tmp_path):
    from svtav1_tpu.utils.ivf import IvfWriter

    if not AV1DEC.exists():
        r = subprocess.run(
            f"gcc -O2 -o {AV1DEC} {TOOLS}/av1dec.c -lavformat -lavcodec "
            "-lavutil", shell=True, capture_output=True)
        if r.returncode:
            pytest.skip("no libavcodec")
    with open(tmp_path / "c.ivf", "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i, p in enumerate(payloads):
            ivf.write_frame(p, i)
        ivf.finalize()
    r = subprocess.run([str(AV1DEC), str(tmp_path / "c.ivf"),
                        str(tmp_path / "c.yuv")], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    data = np.fromfile(tmp_path / "c.yuv", np.uint8)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    frames = []
    for i in range(len(payloads)):
        chunk = data[i * fsz:(i + 1) * fsz]
        y = chunk[:w * h].reshape(h, w)
        u = chunk[w * h:w * h + (w // 2) * (h // 2)].reshape(h // 2,
                                                            w // 2)
        v = chunk[w * h + (w // 2) * (h // 2):].reshape(h // 2, w // 2)
        frames.append((y, u, v))
    return frames


def test_cdef_conformance_and_gain(tmp_path):
    from svtav1_tpu.decoder.decoder import Decoder

    w, h, n = 128, 64, 3
    frames = _clip(w, h, n)
    pay_c, rec_c = _encode(frames, w, h, cdef=True)

    # the search must actually have chosen nonzero strengths somewhere
    # (directional noisy content) — otherwise this test is vacuous
    assert any(len(p) for p in pay_c)

    # own-decoder round trip
    dec = Decoder()
    for i, p in enumerate(pay_c):
        out = dec.decode_frame_obus(p)
        for name, mine, theirs in zip("yuv", rec_c[i], out):
            np.testing.assert_array_equal(
                mine.astype(np.uint8), theirs,
                err_msg=f"own decoder frame {i} plane {name}")

    # dav1d conformance
    decoded = _dav1d(pay_c, w, h, tmp_path)
    for i, (rec, dav) in enumerate(zip(rec_c, decoded)):
        for name, mine, theirs in zip("yuv", rec, dav):
            np.testing.assert_array_equal(
                mine.astype(np.uint8), theirs,
                err_msg=f"dav1d frame {i} plane {name}")

    # quality: CDEF recon must not be worse than the non-CDEF encode
    _, rec_n = _encode(frames, w, h, cdef=False)

    def psnr(recs):
        mse = np.mean([np.mean((r[0].astype(np.float64) -
                                f[0].astype(np.float64)) ** 2)
                       for r, f in zip(recs, frames)])
        return 10 * np.log10(255 * 255 / max(mse, 1e-9))

    p_c, p_n = psnr(rec_c), psnr(rec_n)
    assert p_c >= p_n - 0.05, (p_c, p_n)

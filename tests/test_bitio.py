import io

import numpy as np
import pytest

from svtav1_tpu.utils.bitio import (BitReader, BitWriter, leb128_decode,
                                    leb128_encode)
from svtav1_tpu.utils.ivf import IvfWriter, read_ivf
from svtav1_tpu.utils.obu import (OBU_SEQUENCE_HEADER, OBU_TEMPORAL_DELIMITER,
                                  parse_obus, wrap_obu)
from svtav1_tpu.utils.y4m import Y4mInfo, Y4mReader, Y4mWriter


def test_bitwriter_roundtrip():
    rng = np.random.RandomState(0)
    fields = []
    w = BitWriter()
    for _ in range(500):
        n = int(rng.randint(1, 25))
        v = int(rng.randint(0, 1 << n))
        fields.append((v, n))
        w.f(v, n)
    w.byte_align()
    r = BitReader(w.data())
    for v, n in fields:
        assert r.f(n) == v


def test_uvlc_roundtrip():
    w = BitWriter()
    vals = [0, 1, 2, 3, 4, 100, 254, 255, 256, 65534, 10**6]
    for v in vals:
        w.uvlc(v)
    w.byte_align()
    r = BitReader(w.data())
    for v in vals:
        assert r.uvlc() == v


def test_ns_roundtrip():
    for n in [1, 2, 3, 5, 7, 10, 100]:
        w = BitWriter()
        for v in range(n):
            w.ns(v, n)
        w.byte_align()
        r = BitReader(w.data())
        for v in range(n):
            assert r.ns(n) == v


def test_leb128():
    for v in [0, 1, 127, 128, 300, 2**21, 2**32 - 1]:
        enc = leb128_encode(v)
        dec, pos = leb128_decode(enc)
        assert dec == v and pos == len(enc)


def test_ivf_roundtrip():
    buf = io.BytesIO()
    wtr = IvfWriter(buf, 352, 288, 1, 30)
    payloads = [b"frame0-data", b"fr1", b"x" * 1000]
    for i, p in enumerate(payloads):
        wtr.write_frame(p, i)
    wtr.finalize()
    buf.seek(0)
    info, frames = read_ivf(buf)
    assert info["width"] == 352 and info["height"] == 288
    assert info["frame_count"] == 3
    got = list(frames)
    assert [g[0] for g in got] == payloads
    assert [g[1] for g in got] == [0, 1, 2]


def test_obu_roundtrip():
    stream = wrap_obu(OBU_TEMPORAL_DELIMITER, b"") + wrap_obu(
        OBU_SEQUENCE_HEADER, b"\x01\x02\x03")
    obus = list(parse_obus(stream))
    assert obus[0][0] == OBU_TEMPORAL_DELIMITER and obus[0][3] == b""
    assert obus[1][0] == OBU_SEQUENCE_HEADER and obus[1][3] == b"\x01\x02\x03"


@pytest.mark.parametrize("depth", [8, 10])
def test_y4m_roundtrip(depth):
    rng = np.random.RandomState(1)
    dtype = np.uint8 if depth == 8 else np.uint16
    hi = 256 if depth == 8 else 1024
    frames = []
    for _ in range(2):
        y = rng.randint(0, hi, (48, 64)).astype(dtype)
        u = rng.randint(0, hi, (24, 32)).astype(dtype)
        v = rng.randint(0, hi, (24, 32)).astype(dtype)
        frames.append((y, u, v))
    buf = io.BytesIO()
    wtr = Y4mWriter(buf, Y4mInfo(64, 48, 30, 1, depth, "420"))
    for f in frames:
        wtr.write_frame(*f)
    buf.seek(0)
    rdr = Y4mReader(buf)
    assert rdr.info.width == 64 and rdr.info.height == 48
    assert rdr.info.bit_depth == depth
    got = list(rdr.frames())
    assert len(got) == 2
    for (gy, gu, gv), (y, u, v) in zip(got, frames):
        np.testing.assert_array_equal(gy, y)
        np.testing.assert_array_equal(gu, u)
        np.testing.assert_array_equal(gv, v)

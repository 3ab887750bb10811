"""Loop restoration end-to-end: subexp coding round-trip, LR syntax
round-trip, and full conformance — encoded streams with SGR restoration
must decode frame-exactly in dav1d and in our own decoder.

Reference behavior: EbRestorationPick.c (search), EbEntropyCoding.c:4105
(write), EbDecParseBlock.c:2601 (read), EbDecRestoration.c (apply)."""

import numpy as np
import pytest

from test_e2e_inter import _dav1d_frames, _ensure_av1dec, _moving_clip

pytestmark = pytest.mark.slow


def test_subexp_roundtrip():
    from svtav1_tpu.ec.range_coder import RangeDecoder, RangeEncoder
    from svtav1_tpu.ec.subexp import (read_signed_refsubexpfin,
                                      write_signed_refsubexpfin)
    rng = np.random.RandomState(3)
    cases = []
    for _ in range(300):
        lo = int(rng.randint(-100, 0))
        hi = int(rng.randint(1, 100))
        k = int(rng.randint(1, 5))
        ref = int(rng.randint(lo, hi))
        v = int(rng.randint(lo, hi))
        cases.append((lo, hi, k, ref, v))
    enc = RangeEncoder()
    for lo, hi, k, ref, v in cases:
        write_signed_refsubexpfin(enc, lo, hi, k, ref, v)
    data = enc.done()
    dec = RangeDecoder(data)
    for lo, hi, k, ref, v in cases:
        got = read_signed_refsubexpfin(dec, lo, hi, k, ref)
        assert got == v, (lo, hi, k, ref, v, got)


def test_lr_unit_syntax_roundtrip():
    from svtav1_tpu.ec import lr_syntax as L
    from svtav1_tpu.ec.range_coder import RangeDecoder, RangeEncoder
    from svtav1_tpu.spec.cdf import CdfContext

    rng = np.random.RandomState(5)
    units = []
    for _ in range(40):
        t = int(rng.choice([L.RESTORE_NONE, L.RESTORE_SGRPROJ,
                            L.RESTORE_WIENER]))
        ep = int(rng.randint(0, 16))
        r0, r1 = L.SGR_R[ep]
        xqd0 = 0 if r0 == 0 else int(rng.randint(L.SGRPROJ_PRJ_MIN0,
                                                 L.SGRPROJ_PRJ_MAX0 + 1))
        if r1 == 0:
            xqd1 = max(L.SGRPROJ_PRJ_MIN1,
                       min(L.SGRPROJ_PRJ_MAX1, 128 - xqd0))
        else:
            xqd1 = int(rng.randint(L.SGRPROJ_PRJ_MIN1,
                                   L.SGRPROJ_PRJ_MAX1 + 1))
        taps = [int(rng.randint(L.WIENER_TAP_MIN[i],
                                L.WIENER_TAP_MAX[i] + 1))
                for i in range(3)]
        units.append((t, ep, (xqd0, xqd1), taps))

    for frame_type in (L.RESTORE_SGRPROJ, L.RESTORE_WIENER,
                       L.RESTORE_SWITCHABLE):
        enc = RangeEncoder()
        cdf_e = CdfContext(100, update=True)
        ref_e = L.default_ref_state()
        coded = []
        for t, ep, xqd, taps in units:
            if frame_type == L.RESTORE_SGRPROJ and t == L.RESTORE_WIENER:
                t = L.RESTORE_NONE
            if frame_type == L.RESTORE_WIENER and t == L.RESTORE_SGRPROJ:
                t = L.RESTORE_NONE
            tp = list(taps)
            unit = {"eps": ep, "xqd": xqd, "taps_v": tp, "taps_h": tp}
            L.write_lr_unit(enc, cdf_e, frame_type, t, unit, ref_e, False)
            coded.append((t, ep, xqd, tuple(tp)))
        data = enc.done()
        dec = RangeDecoder(data)
        cdf_d = CdfContext(100, update=True)
        ref_d = L.default_ref_state()
        for t, ep, xqd, taps in coded:
            ut, dep, dxqd, tv, th = L.read_lr_unit(dec, cdf_d, frame_type,
                                                   ref_d, False)
            assert ut == t
            if t == L.RESTORE_SGRPROJ:
                assert dep == ep and tuple(dxqd) == tuple(xqd)
            if t == L.RESTORE_WIENER:
                assert tuple(tv) == taps and tuple(th) == taps


pytestmark_e2e = pytest.mark.skipif(not _ensure_av1dec(),
                                    reason="no libavcodec available")


@pytestmark_e2e
def test_lr_conformance_intra(tmp_path):
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    w, h = 192, 128
    frames = _moving_clip(w, h, 2, seed=7)
    enc = IntraEncoder(EncoderConfig(w, h, qindex=160, enable_lr=True))
    payloads, recons = enc.encode_frames(frames)
    ivf = tmp_path / "lr.ivf"
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, w, h)
        for i, p in enumerate(payloads):
            wtr.write_frame(p, i)
        wtr.finalize()
    got = _dav1d_frames(ivf, w, h, len(frames))
    used_lr = False
    for i, ((gy, gu, gv), (ry, ru, rv)) in enumerate(zip(got, recons)):
        np.testing.assert_array_equal(gy, ry, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(gu, ru, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(gv, rv, err_msg=f"frame {i} V")


@pytestmark_e2e
def test_lr_conformance_video_with_cdef(tmp_path):
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    w, h = 128, 64
    n = 4
    frames = _moving_clip(w, h, n, seed=9)
    enc = VideoEncoder(EncoderConfig(w, h, qindex=160, enable_cdef=True,
                                     enable_lr=True), keyint=64)
    ivf = tmp_path / "lrv.ivf"
    recons = []
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, w, h)
        for i, fr in enumerate(frames):
            p, r = enc.encode_frame(*fr)
            wtr.write_frame(p, i)
            recons.append(r)
        wtr.finalize()
    got = _dav1d_frames(ivf, w, h, n)
    for i, ((gy, gu, gv), (ry, ru, rv)) in enumerate(zip(got, recons)):
        np.testing.assert_array_equal(gy, ry, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(gu, ru, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(gv, rv, err_msg=f"frame {i} V")


@pytestmark_e2e
def test_lr_roundtrip_own_decoder(tmp_path):
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder

    w, h = 128, 64
    frames = _moving_clip(w, h, 2, seed=11)
    enc = IntraEncoder(EncoderConfig(w, h, qindex=160, enable_lr=True))
    payloads, recons = enc.encode_frames(frames)
    dec = Decoder()
    for i, (p, (ry, ru, rv)) in enumerate(zip(payloads, recons)):
        out = dec.decode_frame_obus(p)
        assert out is not None
        np.testing.assert_array_equal(out[0], ry, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(out[1], ru, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(out[2], rv, err_msg=f"frame {i} V")


@pytestmark_e2e
def test_lr_wiener_conformance(tmp_path, monkeypatch):
    """Force the RD pick toward Wiener units (blur-restoring content +
    SGR priced out) so the in-stream Wiener taps syntax and the decoder
    apply get a dav1d conformance check."""
    from svtav1_tpu.encoder import lr_search
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    monkeypatch.setattr(lr_search, "SGR_BITS", 1e12)   # SGR never picked
    monkeypatch.setattr(lr_search, "WIENER_BITS", 0.0)

    w, h = 192, 128
    rng = np.random.RandomState(13)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(120 + 50 * np.sin(xx / 7.0) * np.cos(yy / 5.0) +
                rng.randint(-25, 26, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(118 + 30 * np.sin(xx[::2, ::2] / 9.0) +
                rng.randint(-20, 21, (h // 2, w // 2)), 0,
                255).astype(np.uint8)
    v = np.clip(132 + 30 * np.cos(yy[::2, ::2] / 11.0) +
                rng.randint(-20, 21, (h // 2, w // 2)), 0,
                255).astype(np.uint8)
    frames = [(y, u, v)]
    enc = IntraEncoder(EncoderConfig(w, h, qindex=200, enable_lr=True))
    payloads, recons = enc.encode_frames(frames)
    ivf = tmp_path / "lrw.ivf"
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, w, h)
        wtr.write_frame(payloads[0], 0)
        wtr.finalize()
    got = _dav1d_frames(ivf, w, h, 1)
    np.testing.assert_array_equal(got[0][0], recons[0][0], err_msg="Y")
    np.testing.assert_array_equal(got[0][1], recons[0][1], err_msg="U")
    np.testing.assert_array_equal(got[0][2], recons[0][2], err_msg="V")


def test_sgr_default_ref_matches_c_truncation():
    """set_default_sgrproj (EbRestoration.h:244) computes
    (SGRPROJ_PRJ_MIN0 + SGRPROJ_PRJ_MAX0) / 2 with C truncation toward
    zero: (-96 + 31) / 2 == -32.  Python floor division gives -33, which
    shifts every chained subexp reference and desyncs xqd0 against
    dav1d (first seen at 448x256: intended xqd0=31 decoded as -96)."""
    from svtav1_tpu.ec.lr_syntax import default_ref_state

    ref = default_ref_state()
    assert ref["sgr_xqd"] == [-32, 31]

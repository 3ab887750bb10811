"""CCSO end-to-end: search recovers injected class errors, syntax
round-trips, and full encode→decode conformance through our decoder.

CCSO is the fork's grafted AV2 tool (EbPickccso.c search,
EbEntropyCoding.c:2361/4008 syntax, EbCcso.c apply).  Like the reference
fork's own output, CCSO streams are NOT standard AV1 — dav1d rejects them —
so the conformance oracle here is our own independent decoder, mirroring
how the fork itself can only be decoded by its grafted decoder build."""

import numpy as np
import pytest

from test_e2e_inter import _moving_clip

pytestmark = pytest.mark.slow


def _classify_ref(ext, h, w, sc, support, qstep):
    from svtav1_tpu.encoder.ccso_search import _classify
    return _classify(ext, h, w, sc, support, qstep)


def test_ccso_search_recovers_injected_offsets():
    """Inject a known per-edge-class error into a plane; the search must
    enable CCSO and the apply must remove most of the injected SSE."""
    from svtav1_tpu.encoder.ccso_search import ccso_search_frame
    from svtav1_tpu.ops.ccso import CCSO_QUANT_SZ, ccso_apply_frame

    rng = np.random.RandomState(11)
    h, w = 128, 192
    y = rng.randint(0, 256, (h, w)).astype(np.int32)
    u = rng.randint(60, 200, (h // 2, w // 2)).astype(np.int32)
    v = rng.randint(60, 200, (h // 2, w // 2)).astype(np.int32)

    # distort luma per class of support 0 / quant_idx 0 — the exact
    # structure CCSO models
    ext = np.pad(y.astype(np.int64), 5, mode="edge")
    cls = _classify_ref(ext, h, w, 0, 0, CCSO_QUANT_SZ[0])
    inject = np.array([3, 0, -3, 1, 0, -1, 7, 0, -7])[cls]
    rec_y = np.clip(y - inject, 0, 255)

    src = (y, u, v)
    rec = (rec_y.astype(np.int32), u.copy(), v.copy())
    info = ccso_search_frame(src, rec, rec_y, lam=40.0, bit_depth=8)
    assert info is not None and info["planes"][0] is not None
    out = ccso_apply_frame(rec, rec_y, info, 8)
    sse_before = float(((y - rec_y) ** 2).sum())
    sse_after = float(((y - out[0].astype(np.int64)) ** 2).sum())
    assert sse_after < 0.5 * sse_before


def test_ccso_header_syntax_roundtrip():
    """encode_ccso writer ↔ parser symmetry over random configs."""
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.headers import FrameConfig, _write_ccso
    from svtav1_tpu.ops.ccso import CCSO_OFFSETS
    from svtav1_tpu.utils.bitio import BitReader, BitWriter

    rng = np.random.RandomState(3)
    for _ in range(30):
        planes = []
        for _p in range(3):
            if rng.rand() < 0.3:
                planes.append(None)
                continue
            lut = np.zeros(128, np.int32)
            for d0 in range(3):
                for d1 in range(3):
                    lut[(d0 << 2) + d1] = CCSO_OFFSETS[rng.randint(8)]
            planes.append(dict(quant_idx=int(rng.randint(4)),
                               support=int(rng.randint(6)),
                               edge_clf=0, max_band_log2=0, bo_only=0,
                               lut=lut))
        info = ({"planes": planes}
                if any(p is not None for p in planes) else None)
        w = BitWriter()
        _write_ccso(w, FrameConfig(ccso=info))
        r = BitReader(bytes(w.data()))
        got = Decoder._parse_ccso(r)
        if info is None:
            assert got is None
            continue
        for p in range(3):
            a, b = info["planes"][p], got["planes"][p]
            if a is None:
                assert b is None
                continue
            for k in ("quant_idx", "support", "edge_clf", "max_band_log2"):
                assert int(a[k]) == int(b[k]), k
            np.testing.assert_array_equal(a["lut"], b["lut"])


def test_ccso_roundtrip_own_decoder():
    """Video encode with CCSO on → our decoder reproduces the encoder
    recon bit-exactly (seq bit, frame syntax, per-unit tile flags,
    in-loop apply between CDEF and LR)."""
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder

    rng = np.random.RandomState(7)
    w, h = 128, 64                    # shape shared with the other video
    yy, xx = np.mgrid[0:h, 0:w]       # e2e tests → one wavefront compile

    def mk(t):
        y = np.clip(120 + 90 * np.sign(np.sin((xx + 3 * t) / 11.0)) +
                    rng.randint(-6, 7, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(128 + 30 * np.sign(np.sin(
            (xx[::2, ::2] + 3 * t) / 11.0)) +
            rng.randint(-8, 9, (h // 2, w // 2)), 0, 255).astype(np.uint8)
        v = np.clip(128 - 25 * np.sign(np.sin(
            (xx[::2, ::2] + 3 * t) / 11.0)) +
            rng.randint(-8, 9, (h // 2, w // 2)), 0, 255).astype(np.uint8)
        return y, u, v

    frames = [mk(t) for t in range(3)]
    enc = VideoEncoder(EncoderConfig(w, h, qindex=180, enable_ccso=True),
                       keyint=64)
    dec = Decoder(ccso=True)
    fired = False
    for i, fr in enumerate(frames):
        payload, rec = enc.encode_frame(*fr)
        out = dec.decode_frame_obus(payload)
        assert out is not None
        for pi, (a, b) in enumerate(zip(out, rec)):
            np.testing.assert_array_equal(
                np.asarray(a, np.int32), np.asarray(b, np.int32),
                err_msg=f"frame {i} plane {pi}")
        fired = fired or dec._ccso_flags.any()
    assert fired, "CCSO never enabled on this clip — search regression"


def test_ccso_with_cdef_and_lr_roundtrip():
    """Stacked in-loop pipeline deblock → CDEF → CCSO → LR decodes
    bit-exactly (apply-order + boundary-context contract)."""
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder

    w, h = 128, 64
    frames = _moving_clip(w, h, 3, seed=9)
    enc = VideoEncoder(EncoderConfig(w, h, qindex=170, enable_cdef=True,
                                     enable_lr=True, enable_ccso=True),
                       keyint=64)
    dec = Decoder(ccso=True)
    for i, fr in enumerate(frames):
        payload, rec = enc.encode_frame(*fr)
        out = dec.decode_frame_obus(payload)
        for pi, (a, b) in enumerate(zip(out, rec)):
            np.testing.assert_array_equal(
                np.asarray(a, np.int32), np.asarray(b, np.int32),
                err_msg=f"frame {i} plane {pi}")

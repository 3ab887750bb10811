"""Our decoder must reproduce the encoder's recon bit-exactly (round-trip)."""

import numpy as np
import pytest


def _synth(w, h, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(100 + 60 * np.sin((xx + yy) / 9.0) +
                rng.randint(-5, 6, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(120 + rng.randint(-9, 10, (h // 2, w // 2)), 0,
                255).astype(np.uint8)
    v = np.clip(130 + rng.randint(-9, 10, (h // 2, w // 2)), 0,
                255).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("q,lf", [
    pytest.param(80, 0, marks=pytest.mark.slow),   # low-q: minutes
    (150, -1), (220, -1)])
def test_roundtrip_own_decoder(q, lf):
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder

    w, h = 128, 64
    enc = IntraEncoder(EncoderConfig(w, h, qindex=q, lf_level=lf))
    dec = Decoder()
    for i in range(2):
        frame = _synth(w, h, i)
        payload, rec = enc.encode_frame(*frame)
        out = dec.decode_frame_obus(payload)
        assert out is not None
        for name, mine, theirs in zip("yuv", rec, out):
            np.testing.assert_array_equal(np.asarray(mine).astype(np.uint8),
                                          theirs, err_msg=f"plane {name}")


@pytest.mark.slow          # its own ~3-min part-wavefront compile; 10-bit
def test_roundtrip_own_decoder_10bit():  # conformance also covered by
    from svtav1_tpu.decoder.decoder import Decoder  # test_10bit_video.py
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder

    w, h = 128, 64
    rng = np.random.RandomState(7)
    y = rng.randint(0, 1024, (h, w)).astype(np.uint16)
    u = rng.randint(0, 1024, (h // 2, w // 2)).astype(np.uint16)
    v = rng.randint(0, 1024, (h // 2, w // 2)).astype(np.uint16)
    enc = IntraEncoder(EncoderConfig(w, h, qindex=120, bit_depth=10))
    payload, rec = enc.encode_frame(y, u, v)
    out = Decoder().decode_frame_obus(payload)
    assert out is not None
    for name, mine, theirs in zip("yuv", rec, out):
        assert theirs.dtype == np.uint16
        np.testing.assert_array_equal(
            np.asarray(mine).astype(np.uint16), theirs,
            err_msg=f"plane {name}")

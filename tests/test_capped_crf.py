"""Capped CRF: over-cap frames re-encode at higher qindex and the
stream stays decodable (reference: EbRateControlProcess.c capped_crf +
re-encode entry EbEncDecProcess.c:3222)."""
import numpy as np
import pytest

from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder

pytestmark = pytest.mark.slow          # encodes frames end to end


def _frames(n, w=192, h=128, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for t in range(n):
        y = rng.randint(0, 256, (h, w)).astype(np.uint8)   # incompressible
        u = rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


def test_cap_reencodes_and_stays_decodable():
    frames = _frames(2)
    base = IntraEncoder(EncoderConfig(192, 128, qindex=60,
                                      part_search=False))
    p0, _ = base.encode_frames(frames)
    cap = (len(p0[0]) * 8) * 7 // 10               # force an overage
    enc = IntraEncoder(EncoderConfig(192, 128, qindex=60,
                                     part_search=False))
    enc.cap_bits = cap
    ps, recons = enc.encode_frames(frames)
    assert len(ps[0]) * 8 < len(p0[0]) * 8         # re-encoded smaller
    from svtav1_tpu.decoder.decoder import Decoder
    dec = Decoder()
    outs = []
    for p in ps:
        outs.append(dec.decode_frame_obus(p))
    assert len(outs) == 2
    # recon returned by the encoder matches its own decode
    np.testing.assert_array_equal(np.asarray(recons[0][0]),
                                  np.asarray(outs[0][0])[:128])


def test_no_cap_is_identity():
    frames = _frames(1, seed=1)
    a = IntraEncoder(EncoderConfig(192, 128, qindex=80,
                                   part_search=False))
    b = IntraEncoder(EncoderConfig(192, 128, qindex=80,
                                   part_search=False))
    b.cap_bits = 10 ** 9
    pa, _ = a.encode_frames(frames)
    pb, _ = b.encode_frames(frames)
    assert pa[0] == pb[0]

"""Metadata OBUs (HDR CLL/MDCV, ITU-T T.35) — EbMetadataHandle.c analogue."""

import numpy as np

from svtav1_tpu.utils import metadata as MD
from svtav1_tpu.utils.obu import parse_obus


def test_cll_roundtrip():
    obu = MD.write_hdr_cll_obu(MD.ContentLight(1000, 400))
    [(t, _, _, payload)] = list(parse_obus(obu))
    assert t == 5
    mtype, v = MD.parse_metadata_payload(payload)
    assert mtype == MD.METADATA_TYPE_HDR_CLL
    assert (v.max_cll, v.max_fall) == (1000, 400)


def test_mdcv_roundtrip():
    md = MD.parse_mastering_display_str(
        "G(0.265,0.690)B(0.150,0.060)R(0.680,0.320)"
        "WP(0.3127,0.3290)L(1000,0.01)")
    obu = MD.write_hdr_mdcv_obu(md)
    [(t, _, _, payload)] = list(parse_obus(obu))
    mtype, v = MD.parse_metadata_payload(payload)
    assert mtype == MD.METADATA_TYPE_HDR_MDCV
    assert v == md
    # R is primary[0] in the bitstream (CICP order)
    assert v.primary_x[0] == int(round(0.680 * (1 << 16)))
    assert v.luminance_max == 1000 << 8
    assert v.luminance_min == int(round(0.01 * (1 << 14)))


def test_t35_roundtrip():
    obu = MD.write_itut_t35_obu(MD.ItutT35(0xB5, b"\x00\x3c\x00\x01hello"))
    [(t, _, _, payload)] = list(parse_obus(obu))
    mtype, v = MD.parse_metadata_payload(payload)
    assert mtype == MD.METADATA_TYPE_ITUT_T35
    assert v.country_code == 0xB5 and v.payload.endswith(b"hello")


def test_metadata_in_stream_and_own_decoder():
    """Encode with metadata; the first TU carries the OBUs after the
    sequence header, our decoder collects them, pixels are unchanged."""
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder

    w, h = 128, 64
    rng = np.random.RandomState(0)
    frame = tuple(np.clip(rng.randint(0, 255, s), 0, 255).astype(np.uint8)
                  for s in ((h, w), (h // 2, w // 2), (h // 2, w // 2)))
    meta = MD.build_metadata_obus(
        mastering_display="G(0.265,0.690)B(0.150,0.060)R(0.680,0.320)"
                          "WP(0.3127,0.3290)L(1000,0.01)",
        content_light="1000,400")
    base = IntraEncoder(EncoderConfig(w, h, qindex=100, part_search=False))
    p0, _ = base.encode_frame(*frame)
    enc = IntraEncoder(EncoderConfig(w, h, qindex=100, part_search=False,
                                     metadata=meta))
    p1, rec = enc.encode_frame(*frame)
    types = [t for t, _, _, _ in parse_obus(p1)]
    assert types.count(5) == 2
    # metadata sits after the sequence header, before the frame OBU
    assert types.index(1) < types.index(5) < types.index(6)
    dec = Decoder()
    dy, du, dv = dec.decode_frame_obus(p1)
    assert np.array_equal(dy, rec[0])
    assert len(dec.metadata) == 2
    got = dict(dec.metadata)
    assert got[MD.METADATA_TYPE_HDR_CLL].max_cll == 1000
    assert got[MD.METADATA_TYPE_HDR_MDCV].white_x == int(
        round(0.3127 * (1 << 16)))
    # pixel payload identical to the metadata-free stream
    assert p1[-len(p0) // 2:] == p0[-len(p0) // 2:]

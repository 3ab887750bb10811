"""Regression tests for the flat (part_search=False) coding path.

Round 2 shipped a NameError in IntraEncoder.host_finish for the non-partition
device tuple (the film-grain commit referenced `frames` that the flat path
didn't carry), which crashed bench.py and presets M11-M13.  These tests
encode through the flat path end-to-end so that path can never silently
regress again.
"""

import numpy as np
import pytest

from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder
from svtav1_tpu.encoder.presets import apply_preset


def _synth(w, h, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(100 + 50 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0) +
                rng.randint(-6, 7, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 31.0), 0, 255).astype(np.uint8)
    v = np.clip(130 + 25 * np.cos(yy[::2, ::2] / 29.0), 0, 255).astype(np.uint8)
    return y, u, v


def test_flat_path_encodes():
    """part_search=False batch encode must produce payloads (the bench
    configuration; regression for the round-2 `frames` NameError)."""
    w, h = 128, 64
    enc = IntraEncoder(EncoderConfig(w, h, qindex=100, part_search=False))
    frames = [_synth(w, h, i) for i in range(2)]
    payloads, recons = enc.encode_frames(frames)
    assert len(payloads) == 2 and all(len(p) > 100 for p in payloads)
    assert recons[0][0].shape == (h, w)


def test_flat_path_with_film_grain():
    """The exact crash shape: flat path + film grain header per frame."""
    w, h = 128, 64
    enc = IntraEncoder(EncoderConfig(w, h, qindex=100, part_search=False,
                                     film_grain=8))
    frames = [_synth(w, h, i) for i in range(2)]
    payloads, _ = enc.encode_frames(frames)
    assert len(payloads) == 2 and all(len(p) > 100 for p in payloads)


@pytest.mark.parametrize("preset", [11, 12, 13])
def test_fast_presets_smoke(preset):
    """M11-M13 map to part_search=False; each must encode without error."""
    w, h = 128, 64
    cfg = apply_preset(EncoderConfig(w, h, qindex=120), preset)
    assert not cfg.part_search
    enc = IntraEncoder(cfg)
    payload, rec = enc.encode_frame(*_synth(w, h, preset))
    assert len(payload) > 100


def test_flat_path_roundtrip_own_decoder():
    """Flat-path stream must decode bit-exactly in our own decoder."""
    from svtav1_tpu.decoder.decoder import Decoder

    w, h = 128, 64
    enc = IntraEncoder(EncoderConfig(w, h, qindex=100, part_search=False))
    frame = _synth(w, h, 3)
    payload, rec = enc.encode_frame(*frame)
    dec = Decoder()
    out = dec.decode_frame_obus(payload)
    assert out, "decoder produced no frame"
    dy, du, dv = out[0] if isinstance(out, list) else out
    np.testing.assert_array_equal(np.asarray(rec[0], np.uint8), dy)
    np.testing.assert_array_equal(np.asarray(rec[1], np.uint8), du)
    np.testing.assert_array_equal(np.asarray(rec[2], np.uint8), dv)

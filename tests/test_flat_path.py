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


@pytest.mark.slow
def test_flat_path_dav1d_conformance(tmp_path):
    """Flat-path streams (searched uv_mode + implied chroma tx types) must
    decode frame-exactly in dav1d — the chroma-MD change made this path's
    conformance depend on the Mode_To_Txfm_Type rule (spec compute_tx_type,
    reference EbCommonUtils.h:67), which our own decoder alone can't catch
    (it shares the encoder's assumptions)."""
    import subprocess
    from pathlib import Path

    from svtav1_tpu.utils.ivf import IvfWriter

    av1dec = Path(__file__).parent.parent / "tools" / "av1dec"
    if not av1dec.exists():
        pytest.skip("no av1dec oracle")
    w, h, n = 128, 64, 2
    enc = IntraEncoder(EncoderConfig(w, h, qindex=100, part_search=False))
    recs = []
    ivf_path = tmp_path / "flat.ivf"
    with open(ivf_path, "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i in range(n):
            payload, rec = enc.encode_frame(*_synth(w, h, i))
            recs.append(tuple(np.asarray(p) for p in rec))
            ivf.write_frame(payload, i)
    yuv = tmp_path / "flat.yuv"
    r = subprocess.run([str(av1dec), str(ivf_path), str(yuv)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    raw = yuv.read_bytes()
    ys, cs = w * h, (w // 2) * (h // 2)
    fs = ys + 2 * cs
    for i, rec in enumerate(recs):
        off = i * fs
        dy = np.frombuffer(raw[off:off + ys], np.uint8).reshape(h, w)
        du = np.frombuffer(raw[off + ys:off + ys + cs],
                           np.uint8).reshape(h // 2, w // 2)
        dv = np.frombuffer(raw[off + ys + cs:off + fs],
                           np.uint8).reshape(h // 2, w // 2)
        np.testing.assert_array_equal(rec[0], dy)
        np.testing.assert_array_equal(rec[1], du)
        np.testing.assert_array_equal(rec[2], dv)

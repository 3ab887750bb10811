"""Temporal filtering (MCTF) tests — op behavior + encoder wiring.

Reference behavior: EbTemporalFiltering.c alt-ref/key-frame filtering
(block ME per neighbour, per-pixel decay weights, weighted average).
TF is encoder-side only; the wiring test checks the filtered-anchor
pyramid stream still decodes frame-exactly in dav1d.
"""

import numpy as np
import pytest

from test_e2e_inter import _dav1d_frames, _ensure_av1dec

pytestmark = pytest.mark.slow


def _noisy_clip(w, h, n, amp=8, seed=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    clips, cleans = [], []
    for t in range(n):
        clean = np.clip(110 + 70 * np.sin((xx + 4 * t) / 19.0) +
                        50 * np.cos((yy + 2 * t) / 13.0), 0, 255)
        y = np.clip(clean + rng.randint(-amp, amp + 1, (h, w)), 0,
                    255).astype(np.uint8)
        u = np.clip(120 + 40 * np.sin((xx[::2, ::2] + t) / 23.0), 0,
                    255).astype(np.uint8)
        v = np.clip(135 + 35 * np.cos((yy[::2, ::2] + t) / 27.0), 0,
                    255).astype(np.uint8)
        clips.append((y, u, v))
        cleans.append(clean)
    return clips, cleans


def test_tf_denoises_moving_content():
    """MC-aligned averaging must reduce noise without smearing the
    moving texture: MSE against the clean signal drops substantially."""
    from svtav1_tpu.ops.tf import temporal_filter_frame

    frames, cleans = _noisy_clip(192, 128, 5)
    center = frames[2]
    nbs = [frames[i] for i in (0, 1, 3, 4)]
    out = temporal_filter_frame(center, nbs, qindex=120)
    assert out[0].dtype == np.uint8
    before = np.mean((center[0].astype(float) - cleans[2]) ** 2)
    after = np.mean((out[0].astype(float) - cleans[2]) ** 2)
    assert after < before * 0.5, (before, after)


def test_tf_no_neighbors_identity():
    from svtav1_tpu.ops.tf import temporal_filter_frame

    frames, _ = _noisy_clip(64, 64, 1)
    out = temporal_filter_frame(frames[0], [], qindex=100)
    for a, b in zip(out, frames[0]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not _ensure_av1dec(), reason="no libavcodec")
def test_tf_pyramid_conformance(tmp_path):
    """TF only rewrites anchor SOURCES; the emitted stream must still
    decode frame-exactly in dav1d."""
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    w, h, n = 128, 64, 9
    frames, _ = _noisy_clip(w, h, n)
    enc = VideoEncoder(EncoderConfig(w, h, qindex=120), keyint=64,
                       pyramid=True, tf=True)
    payloads, recons = enc.encode_frames(frames)
    p2, r2 = enc.flush()
    payloads += p2
    recons += r2
    assert len(recons) == n
    ivf = tmp_path / "tf.ivf"
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, w, h)
        for i, p in enumerate(payloads):
            wtr.write_frame(p, i)
        wtr.finalize()
    decoded = _dav1d_frames(ivf, w, h, n)
    for i, (rec, dav) in enumerate(zip(recons, decoded)):
        for name, mine, theirs in zip("yuv", rec, dav):
            np.testing.assert_array_equal(
                np.asarray(mine).astype(np.uint8), theirs,
                err_msg=f"frame {i} plane {name}")

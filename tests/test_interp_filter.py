"""Frame-level interpolation-filter search (EbEncInterPrediction.c:2413
interpolation filter search analogue, frame-level syntax): the encoder
evaluates REGULAR/SMOOTH/SHARP MC predictions at the chosen MVs and
signals the argmin via the frame header's interpolation_filter.  Recon
must stay conformant for every choice — forced-filter encodes round-trip
through our decoder (fast) and decode frame-exact in dav1d (slow)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

TOOLS = Path(__file__).parent.parent / "tools"
AV1DEC = TOOLS / "av1dec"


def _clip(w, h, n, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = np.clip(110 + 70 * np.sin((xx + 2.5 * t) / 19.0) +
                    50 * np.cos((yy + 1.5 * t) / 13.0) +
                    rng.randint(-3, 4, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(120 + 40 * np.sin((xx[::2, ::2] + t) / 23.0),
                    0, 255).astype(np.uint8)
        v = np.clip(135 + 35 * np.cos((yy[::2, ::2] + 0.5 * t) / 27.0),
                    0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


@pytest.mark.parametrize("forced", [1, 2, None])
def test_forced_filter_own_roundtrip(forced, monkeypatch):
    """Every filter choice (and the live search) must produce a stream our
    decoder reproduces bit-exactly (flat inter path)."""
    import svtav1_tpu.encoder.video_encoder as VE
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig

    if forced is not None:
        monkeypatch.setattr(VE, "_pick_interp_filt",
                            lambda *a, f=forced: f)
    w, h = 128, 64
    frames = _clip(w, h, 3)
    enc = VE.VideoEncoder(EncoderConfig(w, h, qindex=120,
                                        part_search=False), keyint=64)
    dec = Decoder()
    for i, fr in enumerate(frames):
        payload, rec = enc.encode_frame(*fr)
        out = dec.decode_frame_obus(payload)
        for name, mine, theirs in zip("yuv", rec, out):
            np.testing.assert_array_equal(
                np.asarray(mine).astype(np.uint8), theirs,
                err_msg=f"forced={forced} frame {i} plane {name}")


def test_search_returns_regular_for_integer_mvs():
    """All-zero (integer) MVs are filter-invariant: the search must not
    dispatch and must return REGULAR."""
    import jax.numpy as jnp
    from svtav1_tpu.encoder.video_encoder import _pick_interp_filt
    from svtav1_tpu.ops.mc import pad_plane

    h = w = 64
    src = jnp.zeros((1, h, w), jnp.int32)
    refp = pad_plane(jnp.zeros((1, h, w), jnp.int32))
    y0 = jnp.zeros((1, 4), jnp.int32)
    x0 = jnp.zeros((1, 4), jnp.int32)
    mv = jnp.zeros((1, 4, 2), jnp.int32) * 8
    assert _pick_interp_filt(src, refp, y0, x0, mv, h, w, 8) == 0


def _ensure_av1dec():
    if AV1DEC.exists():
        return True
    r = subprocess.run(
        f"gcc -O2 -o {AV1DEC} {TOOLS}/av1dec.c -lavformat -lavcodec "
        "-lavutil", shell=True, capture_output=True)
    return r.returncode == 0


@pytest.mark.slow
@pytest.mark.parametrize("forced", [1, 2])
def test_forced_filter_dav1d_conformance(tmp_path, forced, monkeypatch):
    if not _ensure_av1dec():
        pytest.skip("no libavcodec")
    import svtav1_tpu.encoder.video_encoder as VE
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.utils.ivf import IvfWriter

    monkeypatch.setattr(VE, "_pick_interp_filt", lambda *a, f=forced: f)
    w, h, n = 128, 64, 4
    frames = _clip(w, h, n)
    enc = VE.VideoEncoder(EncoderConfig(w, h, qindex=110), keyint=64)
    path = tmp_path / "f.ivf"
    recons = []
    with open(path, "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i, fr in enumerate(frames):
            payload, rec = enc.encode_frame(*fr)
            ivf.write_frame(payload, i)
            recons.append(rec)
        ivf.finalize()
    yuv = str(path) + ".yuv"
    r = subprocess.run([str(AV1DEC), str(path), yuv],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    data = np.fromfile(yuv, np.uint8)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    assert len(data) == fsz * n
    for i, rec in enumerate(recons):
        off = i * fsz
        dav_y = data[off:off + w * h].reshape(h, w)
        np.testing.assert_array_equal(
            np.asarray(rec[0]).astype(np.uint8), dav_y,
            err_msg=f"forced={forced} frame {i} luma")

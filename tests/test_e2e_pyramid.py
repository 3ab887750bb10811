"""E2E conformance for the hierarchical mini-GoP (pyramid) path:
out-of-order no-show P frames + show_existing overlays must decode in
dav1d to exactly our display-order recons, and round-trip through our
own decoder.  Reference behavior: prediction structures + overlay
pictures (EbPredictionStructure.c:77-161, EbPictureDecisionProcess.c)."""

from pathlib import Path

import numpy as np
import pytest

from test_e2e_inter import (_dav1d_frames, _ensure_av1dec, _moving_clip)

pytestmark_slow = pytest.mark.slow
pytestmark = [pytestmark_slow, pytest.mark.skipif(not _ensure_av1dec(),
                                reason="no libavcodec available")]


def _encode_pyramid(frames, w, h, q, path, keyint=64):
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    enc = VideoEncoder(EncoderConfig(w, h, qindex=q), keyint=keyint,
                       pyramid=True)
    payloads, recons = enc.encode_frames(frames)
    p2, r2 = enc.flush()
    payloads += p2
    recons += r2
    nbytes = 0
    with open(path, "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i, p in enumerate(payloads):
            ivf.write_frame(p, i)
            nbytes += len(p)
        ivf.finalize()
    return payloads, recons, nbytes


@pytest.mark.parametrize("n", [9, 6])
def test_pyramid_conformance(tmp_path, n):
    w, h = 128, 64
    frames = _moving_clip(w, h, n)
    ivf = tmp_path / "pyr.ivf"
    payloads, recons, _ = _encode_pyramid(frames, w, h, 120, ivf)
    assert len(recons) == n
    assert len(payloads) > n          # show_existing overlay TUs present
    got = _dav1d_frames(ivf, w, h, n)
    for i, ((gy, gu, gv), (ry, ru, rv)) in enumerate(zip(got, recons)):
        np.testing.assert_array_equal(gy, ry, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(gu, ru, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(gv, rv, err_msg=f"frame {i} V")


def test_pyramid_roundtrip_own_decoder(tmp_path):
    from svtav1_tpu.decoder.decoder import Decoder

    w, h = 128, 64
    n = 6
    frames = _moving_clip(w, h, n)
    ivf = tmp_path / "pyr2.ivf"
    payloads, recons, _ = _encode_pyramid(frames, w, h, 140, ivf)
    dec = Decoder()
    out = []
    for p in payloads:
        f = dec.decode_frame_obus(p)
        if f is not None:
            out.append(f)
    assert len(out) == n
    for i, ((gy, gu, gv), (ry, ru, rv)) in enumerate(zip(out, recons)):
        np.testing.assert_array_equal(gy, ry, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(gu, ru, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(gv, rv, err_msg=f"frame {i} V")


@pytest.mark.parametrize("n", [9])
def test_pyramid_compound_conformance(tmp_path, n):
    """Interior pyramid frames use COMPOUND_AVERAGE (LAST+ALTREF pair,
    NEW_NEWMV / NEAREST_NEARESTMV / GLOBAL_GLOBALMV) — dav1d must
    reproduce display frames exactly (the compound MVP stacks, ref
    signaling, and jnt-convolve rounding are all on the line here)."""
    w, h = 128, 64
    frames = _moving_clip(w, h, n, seed=3)
    ivf = tmp_path / "pyrc.ivf"
    payloads, recons, _ = _encode_pyramid(frames, w, h, 140, ivf)
    assert len(recons) == n
    got = _dav1d_frames(ivf, w, h, n)
    for i, ((gy, gu, gv), (ry, ru, rv)) in enumerate(zip(got, recons)):
        np.testing.assert_array_equal(gy, ry, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(gu, ru, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(gv, rv, err_msg=f"frame {i} V")


def test_pyramid_compound_roundtrip_own_decoder(tmp_path):
    from svtav1_tpu.decoder.decoder import Decoder

    w, h = 128, 64
    n = 6
    frames = _moving_clip(w, h, n, seed=4)
    ivf = tmp_path / "pyrc2.ivf"
    payloads, recons, _ = _encode_pyramid(frames, w, h, 150, ivf)
    dec = Decoder()
    out = []
    for p in payloads:
        f = dec.decode_frame_obus(p)
        if f is not None:
            out.append(f)
    assert len(out) == n
    for i, ((gy, gu, gv), (ry, ru, rv)) in enumerate(zip(out, recons)):
        np.testing.assert_array_equal(gy, ry, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(gu, ru, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(gv, rv, err_msg=f"frame {i} V")

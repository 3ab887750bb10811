"""Full-frame film grain synthesis + end-to-end bitstream wiring.

- golden: whole-frame apply must be bit-exact vs the reference's
  svt_av1_add_film_grain_run (tools/gen_golden_fg_frame.py oracle) —
  covers stripe assembly, 32x32 offsets, overlap blending, partial
  edge blocks;
- e2e: a stream carrying estimated grain params (KF full syntax +
  inter update_grain=0 load path) must decode in dav1d to EXACTLY what
  our decoder outputs (grain applied at display, references clean).
"""

from pathlib import Path

import numpy as np
import pytest

from test_e2e_inter import _ensure_av1dec, AV1DEC

pytestmark = pytest.mark.slow

DATA = Path(__file__).parent / "data" / "golden_fg_frame.npz"


def _params_from_ip(ip):
    lag = int(ip[3])
    return dict(
        num_y_points=int(ip[0]), num_cb_points=int(ip[1]),
        num_cr_points=int(ip[2]), ar_coeff_lag=lag,
        ar_coeff_shift=int(ip[4]), grain_scale_shift=int(ip[5]),
        random_seed=int(ip[6]), bit_depth=8,
        chroma_scaling_from_luma=int(ip[7]), scaling_shift=int(ip[8]),
        cb_mult=int(ip[9]), cb_luma_mult=int(ip[10]),
        cb_offset=int(ip[11]), cr_mult=int(ip[12]),
        cr_luma_mult=int(ip[13]), cr_offset=int(ip[14]),
        overlap_flag=int(ip[15]), clip_to_restricted_range=int(ip[16]),
        scaling_points_y=[(int(ip[20 + 2 * i]), int(ip[21 + 2 * i]))
                          for i in range(ip[0])],
        scaling_points_cb=[(int(ip[48 + 2 * i]), int(ip[49 + 2 * i]))
                           for i in range(ip[1])],
        scaling_points_cr=[(int(ip[76 + 2 * i]), int(ip[77 + 2 * i]))
                           for i in range(ip[2])],
        ar_coeffs_y=ip[104:128].tolist(),
        ar_coeffs_cb=ip[128:153].tolist(),
        ar_coeffs_cr=ip[153:178].tolist())


@pytest.mark.parametrize("case", range(6))
def test_fg_frame_golden(case):
    from svtav1_tpu.ops.film_grain import apply_film_grain

    d = np.load(DATA)
    p = _params_from_ip(d[f"c{case}_ip"])
    out = apply_film_grain(p, (d[f"c{case}_in_y"], d[f"c{case}_in_cb"],
                               d[f"c{case}_in_cr"]))
    for a, k in zip(out, ("y", "cb", "cr")):
        np.testing.assert_array_equal(a, d[f"c{case}_out_{k}"],
                                      err_msg=f"case {case} {k}")


def test_grain_estimation_roundtrip():
    """noise_model estimation on a noisy source yields signalable
    params whose synthesized grain std is in the right ballpark."""
    from svtav1_tpu.encoder.noise_model import estimate_grain_params

    rng = np.random.RandomState(9)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    base = 110 + 60 * np.sin(xx / 37.0) + 40 * np.cos(yy / 41.0)
    y = np.clip(base + rng.normal(0, 5.0, (h, w)), 0,
                255).astype(np.uint8)
    u = np.clip(120 + rng.normal(0, 3.0, (h // 2, w // 2)), 0,
                255).astype(np.uint8)
    v = np.clip(130 + rng.normal(0, 3.0, (h // 2, w // 2)), 0,
                255).astype(np.uint8)
    p = estimate_grain_params(y, u, v)
    assert p is not None
    assert 1 <= p["num_y_points"] <= 14
    assert all(0 <= x <= 255 and 0 <= s <= 255
               for x, s in p["scaling_points_y"])
    assert all(-128 <= c <= 127 for c in p["ar_coeffs_y"])


@pytest.mark.skipif(not _ensure_av1dec(), reason="no libavcodec")
def test_film_grain_e2e(tmp_path):
    import subprocess

    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    rng = np.random.RandomState(3)
    w, h, n = 128, 64, 4
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = np.clip(110 + 70 * np.sin((xx + 4 * t) / 19.0) +
                    rng.normal(0, 4.0, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(120 + 40 * np.sin(xx[::2, ::2] / 23.0) +
                    rng.normal(0, 3.0, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        v = np.clip(135 + 35 * np.cos(yy[::2, ::2] / 27.0) +
                    rng.normal(0, 3.0, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        frames.append((y, u, v))
    enc = VideoEncoder(EncoderConfig(w, h, qindex=140, film_grain=8),
                       keyint=64)
    ivf = tmp_path / "fg.ivf"
    with open(ivf, "wb") as f:
        wtr = IvfWriter(f, w, h)
        for i, fr in enumerate(frames):
            payload, _ = enc.encode_frame(*fr)
            wtr.write_frame(payload, i)
        wtr.finalize()
    # grain must actually be in the stream
    assert enc.intra._fg_params, "estimation found no grain"

    yuv = str(ivf) + ".yuv"
    r = subprocess.run([str(AV1DEC), str(ivf), yuv],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    data = np.fromfile(yuv, np.uint8)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    assert len(data) == fsz * n

    dec = Decoder()
    ours = []
    with open(ivf, "rb") as f:
        f.read(32)
        import struct
        while True:
            hd = f.read(12)
            if len(hd) < 12:
                break
            sz, _ = struct.unpack("<IQ", hd)
            fr = dec.decode_frame_obus(f.read(sz))
            if fr is not None:
                ours.append(fr)
    assert len(ours) == n
    for i in range(n):
        off = i * fsz
        dy = data[off:off + w * h].reshape(h, w)
        du = data[off + w * h:off + w * h + fsz // 6].reshape(h // 2,
                                                              w // 2)
        dv = data[off + fsz - fsz // 6:off + fsz].reshape(h // 2, w // 2)
        for name, mine, theirs in zip("yuv", ours[i], (dy, du, dv)):
            np.testing.assert_array_equal(
                np.asarray(mine).astype(np.uint8), theirs,
                err_msg=f"frame {i} plane {name}")

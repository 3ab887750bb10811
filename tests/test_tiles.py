"""Multi-tile (tile-column) encoding: conformance + sharded byte-equality.

The tile axis is the multi-chip scale-out axis (SURVEY §2.9): tiles encode
independently per AV1 semantics, so sharding them over a device mesh must
not change one bit of the stream — certified here on the 8-device CPU mesh
(the driver repeats the check in dryrun_multichip)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TOOLS = Path(__file__).parent.parent / "tools"
AV1DEC = TOOLS / "av1dec"


def _clip(w, h, n, seed=5):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = np.clip(120 + 70 * np.sin((xx + yy + 5 * t) / 9.0) +
                    (rng.randint(-40, 41, (h, w)) * ((xx // 32) % 2)), 0,
                    255).astype(np.uint8)
        u = np.clip(120 + 30 * np.sin((xx[::2, ::2] + 2 * t) / 30.0), 0,
                    255).astype(np.uint8)
        v = np.clip(130 + 30 * np.cos((yy[::2, ::2] + t) / 20.0), 0,
                    255).astype(np.uint8)
        out.append((y, u, v))
    return out


def test_two_tile_roundtrip_and_dav1d(tmp_path):
    from svtav1_tpu.decoder.decoder import Decoder
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder
    from svtav1_tpu.utils.ivf import IvfWriter

    w, h, n = 256, 64, 2
    frames = _clip(w, h, n)
    enc = VideoEncoder(EncoderConfig(w, h, qindex=100, tile_cols=2),
                       keyint=64)
    dec = Decoder()
    payloads, recons = [], []
    for i, fr in enumerate(frames):
        payload, rec = enc.encode_frame(*fr)
        payloads.append(payload)
        recons.append(rec)
        out = dec.decode_frame_obus(payload)
        for name, mine, theirs in zip("yuv", rec, out):
            np.testing.assert_array_equal(
                np.asarray(mine).astype(np.uint8), theirs,
                err_msg=f"frame {i} plane {name}")

    if not AV1DEC.exists():
        r = subprocess.run(
            f"gcc -O2 -o {AV1DEC} {TOOLS}/av1dec.c -lavformat -lavcodec "
            "-lavutil", shell=True, capture_output=True)
        if r.returncode:
            pytest.skip("no libavcodec")
    with open(tmp_path / "t.ivf", "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i, p in enumerate(payloads):
            ivf.write_frame(p, i)
        ivf.finalize()
    r = subprocess.run([str(AV1DEC), str(tmp_path / "t.ivf"),
                        str(tmp_path / "t.yuv")], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    data = np.fromfile(tmp_path / "t.yuv", np.uint8)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    assert len(data) == fsz * n
    for i, rec in enumerate(recons):
        np.testing.assert_array_equal(
            np.asarray(rec[0]).astype(np.uint8),
            data[i * fsz:i * fsz + w * h].reshape(h, w),
            err_msg=f"frame {i} dav1d")


def test_sharded_tiles_byte_identical():
    import jax
    from svtav1_tpu.parallel.mesh import (make_mesh,
                                          sharded_tile_encode_bytes)

    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(n, tile_parallel=1)
    sharded = sharded_tile_encode_bytes(mesh, n, shard=True)
    single = sharded_tile_encode_bytes(mesh, n, shard=False)
    assert sharded == single

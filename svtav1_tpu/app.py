"""SvtAv1TpuEncApp equivalent: Y4M in → AV1 IVF out.

Mirrors the reference CLI surface (Source/App/EncApp/EbAppMain.c) at the
subset the framework currently supports; grows with the encoder.

Usage: python -m svtav1_tpu.app -i in.y4m -b out.ivf [-q 100] [-n frames]
"""

from __future__ import annotations

import argparse
import sys
import time
from dataclasses import replace

import numpy as np

from .utils import log


from .ops.metrics import ssim_plane


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
    p.add_argument("--preset", type=int, default=None, metavar="M",
                   help="speed preset 0(slow)..13(fast), reference "
                        "EncModeConfig.c axis; explicit flags override")
    p.add_argument("--no-part-search", action="store_true",
                   help="disable the 32->16 partition RD search")
    p.add_argument("--cdef", action="store_true",
                   help="enable the CDEF in-loop filter (search + signal)")
    p.add_argument("--lr", action="store_true",
                   help="enable loop restoration (SGR search + signal)")
    p.add_argument("--ccso", action="store_true",
                   help="enable the fork's grafted CCSO filter (search + "
                        "signal).  WARNING: like the reference fork's own "
                        "output, CCSO streams are NOT standard AV1 — "
                        "decode with our dec_app --ccso, not dav1d")
    p.add_argument("--pyramid", action="store_true",
                   help="hierarchical mini-GoP prediction structure "
                        "(out-of-order refs + show_existing overlays)")
    p.add_argument("--tf", action="store_true",
                   help="MCTF temporal filtering of anchor pictures "
                        "(needs --pyramid)")
    p.add_argument("--rc", choices=("cq", "crf", "cbr", "vbr"),
                   default=None,
                   help="rate control mode (default: cq, or crf when "
                        "--crf is given)")
    p.add_argument("--tbr", type=int, default=0, metavar="KBPS",
                   help="target bitrate for --rc cbr/vbr")
    p.add_argument("--mbr", type=int, default=0, metavar="KBPS",
                   help="max bitrate cap for capped CRF/CQ (all-intra "
                        "--keyint 1): over-cap frames re-encode at "
                        "higher q (EbRateControlProcess.c capped_crf)")
    p.add_argument("--film-grain", type=int, default=0, metavar="N",
                   help="film grain synthesis strength 0(off)..50: "
                        "noise estimation + grain params in the stream")
    p.add_argument("-n", "--frames", type=int, default=0,
                   help="max frames (0 = all)")
    p.add_argument("--keyint", type=int, default=64,
                   help="key frame interval (1 = all-intra)")
    p.add_argument("--no-cdf-update", action="store_true")
    p.add_argument("--batch", type=int, default=8,
                   help="frames per device batch (amortizes dispatch)")
    p.add_argument("--stat-report", action="store_true")
    p.add_argument("--mastering-display", default=None, metavar="MD",
                   help="HDR mastering display metadata OBU, "
                        "G(x,y)B(x,y)R(x,y)WP(x,y)L(max,min)")
    p.add_argument("--content-light", default=None, metavar="CLL,FALL",
                   help="HDR content light level metadata OBU")
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

    # NOTE: no persistent compile cache — /tmp is a shared cross-machine
    # mount here and XLA:CPU AOT artifacts poisoned round-3 runs
    # (machine-feature mismatch); see STATUS.md.

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
                            part_search=not args.no_part_search,
                            enable_cdef=args.cdef, enable_lr=args.lr,
                            enable_ccso=args.ccso,
                            film_grain=max(0, min(50, args.film_grain)))
        if args.mastering_display or args.content_light:
            from .utils.metadata import build_metadata_obus
            try:
                cfg = replace(cfg, metadata=build_metadata_obus(
                    args.mastering_display, args.content_light))
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 2
        from .encoder.presets import apply_preset, verify_settings
        if args.preset is not None:
            cfg = apply_preset(cfg, args.preset)
            # explicit flags keep CLI-over-preset precedence
            if args.no_part_search:
                cfg = replace(cfg, part_search=False)
            if args.cdef:
                cfg = replace(cfg, enable_cdef=True)
            if args.lr:
                cfg = replace(cfg, enable_lr=True)
            if args.no_cdf_update:
                cfg = replace(cfg, cdf_update=False)
        try:
            verify_settings(cfg, keyint=args.keyint)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        log.info("app", "%dx%d bd=%d q=%d keyint=%d preset=%s",
                 info.width, info.height, info.bit_depth, cfg.qindex,
                 args.keyint, args.preset)
        pyramid = args.pyramid and args.keyint > 1
        rc = None
        rc_mode = args.rc or ("crf" if args.crf is not None else "cq")
        if rc_mode in ("cbr", "vbr") or args.rc in ("cq", "crf"):
            from .encoder.rate_control import RateControl
            try:
                rc = RateControl(rc_mode, qindex=cfg.qindex,
                                 target_kbps=args.tbr,
                                 fps=info.fps_num / max(info.fps_den, 1))
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 2
        if args.mbr and args.keyint != 1:
            print("error: --mbr (capped CRF) is supported for the "
                  "all-intra path (--keyint 1)", file=sys.stderr)
            return 2
        if args.keyint == 1:
            enc = IntraEncoder(cfg)      # batched all-intra path
            if args.mbr:
                enc.cap_bits = int(args.mbr * 1000 * info.fps_den /
                                   max(info.fps_num, 1))
        elif pyramid:
            enc = VideoEncoder(cfg, keyint=args.keyint, pyramid=True,
                               tf=args.tf, rc=rc)
            args.batch = 16              # mini-GoP lookahead granularity
        else:
            enc = VideoEncoder(cfg, keyint=args.keyint, rc=rc)
            args.batch = 1               # low-delay P is reference-serial
        t0 = time.perf_counter()
        n = 0
        total_bytes = 0
        psnrs = []
        ssims = []
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

            src_fifo = []           # display-order sources awaiting recon
            n_tu = [0]              # IVF frames written (TUs)

            def emit(payloads, recons):
                """Write payloads (decode order; may include overlay TUs)
                and match display-order recons against buffered sources
                for stats."""
                nonlocal n, total_bytes
                for payload in payloads:
                    ivf.write_frame(payload, n_tu[0])
                    n_tu[0] += 1
                    total_bytes += len(payload)
                for (ry, ru, rv) in recons:
                    y, u, v = src_fifo.pop(0)
                    if args.stat_report:
                        peak = (1 << info.bit_depth) - 1
                        psnrs.append((psnr(y, ry, peak), psnr(u, ru, peak),
                                      psnr(v, rv, peak)))
                        ssims.append((ssim_plane(y, ry, peak),
                                      ssim_plane(u, ru, peak),
                                      ssim_plane(v, rv, peak)))
                    n += 1

            def finish(batch, payloads, recons):
                src_fifo.extend(batch)
                emit(payloads, recons)

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
            if hasattr(enc, "flush"):
                emit(*enc.flush())
            ivf.finalize()
        dt = time.perf_counter() - t0
        fps = n / dt if dt else 0
        kbps = total_bytes * 8 * info.fps_num / info.fps_den / max(n, 1) / 1000
        print(f"encoded {n} frames in {dt:.2f}s ({fps:.2f} fps), "
              f"{kbps:.1f} kbps")
        if psnrs:
            m = np.mean(psnrs, axis=0)
            print(f"PSNR Y {m[0]:.2f} U {m[1]:.2f} V {m[2]:.2f}")
            s = np.mean(ssims, axis=0)
            print(f"SSIM Y {s[0]:.4f} U {s[1]:.4f} V {s[2]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Dev-time tool: CCSO golden vectors from the fork's EbCcso.c.
Output: tests/data/golden_ccso.npz."""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
OUT = Path(__file__).resolve().parent.parent / "tests/data/golden_ccso.npz"


def build():
    TMP.mkdir(exist_ok=True)
    cmd = (f"gcc -O2 -fPIC -shared -I/root/reference -I{R}/Common/Codec -I{R}/Common/C_DEFAULT "
           f"-I{R}/Encoder/Codec -I{R}/Encoder/C_DEFAULT "
           f"-I/root/reference/Source/API -o {TMP}/libccso.so "
           f"{R}/Common/Codec/EbCcso.c")
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if r.returncode:
        print(r.stderr[:1500])
        raise SystemExit(1)
    und = subprocess.run(f"nm -D -u {TMP}/libccso.so", shell=True,
                         capture_output=True, text=True).stdout
    syms = [l.split()[-1] for l in und.splitlines()
            if " U " in l and "GLIBC" not in l]
    src = "#include <string.h>\n"
    for x in syms:
        if x == "svt_memcpy":
            src += ("void (*svt_memcpy)(void *, const void *, unsigned long)"
                    ";\n__attribute__((constructor)) static void ini(void) "
                    "{ svt_memcpy = (void (*)(void *, const void *, "
                    "unsigned long))memcpy; }\n")
        else:
            src += f"void *{x} = 0;\n"
    (TMP / "ccso_stubs.c").write_text(src)
    subprocess.run(cmd + f" {TMP}/ccso_stubs.c", shell=True, check=True)
    return ctypes.CDLL(str(TMP / "libccso.so"), mode=os.RTLD_LAZY)


def main():
    lib = build()
    lib.derive_ccso_sample_pos.argtypes = [
        np.ctypeslib.ndpointer(np.int32), ctypes.c_int, ctypes.c_uint8]
    f = lib.ccso_filter_block_hbd_wo_buf_c
    f.argtypes = [ctypes.c_void_p,                       # src_y (at offset)
                  np.ctypeslib.ndpointer(np.uint16),     # dst_yuv
                  ctypes.c_int, ctypes.c_int,            # x, y
                  ctypes.c_int, ctypes.c_int,            # pic_w, pic_h
                  np.ctypeslib.ndpointer(np.int32),      # src_cls scratch
                  np.ctypeslib.ndpointer(np.int8),       # offset_buf
                  ctypes.c_int, ctypes.c_int,            # y stride, dst stride
                  ctypes.c_int, ctypes.c_int,            # h/v scale
                  ctypes.c_int, ctypes.c_int,            # thr, neg_thr
                  np.ctypeslib.ndpointer(np.int32),      # src_loc
                  ctypes.c_int, ctypes.c_int,            # max_val, blk
                  ctypes.c_bool, ctypes.c_uint8,         # single_band, shift
                  ctypes.c_int, ctypes.c_uint8]          # edge_clf, bo_only

    rng = np.random.RandomState(37)
    data = {}
    case = 0
    PAD = 5
    h = w = 32
    for sup in range(6):
        for scale in (0, 1):
            for mbl, eclf, bo in [(0, 0, 0), (3, 0, 0), (2, 1, 0),
                                  (0, 0, 1)]:
                H, W = h << scale, w << scale
                luma = rng.randint(0, 256,
                                   (H + 2 * PAD, W + 2 * PAD)).astype(
                    np.uint16)
                dst = rng.randint(0, 256, (h, w)).astype(np.uint16)
                lut = rng.randint(-16, 17, 128).astype(np.int8)
                thr = int(rng.choice([4, 8, 16]))
                stride = W + 2 * PAD
                src_loc = np.zeros(2, np.int32)
                lib.derive_ccso_sample_pos(src_loc, stride, sup)
                cls = np.zeros(2, np.int32)
                dst_out = dst.copy()
                ptr = (np.ascontiguousarray(luma).ctypes.data +
                       2 * (PAD * stride + PAD))
                f(ptr, dst_out, 0, 0, w, h, cls, lut, stride, w,
                  scale, scale, thr, -thr, src_loc, 255, 32,
                  mbl == 0, 8 - mbl, eclf, bo)
                data[f"c{case}_luma"] = luma
                data[f"c{case}_dst"] = dst
                data[f"c{case}_out"] = dst_out
                data[f"c{case}_lut"] = lut
                data[f"c{case}_cfg"] = np.array(
                    [sup, scale, mbl, eclf, bo, thr])
                case += 1
    np.savez_compressed(OUT, **data)
    print("wrote", OUT, "cases", case)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-time tool: compound-average convolve goldens from the reference C
(svt_av1_jnt_convolve_2d_c, EbInterPrediction.c:503 — first ref written
to the ConvBuf at intermediate precision, second averaged + final round).
Output: tests/data/golden_compound.npz."""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
OUT = Path(__file__).resolve().parent.parent / "tests/data/golden_compound.npz"

SHIM = r"""
#include "EbInterPrediction.h"

void run_jnt_2d(const uint8_t *src0, const uint8_t *src1, int sstride,
                uint8_t *dst, int dstride, uint16_t *mid, int w, int h,
                int sx0, int sy0, int sx1, int sy1) {
    InterpFilterParams px = av1_interp_filter_params_list[0];
    InterpFilterParams py = av1_interp_filter_params_list[0];
    ConvolveParams cp;
    cp.round_0 = 3;
    cp.round_1 = 7;              /* COMPOUND_ROUND1_BITS */
    cp.is_compound = 1;
    cp.do_average = 0;
    cp.use_jnt_comp_avg = 0;
    cp.fwd_offset = 0;
    cp.bck_offset = 0;
    cp.dst = (ConvBufType *)mid;
    cp.dst_stride = w;
    cp.plane = 0;
    svt_av1_jnt_convolve_2d_c(src0, sstride, dst, dstride, w, h, &px, &py,
                              sx0, sy0, &cp);
    cp.do_average = 1;
    svt_av1_jnt_convolve_2d_c(src1, sstride, dst, dstride, w, h, &px, &py,
                              sx1, sy1, &cp);
}
"""


def main():
    TMP.mkdir(exist_ok=True)
    (TMP / "comp_shim.c").write_text(SHIM)
    cmd = (f"gcc -O2 -fPIC -shared -I{R}/Common/Codec -I{R}/Common/C_DEFAULT "
           f"-I/root/reference/Source/API -o {TMP}/libcomp.so "
           f"{R}/Common/Codec/EbInterPrediction.c {TMP}/comp_shim.c")
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if r.returncode:
        print(r.stderr[:2000])
        raise SystemExit(1)
    und = subprocess.run(f"nm -D -u {TMP}/libcomp.so", shell=True,
                         capture_output=True, text=True).stdout
    syms = [l.split()[-1] for l in und.splitlines()
            if " U " in l and "GLIBC" not in l]
    (TMP / "comp_stubs.c").write_text(
        "".join(f"void *{x} = 0;\n" for x in syms))
    subprocess.run(cmd + f" {TMP}/comp_stubs.c", shell=True, check=True)
    lib = ctypes.CDLL(str(TMP / "libcomp.so"), mode=os.RTLD_LAZY)
    u8p = np.ctypeslib.ndpointer(np.uint8)
    u16p = np.ctypeslib.ndpointer(np.uint16)
    lib.run_jnt_2d.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int, u8p, ctypes.c_int,
                               u16p] + [ctypes.c_int] * 6

    rng = np.random.RandomState(21)
    data = {}
    bs = 16
    m = bs + 16
    for case in range(40):
        src0 = rng.randint(0, 256, (m, m)).astype(np.uint8)
        src1 = rng.randint(0, 256, (m, m)).astype(np.uint8)
        sx0, sy0, sx1, sy1 = (int(v) for v in rng.randint(0, 16, 4))
        dst = np.zeros((bs, bs), np.uint8)
        mid = np.zeros((bs, bs), np.uint16)
        off = 8 * m + 8            # block origin inside the pad
        lib.run_jnt_2d(src0.ctypes.data + off, src1.ctypes.data + off,
                       m, dst, bs, mid, bs, bs, sx0, sy0, sx1, sy1)
        data[f"c{case}_s0"] = src0
        data[f"c{case}_s1"] = src1
        data[f"c{case}_ph"] = np.array([sx0, sy0, sx1, sy1])
        data[f"c{case}_out"] = dst
    np.savez_compressed(OUT, **data)
    print("wrote", OUT)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-time tool: subpel filter kernels (spec data) + convolve goldens.
Outputs: svtav1_tpu/spec/data/interp_filters.npz, tests/data/golden_convolve.npz."""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
SPEC = Path(__file__).resolve().parent.parent / "svtav1_tpu/spec/data"
OUT = Path(__file__).resolve().parent.parent / "tests/data/golden_convolve.npz"

SHIM = r"""
#include "EbInterPrediction.h"

const int16_t *get_kernels(int which) {
    switch (which) {
    case 0: return (const int16_t *)sub_pel_filters_8;        /* REGULAR */
    case 1: return (const int16_t *)sub_pel_filters_8smooth;  /* SMOOTH */
    case 2: return (const int16_t *)sub_pel_filters_8sharp;   /* SHARP */
    case 3: return (const int16_t *)bilinear_filters;         /* BILINEAR */
    case 4: return (const int16_t *)sub_pel_filters_4;
    case 5: return (const int16_t *)sub_pel_filters_4smooth;
    }
    return 0;
}

void run_2d(const uint8_t *src, int sstride, uint8_t *dst, int dstride, int w,
            int h, int fx, int fy, int sx, int sy) {
    InterpFilterParams px = av1_interp_filter_params_list[fx];
    InterpFilterParams py = av1_interp_filter_params_list[fy];
    ConvolveParams cp;
    cp.round_0 = 3;
    cp.round_1 = 11;
    cp.is_compound = 0;
    cp.do_average = 0;
    svt_av1_convolve_2d_sr_c(src, sstride, dst, dstride, w, h, &px, &py, sx,
                             sy, &cp);
}
"""


def main():
    TMP.mkdir(exist_ok=True)
    (TMP / "conv_shim.c").write_text(SHIM)
    cmd = (f"gcc -O2 -fPIC -shared -I{R}/Common/Codec -I{R}/Common/C_DEFAULT "
           f"-I/root/reference/Source/API -o {TMP}/libconv.so "
           f"{R}/Common/Codec/EbInterPrediction.c {TMP}/conv_shim.c")
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if r.returncode:
        print(r.stderr[:2000])
        raise SystemExit(1)
    und = subprocess.run(f"nm -D -u {TMP}/libconv.so", shell=True,
                         capture_output=True, text=True).stdout
    syms = [l.split()[-1] for l in und.splitlines()
            if " U " in l and "GLIBC" not in l]
    src = "#include <string.h>\n"
    for x in syms:
        if "memcpy" in x and x == "svt_memcpy":
            src += ("void (*svt_memcpy)(void *, const void *, unsigned long)"
                    " ;\n__attribute__((constructor)) static void ini(void) "
                    "{ svt_memcpy = (void (*)(void *, const void *, unsigned "
                    "long))memcpy; }\n")
        else:
            src += f"void *{x} = 0;\n"
    (TMP / "conv_stubs.c").write_text(src)
    r = subprocess.run(cmd + f" {TMP}/conv_stubs.c", shell=True,
                       capture_output=True, text=True)
    if r.returncode:
        print(r.stderr[:2000])
        raise SystemExit(1)
    lib = ctypes.CDLL(str(TMP / "libconv.so"), mode=os.RTLD_LAZY)
    lib.get_kernels.restype = ctypes.POINTER(ctypes.c_int16)

    kd = {}
    names = ["regular", "smooth", "sharp", "bilinear"]
    for i, nm in enumerate(names):
        arr = np.ctypeslib.as_array(lib.get_kernels(i), (16, 8)).copy()
        kd[nm] = arr
    SPEC.mkdir(exist_ok=True)
    np.savez_compressed(SPEC / "interp_filters.npz", **kd)

    u8p = np.ctypeslib.ndpointer(np.uint8)
    lib.run_2d.argtypes = [ctypes.c_void_p, ctypes.c_int, u8p,
                           ctypes.c_int] + [ctypes.c_int] * 6
    rng = np.random.RandomState(23)
    data = {}
    case = 0
    for w, h in [(8, 8), (16, 16), (32, 16), (64, 64)]:
        for fx, fy in [(0, 0), (1, 2), (2, 1)]:
            for sx, sy in [(0, 0), (5, 0), (0, 9), (7, 13), (8, 8)]:
                src_img = rng.randint(0, 256,
                                      (h + 16, w + 16)).astype(np.uint8)
                dst = np.zeros((h, w), np.uint8)
                # src pointer at (8, 8)
                flat = np.ascontiguousarray(src_img)
                ptr = flat.ctypes.data + 8 * (w + 16) + 8
                lib.run_2d(ptr, w + 16, dst, w, w, h, fx, fy, sx, sy)
                data[f"c{case}_src"] = src_img
                data[f"c{case}_dst"] = dst
                data[f"c{case}_cfg"] = np.array([w, h, fx, fy, sx, sy])
                case += 1
    np.savez_compressed(OUT, **data)
    print("wrote kernels + goldens, cases", case)


if __name__ == "__main__":
    main()

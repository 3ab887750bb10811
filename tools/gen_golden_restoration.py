#!/usr/bin/env python3
"""Dev-time tool: loop-restoration goldens (Wiener + SGR) from reference C.
Output: tests/data/golden_restoration.npz."""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
OUT = (Path(__file__).resolve().parent.parent /
       "tests/data/golden_restoration.npz")

SHIM = r"""
#include "EbRestoration.h"
#include <stdlib.h>

extern const int32_t svt_aom_eb_x_by_xplus1[256];
extern const int32_t svt_aom_eb_one_by_x[25];
const int32_t *get_xbyx(void) { return svt_aom_eb_x_by_xplus1; }
const int32_t *get_onebyx(void) { return svt_aom_eb_one_by_x; }

/* src points at interior start of an extended buffer */
void run_sgr(const uint8_t *src, int w, int h, int stride, int eps, int xq0,
             int xq1, uint8_t *dst) {
    int32_t *tmp = malloc(2 * RESTORATION_UNITPELS_MAX * sizeof(int32_t));
    int32_t xqd[2] = {xq0, xq1};
    svt_apply_selfguided_restoration_c(src, w, h, stride, eps, xqd, dst, w,
                                       tmp, 8, 0);
    free(tmp);
}
"""

SHIM2 = r"""
#include "EbDefinitions.h"
typedef struct ConvolveParams ConvolveParams;
void svt_av1_wiener_convolve_add_src_c(const uint8_t *src, ptrdiff_t sstride,
    uint8_t *dst, ptrdiff_t dstride, const int16_t *fx, const int16_t *fy,
    int32_t w, int32_t h, const void *cp);
"""


def main():
    TMP.mkdir(exist_ok=True)
    (TMP / "rest_shim.c").write_text(SHIM)
    cmd = (f"gcc -O2 -fPIC -shared -I{R}/Common/Codec -I{R}/Common/C_DEFAULT -I{R}/Encoder/Codec -I{R}/Encoder/C_DEFAULT "
           f"-I/root/reference/Source/API -o {TMP}/librest.so "
           f"{R}/Common/Codec/EbRestoration.c {R}/Common/Codec/convolve.c "
           f"{TMP}/rest_shim.c")
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if r.returncode:
        print(r.stderr[:1500])
        raise SystemExit(1)
    und = subprocess.run(f"nm -D -u {TMP}/librest.so", shell=True,
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
    (TMP / "rest_stubs.c").write_text(src)
    r = subprocess.run(cmd + f" {TMP}/rest_stubs.c", shell=True,
                       capture_output=True, text=True)
    if r.returncode:
        print(r.stderr[:1500])
        raise SystemExit(1)
    lib = ctypes.CDLL(str(TMP / "librest.so"), mode=os.RTLD_LAZY)

    data = {}
    lib.get_xbyx.restype = ctypes.POINTER(ctypes.c_int32)
    lib.get_onebyx.restype = ctypes.POINTER(ctypes.c_int32)
    data["xbyx"] = np.ctypeslib.as_array(
        ctypes.cast(lib.get_xbyx(), ctypes.POINTER(ctypes.c_int32)),
        (256,)).copy()
    data["onebyx"] = np.ctypeslib.as_array(
        ctypes.cast(lib.get_onebyx(), ctypes.POINTER(ctypes.c_int32)),
        (25,)).copy()

    u8p = np.ctypeslib.ndpointer(np.uint8)
    lib.run_sgr.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 6 + [u8p]
    rng = np.random.RandomState(31)
    case = 0
    for w, h in [(32, 32), (16, 32)]:
        for eps in (0, 4, 9, 10, 13, 14, 15):
            for xq0, xq1 in [(-32, 31), (10, 20), (0, 0)]:
                ext = rng.randint(0, 256, (h + 6, w + 6)).astype(np.uint8)
                stride = w + 6
                ptr = np.ascontiguousarray(ext).ctypes.data + 3 * stride + 3
                dst = np.zeros((h, w), np.uint8)
                lib.run_sgr(ptr, w, h, stride, eps, xq0, xq1, dst)
                data[f"s{case}_ext"] = ext
                data[f"s{case}_dst"] = dst
                data[f"s{case}_cfg"] = np.array([w, h, eps, xq0, xq1])
                case += 1
    print("sgr cases", case)

    # wiener
    wfn = lib.svt_av1_wiener_convolve_add_src_c
    wfn.argtypes = [ctypes.c_void_p, ctypes.c_long, u8p, ctypes.c_long,
                    ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_int, ctypes.c_int, ctypes.c_void_p]

    class CP(ctypes.Structure):
        _fields_ = [("ref", ctypes.c_int), ("do_average", ctypes.c_int),
                    ("dst", ctypes.c_void_p), ("dst_stride", ctypes.c_int),
                    ("round_0", ctypes.c_int), ("round_1", ctypes.c_int),
                    ("plane", ctypes.c_int), ("is_compound", ctypes.c_int),
                    ("use_jnt_comp_avg", ctypes.c_int),
                    ("fwd_offset", ctypes.c_int),
                    ("bck_offset", ctypes.c_int),
                    ("use_dist_wtd_comp_avg", ctypes.c_int)]

    kbuf = ctypes.create_string_buffer(1024)
    kaddr = (ctypes.addressof(kbuf) + 255) & ~255
    wcase = 0
    for w, h in [(32, 32), (64, 16)]:
        for _ in range(6):
            t = rng.randint(-23, 24, 3)
            fx = np.array([t[0], t[1], t[2], -2 * int(t.sum()), t[2], t[1],
                           t[0], 0], np.int16)
            t2 = rng.randint(-23, 24, 3)
            fy = np.array([t2[0], t2[1], t2[2], -2 * int(t2.sum()), t2[2],
                           t2[1], t2[0], 0], np.int16)
            ctypes.memmove(kaddr, fx.tobytes(), 16)
            ctypes.memmove(kaddr + 256, fy.tobytes(), 16)
            ext = rng.randint(0, 256, (h + 14, w + 14)).astype(np.uint8)
            stride = w + 14
            ptr = np.ascontiguousarray(ext).ctypes.data + 7 * stride + 7
            dst = np.zeros((h, w), np.uint8)
            cp = CP()
            cp.round_0 = 3
            cp.round_1 = 11
            wfn(ptr, stride, dst, w, kaddr, kaddr + 256, w, h,
                ctypes.byref(cp))
            data[f"w{wcase}_ext"] = ext
            data[f"w{wcase}_dst"] = dst
            data[f"w{wcase}_fx"] = fx
            data[f"w{wcase}_fy"] = fy
            data[f"w{wcase}_cfg"] = np.array([w, h])
            wcase += 1
    print("wiener cases", wcase)
    np.savez_compressed(OUT, **data)
    print("wrote", OUT)


if __name__ == "__main__":
    main()

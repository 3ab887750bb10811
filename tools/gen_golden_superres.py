#!/usr/bin/env python3
"""Superres upscale goldens + normative resize filter table extraction."""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
SPEC = Path(__file__).resolve().parent.parent / "svtav1_tpu/spec/data"
OUT = Path(__file__).resolve().parent.parent / "tests/data/golden_superres.npz"

SHIM = r"""
#include "EbSuperRes.h"
const int16_t *get_filters(void) { return &av1_resize_filter_normative[0][0]; }
void run_rs(const uint8_t *src, int sstride, uint8_t *dst, int dstride,
            int w, int h, int x0_qn, int x_step_qn) {
    av1_convolve_horiz_rs_c(src, sstride, dst, dstride, w, h,
                            &av1_resize_filter_normative[0][0], x0_qn,
                            x_step_qn);
}
"""


def main():
    TMP.mkdir(exist_ok=True)
    # av1_convolve_horiz_rs_c is static in EbSuperRes.c → include the .c
    shim = SHIM.replace('#include "EbSuperRes.h"',
                        '#include <string.h>\n'
                        'void (*svt_memcpy)(void*,const void*,unsigned long);\n'
                        '__attribute__((constructor)) static void ini(void){'
                        'svt_memcpy=(void(*)(void*,const void*,unsigned long))'
                        'memcpy;}\n#include "EbSuperRes.c"')
    (TMP / "sr_shim.c").write_text(shim)
    cmd = (f"gcc -O2 -fPIC -shared -I{R}/Common/Codec -I{R}/Common/C_DEFAULT "
           f"-I{R}/Encoder/Codec -I{R}/Encoder/C_DEFAULT "
           f"-I/root/reference/Source/API -o {TMP}/libsr.so {TMP}/sr_shim.c")
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if r.returncode:
        print(r.stderr[:1500])
        raise SystemExit(1)
    und = subprocess.run(f"nm -D -u {TMP}/libsr.so", shell=True,
                         capture_output=True, text=True).stdout
    syms = [l.split()[-1] for l in und.splitlines()
            if " U " in l and "GLIBC" not in l and "memcpy" not in l]
    (TMP / "sr_stubs.c").write_text(
        "".join(f"void *{x} = 0;\n" for x in syms))
    subprocess.run(cmd + f" {TMP}/sr_stubs.c", shell=True, check=True)
    lib = ctypes.CDLL(str(TMP / "libsr.so"), mode=os.RTLD_LAZY)
    lib.get_filters.restype = ctypes.POINTER(ctypes.c_int16)
    filt = np.ctypeslib.as_array(lib.get_filters(), (64, 8)).copy()
    np.savez_compressed(SPEC / "superres.npz", resize_filter_normative=filt)

    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from svtav1_tpu.ops.superres import upscale_step_x0

    u8p = np.ctypeslib.ndpointer(np.uint8)
    lib.run_rs.argtypes = [ctypes.c_void_p, ctypes.c_int, u8p, ctypes.c_int,
                           ctypes.c_int, ctypes.c_int, ctypes.c_int,
                           ctypes.c_int]
    rng = np.random.RandomState(53)
    data = {}
    case = 0
    PAD = 8
    # superres denominators 9..16 over numerator 8
    for denom in (9, 11, 13, 16):
        out_w = 128
        in_w = (out_w * 8 + denom // 2) // denom
        h = 16
        src = rng.randint(0, 256, (h, in_w)).astype(np.uint8)
        # edge-replicate pad
        ext = np.pad(src, ((0, 0), (PAD, PAD)), mode="edge")
        step, x0 = upscale_step_x0(in_w, out_w)
        dst = np.zeros((h, out_w), np.uint8)
        ptr = np.ascontiguousarray(ext).ctypes.data + PAD
        lib.run_rs(ptr, in_w + 2 * PAD, dst, out_w, out_w, h, x0, step)
        data[f"u{case}_ext"] = ext
        data[f"u{case}_dst"] = dst
        data[f"u{case}_cfg"] = np.array([in_w, out_w])
        case += 1
    np.savez_compressed(OUT, **data)
    print("wrote superres goldens, cases", case)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-time tool: CDEF golden vectors from the reference C.
Output: tests/data/golden_cdef.npz."""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
OUT = Path(__file__).resolve().parent.parent / "tests/data/golden_cdef.npz"

CDEF_BSTRIDE = 144  # ALIGN_POWER_OF_TWO(128 + 2*8, 3)? verified below
VERY_LARGE = 0x7F7F


def build():
    TMP.mkdir(exist_ok=True)
    shim = r"""
#include "EbCdef.h"
#include <stdio.h>
int get_bstride(void) { return CDEF_BSTRIDE; }
int get_block_8x8(void) { return BLOCK_8X8; }
"""
    (TMP / "cdef_shim.c").write_text(shim)
    cmd = (f"gcc -O2 -fPIC -shared -I{R}/Common/Codec "
           f"-I/root/reference/Source/API -o {TMP}/libcdef.so "
           f"{R}/Common/Codec/EbCdef.c {TMP}/cdef_shim.c")
    subprocess.run(cmd, shell=True, check=True)
    und = subprocess.run(f"nm -D -u {TMP}/libcdef.so", shell=True,
                         capture_output=True, text=True).stdout
    syms = [l.split()[-1] for l in und.splitlines()
            if " U " in l and "GLIBC" not in l]
    src = "#include <string.h>\n"
    for x in syms:
        if x == "svt_memcpy":
            src += ("void (*svt_memcpy)(void *, const void *, "
                    "unsigned long);\n"
                    "__attribute__((constructor)) static void ini(void) "
                    "{ svt_memcpy = (void (*)(void *, const void *, "
                    "unsigned long))memcpy; }\n")
        else:
            src += f"void *{x} = 0;\n"
    (TMP / "cdef_stubs.c").write_text(src)
    subprocess.run(cmd + f" {TMP}/cdef_stubs.c", shell=True, check=True)
    return ctypes.CDLL(str(TMP / "libcdef.so"), mode=os.RTLD_LAZY)


def main():
    lib = build()
    bstride = lib.get_bstride()
    blk8 = lib.get_block_8x8()
    print("CDEF_BSTRIDE =", bstride, "BLOCK_8X8 =", blk8)
    u16p = np.ctypeslib.ndpointer(np.uint16)
    lib.svt_aom_cdef_find_dir_c.restype = ctypes.c_uint8
    lib.svt_aom_cdef_find_dir_c.argtypes = [
        u16p, ctypes.c_int32, np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int32]
    fb = lib.svt_cdef_filter_block_c
    fb.argtypes = [np.ctypeslib.ndpointer(np.uint8), ctypes.c_void_p,
                   ctypes.c_int32, ctypes.c_void_p] + \
                  [ctypes.c_int32] * 7 + [ctypes.c_uint8]

    rng = np.random.RandomState(19)
    data = {"bstride": np.array([bstride])}

    # find_dir: random 8x8 blocks
    nb = 64
    blocks = rng.randint(0, 256, (nb, 8, 8)).astype(np.uint16)
    dirs = np.zeros(nb, np.uint8)
    variances = np.zeros(nb, np.int32)
    for b in range(nb):
        buf = np.zeros((8, bstride), np.uint16)
        buf[:, :8] = blocks[b]
        var = np.zeros(1, np.int32)
        dirs[b] = lib.svt_aom_cdef_find_dir_c(buf, bstride, var, 0)
        variances[b] = var[0]
    data["fd_blocks"] = blocks
    data["fd_dirs"] = dirs
    data["fd_vars"] = variances

    # filter_block goldens: 12x12 padded source, block at (2,2)
    data2 = {}
    case = 0
    for pri, sec, dmp in [(4, 2, 3), (8, 1, 4), (0, 2, 4), (12, 0, 5),
                          (5, 4, 6), (1, 1, 3)]:
        for _ in range(6):
            src = rng.randint(0, 256, (12, 12)).astype(np.uint16)
            if case % 3 == 0:
                src[:2, :] = VERY_LARGE
            if case % 4 == 0:
                src[:, :2] = VERY_LARGE
            d = int(rng.randint(8))
            buf = np.full((16, bstride), VERY_LARGE, np.uint16)
            buf[:12, :12] = src
            dst = np.zeros((8, 8), np.uint8)
            buf = np.ascontiguousarray(buf)
            inptr = buf.ctypes.data + 2 * (2 * bstride + 2)
            fb(dst, None, 8, inptr, pri, sec, d, dmp + 3,
               dmp + 2, blk8, 0, 1)
            data2[f"f{case}_src"] = src
            data2[f"f{case}_dst"] = dst
            data2[f"f{case}_cfg"] = np.array([pri, sec, d, dmp + 3, dmp + 2])
            case += 1
    data.update(data2)
    np.savez_compressed(OUT, **data)
    print("wrote", OUT, "ncases", case)


if __name__ == "__main__":
    main()

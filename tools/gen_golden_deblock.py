#!/usr/bin/env python3
"""Dev-time tool: golden vectors for deblocking kernels from the reference C.
Output: tests/data/golden_deblock.npz."""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
OUT = Path(__file__).resolve().parent.parent / "tests/data/golden_deblock.npz"


def main():
    TMP.mkdir(exist_ok=True)
    cmd = (f"gcc -O2 -fPIC -shared -I{R}/Common/Codec "
           f"-I/root/reference/Source/API -o {TMP}/libdeblock.so "
           f"{R}/Common/Codec/EbDeblockingCommon.c")
    subprocess.run(cmd, shell=True, check=True)
    und = subprocess.run(f"nm -D -u {TMP}/libdeblock.so", shell=True,
                         capture_output=True, text=True).stdout
    syms = [l.split()[-1] for l in und.splitlines()
            if " U " in l and "GLIBC" not in l and "memcpy" not in l]
    (TMP / "db_stubs.c").write_text(
        "".join(f"void *{x} = 0;\n" for x in syms))
    subprocess.run(cmd + f" {TMP}/db_stubs.c", shell=True, check=True)
    lib = ctypes.CDLL(str(TMP / "libdeblock.so"), mode=os.RTLD_LAZY)

    u8p = np.ctypeslib.ndpointer(np.uint8)
    rng = np.random.RandomState(11)
    data = {}
    for tap in (4, 6, 8, 14):
        fn = getattr(lib, f"svt_aom_lpf_vertical_{tap}_c")
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int32, u8p, u8p, u8p]
        for case in range(40):
            lvl = int(rng.randint(1, 64))
            inside = max(1, lvl)
            mblim = np.array([2 * (lvl + 2) + inside], np.uint8)
            lim = np.array([inside], np.uint8)
            thr = np.array([lvl >> 4], np.uint8)
            # 4 rows x 32 cols strip; edge at col 16
            strip = rng.randint(0, 256, (4, 32)).astype(np.uint8)
            if case % 3 == 0:  # smooth-ish content to exercise flat branches
                strip = (strip // 16 + 120).astype(np.uint8)
            out = strip.copy()
            fn(out.ctypes.data + 16, 32, mblim, lim, thr)
            # pointer arithmetic: s points at edge; row stride 32
            data[f"v{tap}_{case}_in"] = strip
            data[f"v{tap}_{case}_out"] = out
            data[f"v{tap}_{case}_lvl"] = np.array([lvl])
    u16p = np.ctypeslib.ndpointer(np.uint16)
    for tap in (4, 6, 8, 14):
        fn = getattr(lib, f"svt_aom_highbd_lpf_vertical_{tap}_c")
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int32, u8p, u8p, u8p,
                       ctypes.c_int32]
        for case in range(20):
            lvl = int(rng.randint(1, 64))
            inside = max(1, lvl)
            mblim = np.array([2 * (lvl + 2) + inside], np.uint8)
            lim = np.array([inside], np.uint8)
            thr = np.array([lvl >> 4], np.uint8)
            strip = rng.randint(0, 1024, (4, 32)).astype(np.uint16)
            if case % 3 == 0:
                strip = (strip // 16 + 480).astype(np.uint16)
            out = strip.copy()
            fn(out.ctypes.data + 2 * 16, 32, mblim, lim, thr, 10)
            data[f"hbd_v{tap}_{case}_in"] = strip
            data[f"hbd_v{tap}_{case}_out"] = out
            data[f"hbd_v{tap}_{case}_lvl"] = np.array([lvl])
    np.savez_compressed(OUT, **data)
    print("wrote", OUT)


if __name__ == "__main__":
    main()

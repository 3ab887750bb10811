#!/usr/bin/env python3
"""Dev-time tool: generate golden transform vectors by running the reference
scalar C transforms (compiled as a standalone oracle .so from /root/reference)
on random inputs.  Output: tests/data/golden_txfm.npz, committed so tests run
without the reference present.  Same strategy as the reference's own
C-vs-SIMD equivalence tests (SURVEY.md §4.1).
"""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
OUT = Path(__file__).resolve().parent.parent / "tests/data/golden_txfm.npz"

TX_W = [4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32, 32, 64, 4, 16, 8, 32, 16, 64]
TX_H = [4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16, 64, 32, 16, 4, 32, 8, 64, 16]
TX_NAMES = ["4x4", "8x8", "16x16", "32x32", "64x64", "4x8", "8x4", "8x16",
            "16x8", "16x32", "32x16", "32x64", "64x32", "4x16", "16x4",
            "8x32", "32x8", "16x64", "64x16"]

# inverse wrapper signature variants: 0 = (...,tx_type,bd);
# 1 = (...,tx_type,tx_size,bd); 2 = (...,tx_type,tx_size,eob,bd)
INV_SIG = {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 1, 6: 1, 7: 2, 8: 2, 9: 2,
           10: 2, 11: 2, 12: 2, 13: 1, 14: 1, 15: 2, 16: 2, 17: 2, 18: 2}

FWD_NAMES = {0: "svt_av1_transform_two_d_4x4_c", 1: "svt_av1_transform_two_d_8x8_c",
             2: "svt_av1_transform_two_d_16x16_c", 3: "svt_av1_transform_two_d_32x32_c",
             4: "svt_av1_transform_two_d_64x64_c", 5: "svt_av1_fwd_txfm2d_4x8_c",
             6: "svt_av1_fwd_txfm2d_8x4_c", 7: "svt_av1_fwd_txfm2d_8x16_c",
             8: "svt_av1_fwd_txfm2d_16x8_c", 9: "svt_av1_fwd_txfm2d_16x32_c",
             10: "svt_av1_fwd_txfm2d_32x16_c", 11: "svt_av1_fwd_txfm2d_32x64_c",
             12: "svt_av1_fwd_txfm2d_64x32_c", 13: "svt_av1_fwd_txfm2d_4x16_c",
             14: "svt_av1_fwd_txfm2d_16x4_c", 15: "svt_av1_fwd_txfm2d_8x32_c",
             16: "svt_av1_fwd_txfm2d_32x8_c", 17: "svt_av1_fwd_txfm2d_16x64_c",
             18: "svt_av1_fwd_txfm2d_64x16_c"}

ADST_1D, IDTX_1D, DCT_1D, FLIP_1D = 1, 3, 0, 2
VTX = [0, 1, 0, 1, 2, 0, 2, 1, 2, 3, 0, 3, 1, 3, 2, 3]
HTX = [0, 0, 1, 1, 0, 2, 2, 2, 1, 3, 3, 0, 3, 1, 3, 2]


def allowed_types(w, h):
    mx = max(w, h)
    if mx == 64:
        return [0]  # DCT_DCT only
    if mx == 32:
        return [t for t in range(16) if VTX[t] in (0, 3) and HTX[t] in (0, 3)]
    return list(range(16))


STUBS = """
#include <string.h>
void svt_memcpy_c(void *dst, const void *src, size_t n) { memcpy(dst, src, n); }
"""


def _stub_file(sofile):
    # RTCD function-pointer data symbols referenced but never used by the
    # scalar paths we call; define them as null pointers.
    out = subprocess.run(f"nm -D -u {sofile}", shell=True, capture_output=True,
                         text=True).stdout
    lines = [l.split()[-1] for l in out.splitlines()
             if " U svt_" in l and "memcpy" not in l]
    src = STUBS + "".join(f"void *{s} = 0;\n" for s in lines)
    stub = TMP / "stubs.c"
    stub.write_text(src)
    return stub


def build():
    TMP.mkdir(exist_ok=True)
    for name, srcs, inc in [
        ("libinvtx.so", f"{R}/Common/Codec/EbInvTransforms.c",
         f"-I{R}/Common/Codec -I/root/reference/Source/API"),
        ("libfwdtx.so", f"{R}/Encoder/Codec/EbTransforms.c {R}/Common/Codec/EbInvTransforms.c",
         f"-I{R}/Common/Codec -I{R}/Encoder/Codec -I{R}/Common/C_DEFAULT "
         f"-I{R}/Encoder/C_DEFAULT -I/root/reference/Source/API"),
    ]:
        so = TMP / name
        subprocess.run(f"gcc -O2 -fPIC -shared {inc} -o {so} {srcs}",
                       shell=True, check=True)
        stub = _stub_file(so)
        subprocess.run(f"gcc -O2 -fPIC -shared {inc} -o {so} {srcs} {stub}",
                       shell=True, check=True)
    return (ctypes.CDLL(str(TMP / "libinvtx.so"), mode=os.RTLD_LAZY),
            ctypes.CDLL(str(TMP / "libfwdtx.so"), mode=os.RTLD_LAZY))


def main():
    inv_lib, fwd_lib = build()
    rng = np.random.RandomState(42)
    data = {}
    i32p = np.ctypeslib.ndpointer(np.int32)
    i16p = np.ctypeslib.ndpointer(np.int16)
    u16p = np.ctypeslib.ndpointer(np.uint16)

    for bd in (8, 10):
        for ts in range(19):
            w, h = TX_W[ts], TX_H[ts]
            cw, ch = min(w, 32), min(h, 32)
            for tt in allowed_types(w, h):
                # ---- inverse ----
                fn = getattr(inv_lib, f"svt_av1_inv_txfm2d_add_{TX_NAMES[ts]}_c")
                nblk = 4
                lim = 1 << (bd + 7)
                coeff = rng.randint(-lim, lim, (nblk, ch, cw)).astype(np.int32)
                coeff[0] = np.clip(coeff[0] * 97, -(1 << (bd + 7)), (1 << (bd + 7)) - 1)
                pred = rng.randint(0, 1 << bd, (nblk, h, w)).astype(np.uint16)
                recon = np.zeros_like(pred)
                for b in range(nblk):
                    args = [coeff[b].ravel(), pred[b].ravel(), w,
                            recon[b].ravel(), w, tt]
                    sig = INV_SIG[ts]
                    if sig == 1:
                        args.append(ts)
                    elif sig == 2:
                        args += [ts, cw * ch - 1]
                    args.append(bd)
                    fn.argtypes = ([i32p, u16p, ctypes.c_int32, u16p,
                                    ctypes.c_int32] +
                                   [ctypes.c_int32] * (len(args) - 5))
                    fn(*args)
                key = f"inv_{bd}_{ts}_{tt}"
                data[key + "_coeff"] = coeff
                data[key + "_pred"] = pred
                data[key + "_recon"] = recon

                # ---- forward ----
                fn = fwd_lib[FWD_NAMES[ts]]
                fn.argtypes = [i16p, i32p, ctypes.c_uint32, ctypes.c_int32,
                               ctypes.c_uint8]
                res = rng.randint(-(1 << bd) + 1, 1 << bd,
                                  (nblk, h, w)).astype(np.int16)
                fcoef = np.zeros((nblk, h * w), np.int32)
                for b in range(nblk):
                    fn(res[b].ravel(), fcoef[b], w, tt, bd)
                data[f"fwd_{bd}_{ts}_{tt}_res"] = res
                data[f"fwd_{bd}_{ts}_{tt}_coef"] = fcoef.reshape(nblk, h, w)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} with {len(data)} arrays")


if __name__ == "__main__":
    main()

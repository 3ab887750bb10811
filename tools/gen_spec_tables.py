#!/usr/bin/env python3
"""Dev-time tool: extract normative AV1 constant tables (scan orders, quant
lookup tables) into svtav1_tpu/spec/data/*.npz.

These are interoperability constants fixed by the AV1 specification (§5.11.40
scan selection, §7.12.2 dequantization tables) — identical in every conforming
implementation.  We extract them from the reference build (read-only) rather
than hand-transcribing 256-entry tables.
"""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
OUTDIR = Path(__file__).resolve().parent.parent / "svtav1_tpu/spec/data"

SHIM = r"""
#include "EbCoefficients.h"

const int16_t *get_scan(int ts, int tt) { return av1_scan_orders[ts][tt].scan; }
const int16_t *get_iscan(int ts, int tt) { return av1_scan_orders[ts][tt].iscan; }
const int16_t *get_neighbors(int ts, int tt) { return av1_scan_orders[ts][tt].neighbors; }
"""

TX_W = [4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32, 32, 64, 4, 16, 8, 32, 16, 64]
TX_H = [4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16, 64, 32, 16, 4, 32, 8, 64, 16]


def adjusted_wh(ts):
    return min(TX_W[ts], 32), min(TX_H[ts], 32)


def main():
    TMP.mkdir(exist_ok=True)
    (TMP / "scan_shim.c").write_text(SHIM)
    subprocess.run(
        f"gcc -O2 -fPIC -shared -I{R}/Common/Codec -I/root/reference/Source/API "
        f"-o {TMP}/libscan.so {TMP}/scan_shim.c", shell=True, check=True)
    lib = ctypes.CDLL(str(TMP / "libscan.so"), mode=os.RTLD_LAZY)
    for f in (lib.get_scan, lib.get_iscan, lib.get_neighbors):
        f.restype = ctypes.POINTER(ctypes.c_int16)
        f.argtypes = [ctypes.c_int, ctypes.c_int]

    scans = {}
    for ts in range(19):
        w, h = adjusted_wh(ts)
        n = w * h
        for tt in range(16):
            scan = np.ctypeslib.as_array(lib.get_scan(ts, tt), (n,)).copy()
            iscan = np.ctypeslib.as_array(lib.get_iscan(ts, tt), (n,)).copy()
            scans[f"scan_{ts}_{tt}"] = scan.astype(np.int16)
            scans[f"iscan_{ts}_{tt}"] = iscan.astype(np.int16)
    np.savez_compressed(OUTDIR / "scan_tables.npz", **scans)

    # quant lookup tables via the inverse-transform oracle lib
    qlib = ctypes.CDLL(str(TMP / "libinvtx.so"), mode=os.RTLD_LAZY)
    for f in (qlib.svt_aom_dc_quant_qtx, qlib.svt_aom_ac_quant_qtx):
        f.restype = ctypes.c_int16
        f.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    # EbBitDepth enum: EB_EIGHT_BIT=8, EB_TEN_BIT=10, EB_TWELVE_BIT=12
    qt = {}
    for bd in (8, 10, 12):
        qt[f"dc_{bd}"] = np.array(
            [qlib.svt_aom_dc_quant_qtx(q, 0, bd) for q in range(256)], np.int16)
        qt[f"ac_{bd}"] = np.array(
            [qlib.svt_aom_ac_quant_qtx(q, 0, bd) for q in range(256)], np.int16)
    np.savez_compressed(OUTDIR / "quant_tables.npz", **qt)
    print("scan_tables.npz + quant_tables.npz written")
    print("dc_8[0:8] =", qt["dc_8"][:8], " ac_8[0:8] =", qt["ac_8"][:8])


if __name__ == "__main__":
    main()

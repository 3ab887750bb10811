#!/usr/bin/env python3
"""Dev-time tool: golden range-coder streams from the reference EC
(EbBitstreamUnit.c compiled standalone).  Output: tests/data/golden_ec.npz
containing symbol sequences + their reference-encoded bytes."""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
OUT = Path(__file__).resolve().parent.parent / "tests/data/golden_ec.npz"

SHIM = r"""
#include "EbBitstreamUnit.h"
#include <string.h>

void (*svt_memcpy)(void *dst_ptr, void const *src_ptr, size_t size);

static OdEcEnc enc;
void ec_start(void) { svt_od_ec_enc_init(&enc, 1 << 20); }
void ec_symbol(int s, const uint16_t *icdf, int nsyms) {
    svt_od_ec_encode_cdf_q15(&enc, s, icdf, nsyms);
}
void ec_bool(int val, unsigned f) { svt_od_ec_encode_bool_q15(&enc, val, f); }
int ec_done(unsigned char *out) {
    uint32_t n; uint8_t *p = svt_od_ec_enc_done(&enc, &n);
    memcpy(out, p, n); svt_od_ec_enc_clear(&enc); return (int)n;
}
"""


def main():
    TMP.mkdir(exist_ok=True)
    (TMP / "ec_shim.c").write_text(SHIM)
    subprocess.run(
        f"gcc -O2 -fPIC -shared -I{R}/Common/Codec -I/root/reference/Source/API "
        f"-o {TMP}/libec.so {TMP}/ec_shim.c {R}/Common/Codec/EbBitstreamUnit.c",
        shell=True, check=True)
    lib = ctypes.CDLL(str(TMP / "libec.so"), mode=os.RTLD_LAZY)
    lib.ec_symbol.argtypes = [ctypes.c_int,
                              np.ctypeslib.ndpointer(np.uint16), ctypes.c_int]
    lib.ec_bool.argtypes = [ctypes.c_int, ctypes.c_uint]
    lib.ec_done.argtypes = [np.ctypeslib.ndpointer(np.uint8)]
    lib.ec_done.restype = ctypes.c_int

    rng = np.random.RandomState(7)
    data = {}
    for case in range(6):
        n_ops = [10, 100, 1000, 5000, 1, 3][case]
        ops = []          # (kind, value, nsyms) kind 0=symbol 1=bool 2..=literalbit
        cdfs = []
        lib.ec_start()
        for _ in range(n_ops):
            kind = rng.randint(3)
            if kind == 0:
                nsyms = rng.randint(2, 17)
                # random monotone icdf ending at 0
                probs = rng.randint(1, 100, nsyms).astype(np.float64)
                cum = np.cumsum(probs / probs.sum())
                icdf = np.clip(32768 - np.round(cum * 32768), 0, 32767)
                icdf = icdf.astype(np.uint16)
                icdf[-1] = 0
                # enforce strictly decreasing where needed (allow ties? icdf
                # must be monotone non-increasing with enough gap; EC_MIN_PROB
                # handles zero-prob tails)
                s = int(rng.randint(nsyms))
                lib.ec_symbol(s, icdf, nsyms)
                ops.append((0, s, nsyms))
                cdfs.append(icdf)
            elif kind == 1:
                f = int(rng.randint(1, 32768))
                v = int(rng.randint(2))
                lib.ec_bool(v, f)
                ops.append((1, v, f))
            else:
                v = int(rng.randint(2))
                lib.ec_bool(v, 0x4000)
                ops.append((2, v, 0))
        out = np.zeros(1 << 20, np.uint8)
        n = lib.ec_done(out)
        data[f"case{case}_ops"] = np.array(ops, np.int64)
        data[f"case{case}_cdfs"] = (np.concatenate([c for c in cdfs])
                                    if cdfs else np.zeros(0, np.uint16))
        data[f"case{case}_cdflens"] = np.array([len(c) for c in cdfs], np.int64)
        data[f"case{case}_bytes"] = out[:n].copy()
    np.savez_compressed(OUT, **data)
    print("wrote", OUT)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-time tool: FULL-FRAME film grain goldens.

Compiles the reference grainSynthesis.c and runs
svt_av1_add_film_grain_run on whole 4:2:0 frames (several sizes,
overlap on/off) so the spec-style noise-stripe assembly in
ops/film_grain.py can be tested bit-exact end to end.
Outputs tests/data/golden_fg_frame.npz.
"""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
OUT = (Path(__file__).resolve().parent.parent /
       "tests/data/golden_fg_frame.npz")

SHIM = r"""
#include <string.h>
#include "grainSynthesis.c"

void (*svt_memcpy)(void *, const void *, unsigned long);
__attribute__((constructor)) static void ini(void) {
    svt_memcpy = (void (*)(void *, const void *, unsigned long))memcpy;
}

static AomFilmGrain mk_params(const int32_t *ip) {
    AomFilmGrain p;
    memset(&p, 0, sizeof(p));
    p.apply_grain = 1;
    p.num_y_points = ip[0];
    p.num_cb_points = ip[1];
    p.num_cr_points = ip[2];
    p.ar_coeff_lag = ip[3];
    p.ar_coeff_shift = ip[4];
    p.grain_scale_shift = ip[5];
    p.random_seed = (uint16_t)ip[6];
    p.bit_depth = 8;
    p.chroma_scaling_from_luma = ip[7];
    p.scaling_shift = ip[8];
    p.cb_mult = ip[9]; p.cb_luma_mult = ip[10]; p.cb_offset = ip[11];
    p.cr_mult = ip[12]; p.cr_luma_mult = ip[13]; p.cr_offset = ip[14];
    p.overlap_flag = ip[15];
    p.clip_to_restricted_range = ip[16];
    for (int i = 0; i < 14; i++) {
        p.scaling_points_y[i][0] = ip[20 + 2 * i];
        p.scaling_points_y[i][1] = ip[20 + 2 * i + 1];
    }
    for (int i = 0; i < 10; i++) {
        p.scaling_points_cb[i][0] = ip[48 + 2 * i];
        p.scaling_points_cb[i][1] = ip[48 + 2 * i + 1];
        p.scaling_points_cr[i][0] = ip[76 + 2 * i];
        p.scaling_points_cr[i][1] = ip[76 + 2 * i + 1];
    }
    for (int i = 0; i < 24; i++) p.ar_coeffs_y[i] = ip[104 + i];
    for (int i = 0; i < 25; i++) {
        p.ar_coeffs_cb[i] = ip[128 + i];
        p.ar_coeffs_cr[i] = ip[153 + i];
    }
    return p;
}

void run_frame(const int32_t *ip, uint8_t *luma, uint8_t *cb, uint8_t *cr,
               int32_t width, int32_t height) {
    AomFilmGrain p = mk_params(ip);
    svt_av1_add_film_grain_run(&p, luma, cb, cr, height, width,
                               width, width >> 1, 0, 1, 1);
}
"""


def main():
    TMP.mkdir(exist_ok=True)
    (TMP / "fgf_shim.c").write_text(SHIM)
    cmd = (f"gcc -O2 -fPIC -shared -I{R}/Common/Codec -I{R}/Common/C_DEFAULT"
           f" -I/root/reference/Source/API -o {TMP}/libfgf.so "
           f"{TMP}/fgf_shim.c")
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if r.returncode:
        print(r.stderr[:2000])
        raise SystemExit(1)
    lib = ctypes.CDLL(str(TMP / "libfgf.so"), mode=os.RTLD_LAZY)
    i32p = np.ctypeslib.ndpointer(np.int32)
    u8p = np.ctypeslib.ndpointer(np.uint8)
    lib.run_frame.argtypes = [i32p, u8p, u8p, u8p, ctypes.c_int32,
                              ctypes.c_int32]

    rng = np.random.RandomState(77)
    data = {}
    sizes = [(64, 64), (96, 64), (80, 48), (192, 128)]
    for case in range(6):
        w, h = sizes[case % len(sizes)]
        ip = np.zeros(178, np.int32)
        ip[0] = rng.randint(2, 15)
        ip[1] = rng.randint(1, 11)
        ip[2] = rng.randint(1, 11)
        ip[3] = rng.randint(1, 4)
        ip[4] = rng.randint(6, 10)
        ip[5] = rng.randint(0, 3)
        ip[6] = rng.randint(1, 65536)
        ip[7] = 1 if case == 4 else 0
        if ip[7]:
            ip[1] = ip[2] = 0
        ip[8] = rng.randint(8, 12)
        ip[9:15] = [rng.randint(0, 256), rng.randint(0, 256),
                    rng.randint(0, 512), rng.randint(0, 256),
                    rng.randint(0, 256), rng.randint(0, 512)]
        ip[15] = 0 if case == 3 else 1        # overlap mostly ON
        ip[16] = case % 2
        for base, npts in ((20, ip[0]), (48, ip[1]), (76, ip[2])):
            xs = np.sort(rng.choice(np.arange(0, 256), max(npts, 1),
                                    replace=False))
            for i in range(npts):
                ip[base + 2 * i] = xs[i]
                ip[base + 2 * i + 1] = rng.randint(0, 256)
        ip[104:128] = rng.randint(-128, 128, 24)
        ip[128:178] = rng.randint(-128, 128, 50)

        luma = rng.randint(0, 256, (h, w)).astype(np.uint8)
        cb = rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)
        cr = rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)
        l2 = luma.copy()
        b2 = cb.copy()
        r2 = cr.copy()
        lib.run_frame(ip, l2, b2, r2, w, h)
        data[f"c{case}_ip"] = ip
        data[f"c{case}_wh"] = np.array([w, h], np.int32)
        data[f"c{case}_in_y"] = luma
        data[f"c{case}_in_cb"] = cb
        data[f"c{case}_in_cr"] = cr
        data[f"c{case}_out_y"] = l2
        data[f"c{case}_out_cb"] = b2
        data[f"c{case}_out_cr"] = r2
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-time tool: film grain goldens + gaussian sequence extraction.
Outputs spec/data/film_grain.npz and tests/data/golden_filmgrain.npz."""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
SPEC = Path(__file__).resolve().parent.parent / "svtav1_tpu/spec/data"
OUT = (Path(__file__).resolve().parent.parent /
       "tests/data/golden_filmgrain.npz")

SHIM = r"""
#include <string.h>
#include "grainSynthesis.c"

void (*svt_memcpy)(void *, const void *, unsigned long);
__attribute__((constructor)) static void ini(void) {
    svt_memcpy = (void (*)(void *, const void *, unsigned long))memcpy;
}

const int32_t *get_gauss(void) { return gaussian_sequence; }

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

/* generate templates; luma 73x82, chroma 38x44 (420) */
void gen_templates(const int32_t *ip, int32_t *out_l, int32_t *out_cb,
                   int32_t *out_cr) {
    AomFilmGrain p = mk_params(ip);
    random_register = p.random_seed;
    grain_center = 128;
    grain_min = -128;
    grain_max = 127;
    luma_subblock_size_y = 32;
    luma_subblock_size_x = 32;
    chroma_subblock_size_y = 16;
    chroma_subblock_size_x = 16;
    int32_t **ppl, **ppc;
    int32_t *lg, *cbg, *crg, *a, *b, *c, *d, *e, *f;
    init_arrays(&p, 1024, 512, &ppl, &ppc, &lg, &cbg, &crg,
                &a, &b, &c, &d, &e, &f, 73 * 82, 38 * 44, 1, 1);
    generate_luma_grain_block(&p, ppl, lg, 73, 82, 82, 3, 3, 3, 0);
    generate_chroma_grain_blocks(&p, ppc, lg, cbg, crg, 82, 38, 44, 44,
                                 3, 3, 3, 0, 1, 1);
    memcpy(out_l, lg, 73 * 82 * 4);
    memcpy(out_cb, cbg, 38 * 44 * 4);
    memcpy(out_cr, crg, 38 * 44 * 4);
}

/* scaling luts + one add_noise_to_block call on 32x32 luma / 16x16 chroma */
void run_noise_block(const int32_t *ip, uint8_t *luma, uint8_t *cb,
                     uint8_t *cr, const int32_t *lgrain, const int32_t *cbg,
                     const int32_t *crg, int32_t *out_luts) {
    AomFilmGrain p = mk_params(ip);
    init_scaling_function(p.scaling_points_y, p.num_y_points, scaling_lut_y);
    if (p.chroma_scaling_from_luma) {
        memcpy(scaling_lut_cb, scaling_lut_y, sizeof(scaling_lut_y));
        memcpy(scaling_lut_cr, scaling_lut_y, sizeof(scaling_lut_y));
    } else {
        init_scaling_function(p.scaling_points_cb, p.num_cb_points,
                              scaling_lut_cb);
        init_scaling_function(p.scaling_points_cr, p.num_cr_points,
                              scaling_lut_cr);
    }
    memcpy(out_luts, scaling_lut_y, 256 * 4);
    memcpy(out_luts + 256, scaling_lut_cb, 256 * 4);
    memcpy(out_luts + 512, scaling_lut_cr, 256 * 4);
    add_noise_to_block(&p, luma, cb, cr, 32, 16,
                       (int32_t *)lgrain, (int32_t *)cbg, (int32_t *)crg,
                       32, 16, 16, 16, 8, 1, 1);
}
"""


def main():
    TMP.mkdir(exist_ok=True)
    (TMP / "fg_shim.c").write_text(SHIM)
    cmd = (f"gcc -O2 -fPIC -shared -I{R}/Common/Codec -I{R}/Common/C_DEFAULT "
           f"-I/root/reference/Source/API -o {TMP}/libfg.so {TMP}/fg_shim.c")
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
    if r.returncode:
        print(r.stderr[:2000])
        raise SystemExit(1)
    lib = ctypes.CDLL(str(TMP / "libfg.so"), mode=os.RTLD_LAZY)
    lib.get_gauss.restype = ctypes.POINTER(ctypes.c_int32)
    SPEC.mkdir(exist_ok=True)
    gauss = np.ctypeslib.as_array(lib.get_gauss(), (2048,)).copy()
    np.savez_compressed(SPEC / "film_grain.npz", gaussian_sequence=gauss)

    i32p = np.ctypeslib.ndpointer(np.int32)
    u8p = np.ctypeslib.ndpointer(np.uint8)
    lib.gen_templates.argtypes = [i32p, i32p, i32p, i32p]
    lib.run_noise_block.argtypes = [i32p, u8p, u8p, u8p, i32p, i32p, i32p,
                                    i32p]

    rng = np.random.RandomState(41)
    data = {}
    for case in range(8):
        ip = np.zeros(178, np.int32)
        ip[0] = rng.randint(2, 15)        # num_y_points
        ip[1] = rng.randint(0, 11)        # num_cb
        ip[2] = rng.randint(0, 11)        # num_cr
        ip[3] = rng.randint(1, 4)         # lag
        ip[4] = rng.randint(6, 10)        # ar_coeff_shift
        ip[5] = rng.randint(0, 3)         # grain_scale_shift
        ip[6] = rng.randint(1, 65536)     # seed
        ip[7] = 1 if case == 5 else 0     # chroma_scaling_from_luma
        if ip[7]:
            ip[1] = ip[2] = 0
        ip[8] = rng.randint(8, 12)        # scaling_shift
        ip[9:15] = [rng.randint(0, 256), rng.randint(0, 256),
                    rng.randint(0, 512), rng.randint(0, 256),
                    rng.randint(0, 256), rng.randint(0, 512)]
        ip[15] = 0
        ip[16] = case % 2
        # scaling points: increasing x
        for base, npts in ((20, ip[0]), (48, ip[1]), (76, ip[2])):
            xs = np.sort(rng.choice(np.arange(0, 256), max(npts, 1),
                                    replace=False))
            for i in range(npts):
                ip[base + 2 * i] = xs[i]
                ip[base + 2 * i + 1] = rng.randint(0, 256)
        ip[104:128] = rng.randint(-128, 128, 24)
        ip[128:178] = rng.randint(-128, 128, 50)

        lg = np.zeros((73, 82), np.int32)
        cbg = np.zeros((38, 44), np.int32)
        crg = np.zeros((38, 44), np.int32)
        lib.gen_templates(ip, lg, cbg, crg)
        data[f"t{case}_ip"] = ip
        data[f"t{case}_luma"] = lg
        data[f"t{case}_cb"] = cbg
        data[f"t{case}_cr"] = crg

        luma = rng.randint(0, 256, (32, 32)).astype(np.uint8)
        cb = rng.randint(0, 256, (16, 16)).astype(np.uint8)
        cr = rng.randint(0, 256, (16, 16)).astype(np.uint8)
        lgr = rng.randint(-100, 101, (32, 32)).astype(np.int32)
        cbr = rng.randint(-100, 101, (16, 16)).astype(np.int32)
        crr = rng.randint(-100, 101, (16, 16)).astype(np.int32)
        luts = np.zeros(768, np.int32)
        l2, b2, r2 = luma.copy(), cb.copy(), cr.copy()
        lib.run_noise_block(ip, l2, b2, r2, lgr, cbr, crr, luts)
        data[f"n{case}_in"] = np.stack([luma.ravel()[:256]])
        data[f"n{case}_luma"] = luma
        data[f"n{case}_cb"] = cb
        data[f"n{case}_cr"] = cr
        data[f"n{case}_lgr"] = lgr
        data[f"n{case}_cbr"] = cbr
        data[f"n{case}_crr"] = crr
        data[f"n{case}_outl"] = l2
        data[f"n{case}_outcb"] = b2
        data[f"n{case}_outcr"] = r2
        data[f"n{case}_luts"] = luts
    np.savez_compressed(OUT, **data)
    print("wrote goldens + gaussian table")


if __name__ == "__main__":
    main()

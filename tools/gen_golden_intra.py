#!/usr/bin/env python3
"""Dev-time tool: golden vectors for intra predictors from the reference
scalar C (static fns reached by #include-ing the .c into a shim TU).
Output: tests/data/golden_intra.npz."""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
OUT = Path(__file__).resolve().parent.parent / "tests/data/golden_intra.npz"

SHIM = r"""
#include <string.h>
#include "EbIntraPrediction.c"

void (*svt_memcpy)(void *dst, void const *src, size_t size);
__attribute__((constructor)) static void init_shim(void) {
    svt_memcpy = (void (*)(void *, void const *, size_t))memcpy;
}

#define EXPORT(name) \
void run_##name(uint8_t *dst, int bw, int bh, const uint8_t *above, \
                const uint8_t *left) { name(dst, bw, bw, bh, above, left); }

EXPORT(dc_predictor)
EXPORT(dc_left_predictor)
EXPORT(dc_top_predictor)
EXPORT(dc_128_predictor)
EXPORT(v_predictor)
EXPORT(h_predictor)
EXPORT(smooth_predictor)
EXPORT(smooth_v_predictor)
EXPORT(smooth_h_predictor)
EXPORT(paeth_predictor)

const uint8_t *get_sm_weights(void) { return sm_weight_arrays; }

void run_z1(uint8_t *dst, int bw, int bh, const uint8_t *above,
            const uint8_t *left, int dx, int dy) {
    svt_av1_dr_prediction_z1_c(dst, bw, bw, bh, above, left, 0, dx, dy);
}
void run_z2(uint8_t *dst, int bw, int bh, const uint8_t *above,
            const uint8_t *left, int dx, int dy) {
    svt_av1_dr_prediction_z2_c(dst, bw, bw, bh, above, left, 0, 0, dx, dy);
}
void run_z3(uint8_t *dst, int bw, int bh, const uint8_t *above,
            const uint8_t *left, int dx, int dy) {
    svt_av1_dr_prediction_z3_c(dst, bw, bw, bh, above, left, 0, dx, dy);
}
"""

NAMES = ["dc_predictor", "dc_left_predictor", "dc_top_predictor",
         "dc_128_predictor", "v_predictor", "h_predictor", "smooth_predictor",
         "smooth_v_predictor", "smooth_h_predictor", "paeth_predictor"]

SIZES = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64), (4, 8), (8, 4),
         (8, 16), (16, 8), (16, 32), (32, 16), (4, 16), (16, 4), (8, 32),
         (32, 8), (16, 64), (64, 16), (32, 64), (64, 32)]


def main():
    TMP.mkdir(exist_ok=True)
    (TMP / "intra_shim.c").write_text(SHIM)
    cmd = (f"gcc -O2 -fPIC -shared -I{R}/Common/Codec -I{R}/Encoder/Codec "
           f"-I{R}/Common/C_DEFAULT -I{R}/Encoder/C_DEFAULT "
           f"-I/root/reference/Source/API -o {TMP}/libintra.so "
           f"{TMP}/intra_shim.c")
    subprocess.run(cmd, shell=True, check=True)
    und = subprocess.run(f"nm -D -u {TMP}/libintra.so", shell=True,
                         capture_output=True, text=True).stdout
    syms = [l.split()[-1] for l in und.splitlines()
            if " U " in l and "GLIBC" not in l and "memcpy" not in l]
    (TMP / "intra_stubs.c").write_text(
        "".join(f"void *{x} = 0;\n" for x in syms))
    subprocess.run(cmd[:-len(str(TMP / 'intra_shim.c'))] +
                   f"{TMP}/intra_shim.c {TMP}/intra_stubs.c",
                   shell=True, check=True)
    lib = ctypes.CDLL(str(TMP / "libintra.so"), mode=os.RTLD_LAZY)
    u8p = np.ctypeslib.ndpointer(np.uint8)
    lib.get_sm_weights.restype = ctypes.POINTER(ctypes.c_uint8)

    rng = np.random.RandomState(3)
    data = {"sm_weights": np.ctypeslib.as_array(lib.get_sm_weights(),
                                                (128,)).copy()}
    for name in NAMES:
        fn = lib["run_" + name]
        fn.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p, u8p]
        for (w, h) in SIZES:
            nb = 4
            # edge layout: above needs [-1 .. 2w-1]-style extension in general;
            # these modes only read above[0..w-1] & left[0..h-1] (+corner for
            # paeth which reads above[-1])
            above_ext = rng.randint(0, 256, (nb, w + 1)).astype(np.uint8)
            left = rng.randint(0, 256, (nb, h)).astype(np.uint8)
            out = np.zeros((nb, h, w), np.uint8)
            for b in range(nb):
                fn(out[b], w, h, above_ext[b, 1:], left[b])
            data[f"{name}_{w}x{h}_above"] = above_ext
            data[f"{name}_{w}x{h}_left"] = left
            data[f"{name}_{w}x{h}_out"] = out
    # directional golden vectors: square sizes, all mode angles & deltas
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from svtav1_tpu.ops.intra_dir import MODE_ANGLE, get_dx, get_dy
    zfns = {}
    for zf in ("z1", "z2", "z3"):
        fn = getattr(lib, "run_" + zf)
        fn.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p, u8p,
                       ctypes.c_int, ctypes.c_int]
        zfns[zf] = fn
    for n in (4, 8, 16, 32, 64):
        for mode, base_angle in MODE_ANGLE.items():
            for delta in range(-3, 4):
                angle = base_angle + 3 * delta
                if angle <= 0 or angle >= 270 or angle in (90, 180):
                    continue
                zone = "z1" if angle < 90 else ("z2" if angle < 180 else "z3")
                nb = 2
                # edges: above buffer [corner, above 2n]; left [corner, 2n]
                abuf = rng.randint(0, 256, (nb, 2 * n + 1)).astype(np.uint8)
                lbuf = rng.randint(0, 256, (nb, 2 * n + 1)).astype(np.uint8)
                lbuf[:, 0] = abuf[:, 0]   # shared corner
                out = np.zeros((nb, n, n), np.uint8)
                dx, dy = get_dx(angle), get_dy(angle)
                for b in range(nb):
                    zfns[zone](out[b], n, n, abuf[b, 1:], lbuf[b, 1:], dx, dy)
                key = f"dr_{n}_{mode}_{delta}"
                data[key + "_a"] = abuf
                data[key + "_l"] = lbuf
                data[key + "_o"] = out
    np.savez_compressed(OUT, **data)
    print("wrote", OUT)


if __name__ == "__main__":
    main()

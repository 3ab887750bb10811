"""Film grain synthesis core vs reference goldens."""

from pathlib import Path

import numpy as np
import pytest

from svtav1_tpu.ops import film_grain as FG

DATA = Path(__file__).parent / "data" / "golden_filmgrain.npz"


def _params(ip):
    return dict(
        num_y_points=int(ip[0]), num_cb_points=int(ip[1]),
        num_cr_points=int(ip[2]), ar_coeff_lag=int(ip[3]),
        ar_coeff_shift=int(ip[4]), grain_scale_shift=int(ip[5]),
        random_seed=int(ip[6]), chroma_scaling_from_luma=int(ip[7]),
        scaling_shift=int(ip[8]), cb_mult=int(ip[9]),
        cb_luma_mult=int(ip[10]), cb_offset=int(ip[11]), cr_mult=int(ip[12]),
        cr_luma_mult=int(ip[13]), cr_offset=int(ip[14]),
        overlap_flag=int(ip[15]), clip_to_restricted_range=int(ip[16]),
        bit_depth=8,
        scaling_points_y=[(int(ip[20 + 2 * i]), int(ip[20 + 2 * i + 1]))
                          for i in range(int(ip[0]))],
        scaling_points_cb=[(int(ip[48 + 2 * i]), int(ip[48 + 2 * i + 1]))
                           for i in range(int(ip[1]))],
        scaling_points_cr=[(int(ip[76 + 2 * i]), int(ip[76 + 2 * i + 1]))
                           for i in range(int(ip[2]))],
        ar_coeffs_y=[int(v) for v in ip[104:128]],
        ar_coeffs_cb=[int(v) for v in ip[128:153]],
        ar_coeffs_cr=[int(v) for v in ip[153:178]],
    )


@pytest.mark.parametrize("case", range(8))
def test_grain_templates(case):
    d = np.load(DATA)
    p = _params(d[f"t{case}_ip"])
    lg = FG.generate_luma_grain(p)
    np.testing.assert_array_equal(lg, d[f"t{case}_luma"])
    cb, cr = FG.generate_chroma_grain(p, lg)
    np.testing.assert_array_equal(cb, d[f"t{case}_cb"])
    np.testing.assert_array_equal(cr, d[f"t{case}_cr"])


@pytest.mark.parametrize("case", range(8))
def test_scaling_and_noise_block(case):
    d = np.load(DATA)
    p = _params(d[f"t{case}_ip"])
    luts_ref = d[f"n{case}_luts"]
    lut_y = FG.init_scaling_lut(p["scaling_points_y"])
    if p["chroma_scaling_from_luma"]:
        lut_cb = lut_y.copy()
        lut_cr = lut_y.copy()
    else:
        lut_cb = FG.init_scaling_lut(p["scaling_points_cb"])
        lut_cr = FG.init_scaling_lut(p["scaling_points_cr"])
    np.testing.assert_array_equal(lut_y, luts_ref[:256])
    np.testing.assert_array_equal(lut_cb, luts_ref[256:512])
    np.testing.assert_array_equal(lut_cr, luts_ref[512:])

    out_l, out_cb, out_cr = FG.add_noise_to_block(
        p, d[f"n{case}_luma"], d[f"n{case}_cb"], d[f"n{case}_cr"],
        d[f"n{case}_lgr"], d[f"n{case}_cbr"], d[f"n{case}_crr"],
        (lut_y, lut_cb, lut_cr))
    np.testing.assert_array_equal(out_l, d[f"n{case}_outl"])
    np.testing.assert_array_equal(out_cb, d[f"n{case}_outcb"])
    np.testing.assert_array_equal(out_cr, d[f"n{case}_outcr"])

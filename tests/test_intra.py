"""Intra predictors vs reference-C golden vectors."""

from pathlib import Path

import numpy as np
import pytest

from svtav1_tpu.ops import intra

DATA = Path(__file__).parent / "data" / "golden_intra.npz"

SIZES = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64), (4, 8), (8, 4),
         (8, 16), (16, 8), (16, 32), (32, 16), (4, 16), (16, 4), (8, 32),
         (32, 8), (16, 64), (64, 16), (32, 64), (64, 32)]


def _run(name, above_ext, left):
    above = above_ext[:, 1:].astype(np.int32)
    lft = left.astype(np.int32)
    tl = above_ext[:, 0].astype(np.int32)
    if name == "dc_predictor":
        return intra.dc_pred(above, lft, True, True)
    if name == "dc_left_predictor":
        return intra.dc_pred(above, lft, False, True)
    if name == "dc_top_predictor":
        return intra.dc_pred(above, lft, True, False)
    if name == "dc_128_predictor":
        return intra.dc_pred(above, lft, False, False)
    if name == "v_predictor":
        return intra.v_pred(above, lft)
    if name == "h_predictor":
        return intra.h_pred(above, lft)
    if name == "smooth_predictor":
        return intra.smooth_pred(above, lft)
    if name == "smooth_v_predictor":
        return intra.smooth_v_pred(above, lft)
    if name == "smooth_h_predictor":
        return intra.smooth_h_pred(above, lft)
    if name == "paeth_predictor":
        return intra.paeth_pred(above, lft, tl)
    raise ValueError(name)


def test_sm_weights_table():
    d = np.load(DATA)
    np.testing.assert_array_equal(intra.SM_WEIGHTS, d["sm_weights"])


@pytest.mark.parametrize("name", [
    "dc_predictor", "dc_left_predictor", "dc_top_predictor",
    "dc_128_predictor", "v_predictor", "h_predictor", "smooth_predictor",
    "smooth_v_predictor", "smooth_h_predictor", "paeth_predictor"])
def test_predictor_bit_exact(name):
    d = np.load(DATA)
    for (w, h) in SIZES:
        above = d[f"{name}_{w}x{h}_above"]
        left = d[f"{name}_{w}x{h}_left"]
        want = d[f"{name}_{w}x{h}_out"].astype(np.int32)
        got = np.asarray(_run(name, above, left))
        np.testing.assert_array_equal(got, want, err_msg=f"{name} {w}x{h}")

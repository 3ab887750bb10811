"""Directional intra predictors vs reference goldens (all modes × deltas)."""

from pathlib import Path

import numpy as np
import pytest

from svtav1_tpu.ops.intra_dir import MODE_ANGLE, dr_pred

DATA = Path(__file__).parent / "data" / "golden_intra.npz"


@pytest.mark.parametrize("n", [4, 8, 16, 32, 64])
def test_dr_pred_bit_exact(n):
    d = np.load(DATA)
    checked = 0
    for mode in MODE_ANGLE:
        for delta in range(-3, 4):
            key = f"dr_{n}_{mode}_{delta}"
            if key + "_o" not in d:
                continue
            abuf = d[key + "_a"].astype(np.int32)
            lbuf = d[key + "_l"].astype(np.int32)
            want = d[key + "_o"].astype(np.int32)
            got = np.asarray(dr_pred(mode, delta, abuf[:, 1:2 * n + 1],
                                     lbuf[:, 1:2 * n + 1], abuf[:, 0], n))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"{key}")
            checked += 1
    assert checked > 40

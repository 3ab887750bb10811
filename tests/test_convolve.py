"""Subpel convolve vs reference goldens."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from svtav1_tpu.ops.convolve import convolve_2d

DATA = Path(__file__).parent / "data" / "golden_convolve.npz"


def test_convolve_2d_bit_exact():
    d = np.load(DATA)
    n = 0
    while f"c{n}_cfg" in d:
        w, h, fx, fy, sx, sy = d[f"c{n}_cfg"]
        src = d[f"c{n}_src"].astype(np.int32)
        want = d[f"c{n}_dst"].astype(np.int32)
        # C src pointer at (8,8); 2D path reads rows -3..h+3, cols -3..w+3
        window = src[8 - 3:8 + h + 4, 8 - 3:8 + w + 4]
        got = np.asarray(convolve_2d(jnp.asarray(window[None]), int(fx),
                                     int(fy), int(sx), int(sy)))[0]
        np.testing.assert_array_equal(got, want, err_msg=f"case {n}")
        n += 1
    assert n == 60

"""Compound-average MC vs reference jnt-convolve goldens
(svt_av1_jnt_convolve_2d_c, EbInterPrediction.c:503)."""

from pathlib import Path

import numpy as np

import jax.numpy as jnp
from svtav1_tpu.ops.convolve import kernels
from svtav1_tpu.ops.mc import (compound_average, interp_block_dyn_mid)
import pytest

pytestmark = pytest.mark.slow

DATA = Path(__file__).parent / "data" / "golden_compound.npz"


def test_compound_average_golden():
    d = np.load(DATA)
    kern = np.asarray(kernels(0))
    bs = 16
    for case in range(40):
        s0 = d[f"c{case}_s0"].astype(np.int32)
        s1 = d[f"c{case}_s1"].astype(np.int32)
        sx0, sy0, sx1, sy1 = d[f"c{case}_ph"]
        want = d[f"c{case}_out"]
        # block origin (8,8); the 8-tap window starts 3 px up-left
        w0 = s0[8 - 3:8 + bs + 4, 8 - 3:8 + bs + 4][None]
        w1 = s1[8 - 3:8 + bs + 4, 8 - 3:8 + bs + 4][None]
        r0 = interp_block_dyn_mid(jnp.asarray(w0),
                                  jnp.asarray(kern[sx0])[None],
                                  jnp.asarray(kern[sy0])[None])
        r1 = interp_block_dyn_mid(jnp.asarray(w1),
                                  jnp.asarray(kern[sx1])[None],
                                  jnp.asarray(kern[sy1])[None])
        got = np.asarray(compound_average(r0, r1))[0]
        np.testing.assert_array_equal(got, want, err_msg=f"case {case}")

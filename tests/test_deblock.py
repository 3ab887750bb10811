"""Deblocking kernels vs reference goldens."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp
from svtav1_tpu.ops.deblock import _filter_core, thresholds

DATA = Path(__file__).parent / "data" / "golden_deblock.npz"


@pytest.mark.parametrize("tap", [4, 6, 8, 14])
def test_vertical_filters(tap):
    d = np.load(DATA)
    for case in range(40):
        strip = d[f"v{tap}_{case}_in"].astype(np.int32)
        want = d[f"v{tap}_{case}_out"].astype(np.int32)
        lvl = int(d[f"v{tap}_{case}_lvl"][0])
        mblim, lim, thr = thresholds(lvl)
        px = strip[:, 16 - 7:16 + 7]          # [4, 14] across the edge
        got = np.asarray(_filter_core(jnp.asarray(px), tap, mblim, lim, thr))
        full = strip.copy()
        full[:, 16 - 7:16 + 7] = got
        np.testing.assert_array_equal(full, want, err_msg=f"tap{tap} c{case}")


@pytest.mark.parametrize("tap", [4, 6, 8, 14])
def test_vertical_filters_10bit(tap):
    d = np.load(DATA)
    for case in range(20):
        strip = d[f"hbd_v{tap}_{case}_in"].astype(np.int32)
        want = d[f"hbd_v{tap}_{case}_out"].astype(np.int32)
        lvl = int(d[f"hbd_v{tap}_{case}_lvl"][0])
        mblim, lim, thr = thresholds(lvl)
        px = strip[:, 16 - 7:16 + 7]
        got = np.asarray(_filter_core(jnp.asarray(px), tap, mblim, lim,
                                      thr, bd=10))
        full = strip.copy()
        full[:, 16 - 7:16 + 7] = got
        np.testing.assert_array_equal(full, want,
                                      err_msg=f"hbd tap{tap} c{case}")

"""Loop restoration (Wiener + SGR) vs reference goldens."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from svtav1_tpu.ops import restoration as R

DATA = Path(__file__).parent / "data" / "golden_restoration.npz"


def test_normative_tables():
    d = np.load(DATA)
    np.testing.assert_array_equal(R.X_BY_XPLUS1, d["xbyx"])
    np.testing.assert_array_equal(R.ONE_BY_X, d["onebyx"])


def test_sgr_bit_exact():
    d = np.load(DATA)
    for c in range(42):
        w, h, eps, xq0, xq1 = d[f"s{c}_cfg"]
        ext = d[f"s{c}_ext"].astype(np.int32)
        want = d[f"s{c}_dst"].astype(np.int32)
        got = np.asarray(R.apply_sgr(jnp.asarray(ext[None]), int(eps),
                                     int(xq0), int(xq1)))[0]
        np.testing.assert_array_equal(got, want, err_msg=f"sgr case {c}")


def test_wiener_bit_exact():
    d = np.load(DATA)
    for c in range(12):
        ext = d[f"w{c}_ext"].astype(np.int32)
        want = d[f"w{c}_dst"].astype(np.int32)
        fx = d[f"w{c}_fx"]
        fy = d[f"w{c}_fy"]
        # C reads ±7 borders but taps cover ±3; pass the 3-border window
        win = ext[7 - 3:ext.shape[0] - 7 + 3, 7 - 3:ext.shape[1] - 7 + 3]
        got = np.asarray(R.wiener_filter(jnp.asarray(win[None]), fx, fy))[0]
        np.testing.assert_array_equal(got, want, err_msg=f"wiener case {c}")

"""CCSO filter vs fork-reference goldens."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from svtav1_tpu.ops.ccso import ccso_filter_plane

DATA = Path(__file__).parent / "data" / "golden_ccso.npz"


def test_ccso_bit_exact():
    d = np.load(DATA)
    n = 0
    while f"c{n}_cfg" in d:
        sup, scale, mbl, eclf, bo, thr = d[f"c{n}_cfg"]
        luma = d[f"c{n}_luma"].astype(np.int32)
        dst = d[f"c{n}_dst"].astype(np.int32)
        want = d[f"c{n}_out"].astype(np.int32)
        got = np.asarray(ccso_filter_plane(
            jnp.asarray(dst[None]), jnp.asarray(luma[None]),
            d[f"c{n}_lut"], filter_support=int(sup), quant_step=int(thr),
            max_band_log2=int(mbl), edge_clf=int(eclf), bo_only=bool(bo),
            y_uv_scale=int(scale)))[0]
        np.testing.assert_array_equal(got, want, err_msg=f"case {n}")
        n += 1
    assert n == 48

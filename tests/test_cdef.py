"""CDEF direction search + filter vs reference goldens."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from svtav1_tpu.ops.cdef import cdef_filter_plane, find_dir

DATA = Path(__file__).parent / "data" / "golden_cdef.npz"


def test_find_dir():
    d = np.load(DATA)
    blocks = jnp.asarray(d["fd_blocks"].astype(np.int32))
    dirs, variances = find_dir(blocks)
    np.testing.assert_array_equal(np.asarray(dirs), d["fd_dirs"])
    np.testing.assert_array_equal(np.asarray(variances), d["fd_vars"])


def test_filter_block():
    d = np.load(DATA)
    for case in range(36):
        src = d[f"f{case}_src"].astype(np.int32)     # 12x12, block at (2,2)
        want = d[f"f{case}_dst"].astype(np.int32)
        pri, sec, dd, pdmp, sdmp = d[f"f{case}_cfg"]
        dirs = np.full((1, 1), dd, np.int32)
        got = np.asarray(cdef_filter_plane(
            jnp.asarray(src[None]), jnp.asarray(dirs[None]), int(pri),
            int(sec), int(pdmp), int(sdmp)))[0]
        np.testing.assert_array_equal(got, want, err_msg=f"case {case}")

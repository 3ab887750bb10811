"""Super-resolution upscale vs reference goldens."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from svtav1_tpu.ops.superres import upscale_horiz_normative

DATA = Path(__file__).parent / "data" / "golden_superres.npz"


def test_upscale_bit_exact():
    d = np.load(DATA)
    for c in range(4):
        ext = d[f"u{c}_ext"].astype(np.int32)
        want = d[f"u{c}_dst"].astype(np.int32)
        in_w, out_w = d[f"u{c}_cfg"]
        got = np.asarray(upscale_horiz_normative(jnp.asarray(ext[None]),
                                                 int(out_w)))[0]
        np.testing.assert_array_equal(got, want, err_msg=f"case {c}")

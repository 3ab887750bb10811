"""Native C tile coder must be byte-identical to the Python reference."""

import numpy as np
import pytest

from svtav1_tpu.ec import native


@pytest.mark.skipif(not native.available(), reason="no C toolchain")
@pytest.mark.parametrize("update", [True, False])
def test_native_matches_python(update):
    from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder

    rng = np.random.RandomState(5)
    w, h = 128, 128
    y = rng.randint(0, 256, (h, w)).astype(np.uint8)
    u = rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)

    # part_search=False: the native coder serves the flat-32 path (the
    # partition path rides TileCoder) — with the default config this test
    # never touched C at all
    enc_n = IntraEncoder(EncoderConfig(w, h, qindex=80, cdf_update=update,
                                       part_search=False))
    enc_n.use_native = True
    pn, _ = enc_n.encode_frame(y, u, v)
    assert enc_n.use_native, "native coder fell back to python"

    enc_p = IntraEncoder(EncoderConfig(w, h, qindex=80, cdf_update=update,
                                       part_search=False))
    enc_p.use_native = False
    pp, _ = enc_p.encode_frame(y, u, v)
    assert pn == pp

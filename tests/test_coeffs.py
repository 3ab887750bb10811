"""Coefficient coding: encoder/decoder round-trip across sizes/types/levels."""

import numpy as np
import pytest

from svtav1_tpu.ec.coeffs import read_coeffs_txb, write_coeffs_txb
from svtav1_tpu.ec.range_coder import RangeDecoder, RangeEncoder
from svtav1_tpu.spec.cdf import CdfContext
from svtav1_tpu.spec import tables as tbl


CASES = [
    # (tx_size, tx_type, magnitude)
    (0, 0, 3), (0, 3, 30), (1, 0, 3), (1, 9, 200), (2, 0, 8), (3, 0, 4),
    (4, 0, 4), (5, 0, 5), (8, 1, 60), (9, 0, 6), (15, 0, 3), (12, 0, 3),
]


@pytest.mark.parametrize("update", [False, True])
@pytest.mark.parametrize("ts,tt,mag", CASES)
def test_roundtrip(ts, tt, mag, update):
    rng = np.random.RandomState(ts * 100 + tt + mag)
    w, h = tbl.adjusted_tx_wh(ts)
    blocks = []
    for density in (0.0, 0.05, 0.3, 1.0):
        m = rng.rand(h, w) < density
        v = rng.randint(-mag, mag + 1, (h, w)) * m
        blocks.append(v.astype(np.int32))
    blocks.append(np.zeros((h, w), np.int32))

    enc = RangeEncoder()
    cdf_e = CdfContext(base_qindex=80, update=update)
    for b in blocks:
        write_coeffs_txb(enc, cdf_e, b, ts, tt, plane_type=0,
                         txb_skip_ctx=0, dc_sign_ctx=0)
    data = enc.done()

    dec = RangeDecoder(data)
    cdf_d = CdfContext(base_qindex=80, update=update)
    for b in blocks:
        got, got_tt = read_coeffs_txb(dec, cdf_d, h, w, ts, tt,
                                      plane_type=0, txb_skip_ctx=0,
                                      dc_sign_ctx=0)
        np.testing.assert_array_equal(got, b)
        if b.any():
            assert got_tt == tt

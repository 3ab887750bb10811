"""Wire format v2 (xfer.py): lossless under every density regime."""
import numpy as np
import jax.numpy as jnp

from svtav1_tpu.encoder.xfer import fetch_levels, _M_HI
from svtav1_tpu.spec.txfm import TX_4X4, TX_16X16, TX_32X32, DCT_DCT


def _roundtrip(lev, txs, shape2d):
    out = fetch_levels(jnp.asarray(lev), txs, DCT_DCT, shape2d)
    np.testing.assert_array_equal(out, lev)


def test_sparse_typical():
    rng = np.random.RandomState(0)
    lev = np.zeros((2, 5, 7, 32, 32), np.int32)
    # a few small ACs + big DCs
    lev[..., 0, 0] = rng.randint(-3000, 3000, lev.shape[:3])
    for _ in range(6):
        r, c = rng.randint(0, 4, 2)
        lev[..., r, c + 1] = rng.randint(-90, 90, lev.shape[:3])
    _roundtrip(lev, TX_32X32, (32, 32))


def test_dense_noise_with_highs():
    rng = np.random.RandomState(1)
    lev = rng.randint(-40, 40, (1, 4, 4, 32, 32)).astype(np.int32)
    lev[..., 0, 0] = 20000
    lev[0, 0, 0, 5, 5] = -32767        # AC high byte
    lev[0, 1, 1, 9, 3] = 301
    _roundtrip(lev, TX_32X32, (32, 32))


def test_hi_overflow_falls_back_to_int16():
    rng = np.random.RandomState(2)
    # more |v|>127 ACs than the sparse channel holds
    lev = rng.randint(-3000, 3000, (1, 3, 3, 32, 32)).astype(np.int32)
    assert (np.abs(lev) > 127).sum() > _M_HI
    _roundtrip(lev, TX_32X32, (32, 32))


def test_row_overflow_blocks():
    rng = np.random.RandomState(3)
    lev = np.zeros((1, 8, 8, 16, 16), np.int32)
    lev[..., 0, 0] = 50                 # everyone has a DC
    lev[0, 3, 4] = rng.randint(-200, 200, (16, 16))   # one dense block
    lev[0, 7, 7] = rng.randint(-5, 5, (16, 16))       # another
    _roundtrip(lev, TX_16X16, (16, 16))


def test_all_zero_and_tiny_tx():
    _roundtrip(np.zeros((2, 3, 3, 16, 16), np.int32), TX_16X16, (16, 16))
    rng = np.random.RandomState(4)
    lev = rng.randint(-300, 300, (2, 6, 6, 4, 4)).astype(np.int32)
    _roundtrip(lev, TX_4X4, (4, 4))

import numpy as np
import jax.numpy as jnp

from svtav1_tpu.ops import metrics


def test_sad_sse_var():
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (5, 16, 16))
    b = rng.randint(0, 256, (5, 16, 16))
    np.testing.assert_array_equal(
        np.asarray(metrics.sad(jnp.asarray(a), jnp.asarray(b))),
        np.abs(a.astype(np.int64) - b).sum((-1, -2)))
    np.testing.assert_array_equal(
        np.asarray(metrics.sse(jnp.asarray(a), jnp.asarray(b))),
        ((a.astype(np.int64) - b) ** 2).sum((-1, -2)))
    v = np.asarray(metrics.variance(jnp.asarray(a)))
    want = (a.astype(np.int64) ** 2).sum((-1, -2)) - \
        a.astype(np.int64).sum((-1, -2)) ** 2 // 256
    np.testing.assert_array_equal(v, want)


def test_hadamard_parseval():
    # Hadamard is orthogonal (x sqrt(n^2)): sum(H(x)^2) == n^2 * sum(x^2)
    rng = np.random.RandomState(1)
    x = rng.randint(-100, 100, (3, 8, 8))
    s = np.asarray(metrics.hadamard_satd(jnp.asarray(x)))
    assert (s > 0).all()
    # dc-only block: satd == n^2 * |dc|
    flat = np.full((1, 8, 8), 7)
    assert int(np.asarray(metrics.hadamard_satd(jnp.asarray(flat)))[0]) == \
        64 * 7


def test_sad_field_and_downsample():
    rng = np.random.RandomState(2)
    q = rng.randint(0, 256, (8, 8))
    c = rng.randint(0, 256, (10, 8, 8))
    got = np.asarray(metrics.sad_field(jnp.asarray(q), jnp.asarray(c)))
    want = np.abs(c.astype(np.int64) - q).sum((-1, -2))
    np.testing.assert_array_equal(got, want)
    p = rng.randint(0, 256, (16, 16))
    d = np.asarray(metrics.downsample2x(jnp.asarray(p)))
    want = (p[::2, ::2].astype(np.int64) + p[::2, 1::2] + p[1::2, ::2] +
            p[1::2, 1::2] + 2) >> 2
    np.testing.assert_array_equal(d, want)


def test_variance_highbd_large_blocks():
    # the int64-truncation case VERDICT flagged: 10-bit 64x64 (and 8-bit
    # 128x128) must be exact vs an int64 oracle
    rng = np.random.RandomState(3)
    for maxv, n in ((1023, 64), (255, 128), (4095, 16)):
        a = rng.randint(0, maxv + 1, (4, n, n))
        v = np.asarray(metrics.variance(jnp.asarray(a)))
        want = (a.astype(np.int64) ** 2).sum((-1, -2)) - \
            a.astype(np.int64).sum((-1, -2)) ** 2 // (n * n)
        np.testing.assert_array_equal(v, want, err_msg=f"maxv={maxv} n={n}")

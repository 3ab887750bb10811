import numpy as np
import jax.numpy as jnp

from svtav1_tpu.ops.blend import blend_a64_mask, blend_a64_hmask, \
    blend_a64_vmask


def _ref(m, a, b):
    return (m * a + (64 - m) * b + 32) >> 6


def test_blend_variants():
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (8, 16)).astype(np.int64)
    b = rng.randint(0, 256, (8, 16)).astype(np.int64)
    m = rng.randint(0, 65, (16, 32)).astype(np.int64)
    got = np.asarray(blend_a64_mask(jnp.asarray(a), jnp.asarray(b),
                                    jnp.asarray(m[:8, :16])))
    np.testing.assert_array_equal(got, _ref(m[:8, :16], a, b))

    m4 = (m[::2, ::2] + m[1::2, ::2] + m[::2, 1::2] + m[1::2, 1::2] + 2) >> 2
    got = np.asarray(blend_a64_mask(jnp.asarray(a), jnp.asarray(b),
                                    jnp.asarray(m), 1, 1))
    np.testing.assert_array_equal(got, _ref(m4, a, b))

    hm = rng.randint(0, 65, 16)
    got = np.asarray(blend_a64_hmask(jnp.asarray(a), jnp.asarray(b),
                                     jnp.asarray(hm)))
    np.testing.assert_array_equal(got, _ref(hm[None, :], a, b))

    vm = rng.randint(0, 65, 8)
    got = np.asarray(blend_a64_vmask(jnp.asarray(a), jnp.asarray(b),
                                     jnp.asarray(vm)))
    np.testing.assert_array_equal(got, _ref(vm[:, None], a, b))

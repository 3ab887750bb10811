"""intra_lin: the one-matmul intra formulation must equal the golden
predictors (ops/intra.py, ops/intra_dir.py) bit for bit."""
import numpy as np
import jax.numpy as jnp
import pytest

from svtav1_tpu.ops import intra
from svtav1_tpu.ops.intra_dir import dr_pred
from svtav1_tpu.ops.intra_lin import predict_linear_np

LIN_MODES = (intra.V_PRED, intra.H_PRED, intra.D45_PRED, intra.D135_PRED,
             intra.D113_PRED, intra.D157_PRED, intra.D203_PRED,
             intra.D67_PRED, intra.SMOOTH_PRED, intra.SMOOTH_V_PRED,
             intra.SMOOTH_H_PRED)


def _edges(rng, B, n):
    e = rng.randint(0, 256, (B, 4 * n + 1)).astype(np.int32)
    return e


@pytest.mark.parametrize("n", [16, 32])
def test_linear_matches_golden(n):
    rng = np.random.RandomState(7)
    B = 5
    e = _edges(rng, B, n)
    above_ext = e[:, :2 * n]
    left_ext = e[:, 2 * n:4 * n]
    corner = e[:, 4 * n]
    cands = tuple((m, 0) for m in LIN_MODES)
    got = predict_linear_np(e, n, cands)
    cj, aj, lj = (jnp.asarray(corner), jnp.asarray(above_ext),
                  jnp.asarray(left_ext))
    for ci, (m, _d) in enumerate(cands):
        if m in (intra.V_PRED, intra.H_PRED, intra.SMOOTH_PRED,
                 intra.SMOOTH_V_PRED, intra.SMOOTH_H_PRED):
            ref = np.asarray(intra.predict(m, aj[:, :n], lj[:, :n], cj))
        else:
            ref = np.asarray(dr_pred(m, 0, aj, lj, cj, n))
        np.testing.assert_array_equal(got[ci], ref, err_msg=f"mode {m}")


def test_angle_deltas():
    rng = np.random.RandomState(8)
    n, B = 32, 3
    e = _edges(rng, B, n)
    cands = tuple((m, d) for m in (intra.D45_PRED, intra.D135_PRED,
                                   intra.V_PRED, intra.H_PRED)
                  for d in (-2, 1, 3))
    got = predict_linear_np(e, n, cands)
    cj, aj, lj = (jnp.asarray(e[:, 4 * n]), jnp.asarray(e[:, :2 * n]),
                  jnp.asarray(e[:, 2 * n:4 * n]))
    for ci, (m, d) in enumerate(cands):
        ref = np.asarray(dr_pred(m, d, aj, lj, cj, n))
        np.testing.assert_array_equal(got[ci], ref,
                                      err_msg=f"mode {m} delta {d}")

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_sharded_pipeline_step_8dev():
    from svtav1_tpu.parallel.mesh import make_mesh, sharded_pipeline_step
    import jax

    assert len(jax.devices()) == 8
    mesh = make_mesh(8, tile_parallel=2)
    recon, bits = sharded_pipeline_step(mesh)
    assert recon.shape == (4, 4, 2, 32, 32)
    assert int(bits) > 0


def test_dryrun_entry():
    import __graft_entry__ as g
    import jax

    fn, args = g.entry()
    mode_idx, levels, recon = jax.jit(fn)(*args)
    assert mode_idx.shape == (2, 4, 4)
    assert levels.shape == (2, 4, 4, 32, 32)
    assert recon.shape == (2, 128, 128)

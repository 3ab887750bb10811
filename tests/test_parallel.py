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


def test_gop_sharded_video_byte_identical():
    """Multi-GOP video-path cert: keyframe-aligned chunks sharded over the
    8-device data axis must concatenate to the exact serial bitstream
    (low-delay flat path; the pyramid/partition variant runs below)."""
    from svtav1_tpu.parallel.mesh import (make_mesh,
                                          sharded_video_encode_bytes)

    mesh = make_mesh(8)
    sh = sharded_video_encode_bytes(mesh, shard=True)
    se = sharded_video_encode_bytes(mesh, shard=False)
    assert sh == se and len(sh) > 0


def test_gop_sharded_pyramid_byte_identical():
    """Same cert on the quality path: hierarchical pyramid + partition
    search, GOPs on separate devices."""
    from svtav1_tpu.parallel.mesh import (make_mesh,
                                          sharded_video_encode_bytes)

    mesh = make_mesh(8)
    kw = dict(w=64, h=64, keyint=5, n_gops=2, pyramid=True,
              part_search=True)
    sh = sharded_video_encode_bytes(mesh, shard=True, **kw)
    se = sharded_video_encode_bytes(mesh, shard=False, **kw)
    assert sh == se and len(sh) > 0

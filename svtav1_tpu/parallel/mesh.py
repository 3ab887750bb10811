"""Device mesh + sharded pipeline step for multi-chip scale-out.

The reference scales with pthreads over pictures/segments/tiles (SURVEY.md
§2.9); the TPU-native mapping is:
  - pictures/GOPs  → "data" mesh axis (embarrassingly parallel but for RC)
  - SB tile rows   → "tile" mesh axis with halo exchange for boundary context
Collectives ride ICI via shard_map; per-GOP rate control reduces with psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tile_parallel: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    data = n // tile_parallel
    arr = np.array(devs[:n]).reshape(data, tile_parallel)
    return Mesh(arr, ("data", "tile"))


def sharded_pipeline_step(mesh: Mesh):
    """Jit the transform+quant+recon stage over the mesh and run one tiny
    step: frames shard over the data axis, SB rows over the tile axis."""
    from ..ops.transforms import fwd_dct2d_batch, inv_txfm2d_batch
    from ..ops.quant import quantize_batch, dequantize_batch

    n_frames = mesh.shape["data"]
    rows = 2 * mesh.shape["tile"]
    cols = 2
    rng = np.random.RandomState(0)
    blocks = jnp.asarray(
        rng.randint(-255, 256, (n_frames, rows, cols, 32, 32)), jnp.int32)

    sharding = NamedSharding(mesh, P("data", "tile"))
    blocks = jax.device_put(blocks, sharding)

    @jax.jit
    def step(x):
        coeff = fwd_dct2d_batch(x, 32)
        q = quantize_batch(coeff, 32, 100)
        dq = dequantize_batch(q, 32, 100)
        recon = inv_txfm2d_batch(dq, 32)
        # toy cross-device reduction standing in for per-GOP rate control
        bits_proxy = jnp.sum(jnp.abs(q))
        return recon, bits_proxy

    recon, bits = step(blocks)
    recon.block_until_ready()
    return recon, bits

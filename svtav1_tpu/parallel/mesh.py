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


def sharded_encode_step(mesh: Mesh):
    """One step of the real encode pipeline over the mesh:
    - pictures shard over the "data" axis (GOP/picture parallelism);
    - a picture-analysis pass shards SB rows over the "tile" axis with a
      psum standing in for the per-GOP rate-control reduction over ICI.
    """
    import jax
    from jax.experimental.shard_map import shard_map
    from ..encoder.wavefront import encode_plane_wavefront
    from ..spec.txfm import TX_32X32

    ndata = mesh.shape["data"]
    ntile = mesh.shape["tile"]
    B, H, W = ndata, 64 * ntile, 128
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(0, 256, (B, H, W)), jnp.uint8)
    src = jax.device_put(src, NamedSharding(mesh, P("data")))

    # picture-parallel conformant encode (no cross-device deps for intra)
    mi, lev, recon = encode_plane_wavefront(src, 32, TX_32X32, 100)
    recon.block_until_ready()

    # tile-row sharded analysis + RC reduction over ICI
    @partial_shard_map_analysis(mesh)
    def analysis(block):
        var = jnp.var(block.astype(jnp.float32), axis=(-1, -2))
        local_bits = jnp.sum(var)
        total = jax.lax.psum(local_bits, ("data", "tile"))
        return var, total

    blocks = src.reshape(B, H // 64, 64, W // 64, 64).transpose(0, 1, 3, 2, 4)
    blocks = jax.device_put(blocks, NamedSharding(mesh, P("data", "tile")))
    var, total = analysis(blocks)
    jax.block_until_ready((var, total))
    return recon, total


def partial_shard_map_analysis(mesh: Mesh):
    import jax
    from jax.experimental.shard_map import shard_map

    def deco(fn):
        return jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=P("data", "tile"),
            out_specs=(P("data", "tile"), P()),
        ))
    return deco


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


def sharded_tile_encode_bytes(mesh: Mesh, n_tiles: int = None,
                              shard: bool = True) -> bytes:
    """Encode one key frame split into tile columns, with the tile axis
    sharded over the mesh (or not), and return the frame payload bytes.

    The certification contract (VERDICT round 1 #7): the 8-device sharded
    encode must produce a byte-identical bitstream to the 1-device run —
    tile columns are AV1's native independent-coding axis, so sharding
    them needs no halo exchange and must not change a single bit."""
    from ..encoder.intra_encoder import EncoderConfig, IntraEncoder

    n_tiles = n_tiles or mesh.devices.size
    w, h = 64 * n_tiles, 64
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(120 + 70 * np.sin((xx + yy) / 9.0) +
                rng.randint(-25, 26, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 30.0), 0,
                255).astype(np.uint8)
    v = np.clip(130 + 30 * np.cos(yy[::2, ::2] / 20.0), 0,
                255).astype(np.uint8)

    enc = IntraEncoder(EncoderConfig(w, h, qindex=100, tile_cols=n_tiles))
    if shard:
        flat = Mesh(mesh.devices.reshape(-1), ("tiles",))
        enc.batch_sharding = NamedSharding(flat, P("tiles"))
    payloads, _ = enc.encode_frames([(y, u, v)])
    return payloads[0]

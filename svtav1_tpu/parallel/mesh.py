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


def _cert_clip(w, h, n, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = np.clip(110 + 70 * np.sin((xx + 2.5 * t) / 19.0) +
                    50 * np.cos((yy + 1.5 * t) / 13.0) +
                    rng.randint(-3, 4, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(120 + 40 * np.sin((xx[::2, ::2] + t) / 23.0),
                    0, 255).astype(np.uint8)
        v = np.clip(135 + 35 * np.cos((yy[::2, ::2] + 0.5 * t) / 27.0),
                    0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def sharded_video_encode_bytes(mesh: Mesh, shard: bool = True,
                               w: int = 64, h: int = 64,
                               keyint: int = 3, n_gops: int = 2,
                               pyramid: bool = False,
                               part_search: bool = False) -> bytes:
    """Multi-GOP video-path sharding certificate: keyframe-aligned chunks
    are provably independent (every key frame resets the CDF chain and the
    DPB), so GOPs shard over the mesh's "data" axis — the picture/GOP
    parallelism row of SURVEY §2.9, the TPU mapping of the reference's
    picture-parallel process fabric (EbPictureDecisionProcess.c mini-GoP
    over pthreads).  Each chunk's device work is pinned to its own mesh
    device and the chunks encode concurrently on host threads; the
    concatenated bitstream must be BYTE-IDENTICAL to the serial
    single-device encode.  A psum over per-GOP byte counts rides the mesh
    as the frame-parallel rate-control aggregation (the reference's
    RC feedback reduction)."""
    from ..encoder.intra_encoder import EncoderConfig
    from ..encoder.video_encoder import VideoEncoder

    frames = _cert_clip(w, h, keyint * n_gops)
    chunks = [frames[i * keyint:(i + 1) * keyint] for i in range(n_gops)]
    cfg = EncoderConfig(w, h, qindex=110, part_search=part_search)

    def enc_chunk(gi, chunk, dev):
        enc = VideoEncoder(cfg, keyint=keyint, pyramid=pyramid,
                           gop=keyint)
        if gi > 0:
            enc.mark_continuation()   # seq header is emitted once
        ctx = jax.default_device(dev) if dev is not None else _nullctx()
        with ctx:
            ps, _ = enc.encode_frames(chunk)
            p2, _ = enc.flush()
        return b"".join(ps) + b"".join(p2)

    if not shard:
        # serial oracle: ONE encoder over the whole clip — key frames at
        # chunk boundaries reset all coding state, so this must equal the
        # sharded concatenation bit for bit
        enc = VideoEncoder(cfg, keyint=keyint, pyramid=pyramid,
                           gop=keyint)
        ps, _ = enc.encode_frames(frames)
        p2, _ = enc.flush()
        return b"".join(ps) + b"".join(p2)

    from concurrent.futures import ThreadPoolExecutor
    devs = list(mesh.devices.flat)
    assign = [devs[i % len(devs)] for i in range(n_gops)]
    with ThreadPoolExecutor(max_workers=n_gops) as ex:
        outs = list(ex.map(enc_chunk, range(n_gops), chunks, assign))

    # cross-shard RC reduction over the mesh (psum on the data axis)
    from jax.experimental.shard_map import shard_map
    nd = mesh.devices.size
    bits = np.zeros(nd, np.int32)
    bits[:n_gops] = [len(o) * 8 for o in outs]
    flat = Mesh(mesh.devices.reshape(-1), ("gop",))
    total = jax.jit(shard_map(
        lambda b: jax.lax.psum(jnp.sum(b), "gop"),
        mesh=flat, in_specs=P("gop"), out_specs=P()))(
            jax.device_put(jnp.asarray(bits), NamedSharding(flat,
                                                            P("gop"))))
    assert int(total) == sum(len(o) * 8 for o in outs)
    return b"".join(outs)


class _nullctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


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

"""Benchmark driver entry point.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Current benchmark: all-intra encode throughput of the flagship pipeline on
whatever device JAX finds (the real TPU chip under the driver).  Falls back
through progressively smaller benchmarks while the framework is being built.
"""

import json
import time

import numpy as np


def bench_intra_encode():
    """1080p all-intra encode fps (device compute path only until the full
    pipeline lands)."""
    import jax
    import jax.numpy as jnp
    from svtav1_tpu.ops.transforms import fwd_dct2d_batch, inv_txfm2d_batch
    from svtav1_tpu.ops.quant import quantize_batch, dequantize_batch

    # One 1080p frame of 32x32 luma blocks: 34x60 blocks of 32x32 = 1088x1920.
    n_blocks = 34 * 60
    rng = np.random.RandomState(0)
    blocks = jnp.asarray(
        rng.randint(-255, 256, (n_blocks, 32, 32)).astype(np.int32))

    @jax.jit
    def step(res):
        coeff = fwd_dct2d_batch(res, 32)
        qc = quantize_batch(coeff, 32, 100)
        dq = dequantize_batch(qc, 32, 100)
        recon = inv_txfm2d_batch(dq, 32)
        return recon, qc

    step(blocks)[0].block_until_ready()  # compile
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(blocks)
    out[0].block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    fps = 1.0 / dt  # frames of transform+quant work per second
    return {
        "metric": "1080p_luma_txfm_quant_recon_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": 0.0,
    }


def main():
    try:
        result = bench_intra_encode()
    except Exception as e:  # keep the driver fed even mid-build
        result = {"metric": "bench_error", "value": 0, "unit": str(e)[:200],
                  "vs_baseline": 0.0}
    print(json.dumps(result))


if __name__ == "__main__":
    main()

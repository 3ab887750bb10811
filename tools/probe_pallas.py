"""Compile-bisect the pallas wavefront on TPU (SVT_PALLAS_PROBE=N)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import synth_frames  # noqa: E402
from svtav1_tpu.encoder.intra_encoder import BLK, CAND_MODES  # noqa: E402
from svtav1_tpu.pallas.wavefront_kernel import (  # noqa: E402
    _PROBE, encode_plane_wavefront_pl)
from svtav1_tpu.spec.txfm import TX_32X32  # noqa: E402


def main():
    print("probe level:", _PROBE, flush=True)
    frames = synth_frames(1920, 1088, 4)
    yb = jax.device_put(np.stack([f[0] for f in frames]))
    float(jnp.sum(yb.astype(jnp.int32)))
    t0 = time.perf_counter()
    out = encode_plane_wavefront_pl(yb, BLK, TX_32X32, 100, CAND_MODES, 8,
                                    valid_h=1080)
    s = [float(jnp.sum(o.astype(jnp.float32))) for o in out]
    print(f"compile+first {time.perf_counter()-t0:.1f}s sums={s}",
          flush=True)
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        [float(jnp.sum(o.astype(jnp.float32)))
         for o in encode_plane_wavefront_pl(yb, BLK, TX_32X32, 100,
                                            CAND_MODES, 8, valid_h=1080)]
    print(f"steady {(time.perf_counter()-t0)/n*1000:.1f} ms/batch",
          flush=True)


if __name__ == "__main__":
    main()

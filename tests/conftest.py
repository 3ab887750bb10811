"""Test config: run JAX on a virtual 8-device CPU mesh.

The real TPU chip (axon tunnel) is reserved for bench runs; tests exercise the
same jitted code paths on CPU (XLA semantics are identical for the
integer-exact normative ops), and multi-chip sharding tests use the 8 virtual
devices.  Note the environment's sitecustomize force-selects the axon platform
via jax.config — we override it back to cpu here, which must happen before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: partition/inter wavefronts take minutes to
# compile per shape on CPU — cache them across test runs.  The path is
# keyed per machine: round 3's shared /tmp/jax_cache_svtav1 accumulated
# XLA:CPU AOT artifacts from a different host (machine-feature mismatch
# spam + timeouts, MULTICHIP_r03.json).
import platform  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_cache_svtav1_{platform.node()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

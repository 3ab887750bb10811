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

# NO persistent compile cache.  /tmp is a mount shared across builder
# machines that also share hostname, machine-id AND /proc/cpuinfo flags,
# yet their XLA:CPU AOT artifacts are mutually incompatible
# (prefer-no-gather/scatter target-feature mismatch) and LOADING them
# mis-executes (wrong numerics, round-3 rc=124 artifacts).  Every
# fingerprint scheme tried (hostname, machine-id, cpuinfo hash) still
# collided, so tests pay the recompile — the stacked-candidate
# wavefronts (round 4) made that affordable.

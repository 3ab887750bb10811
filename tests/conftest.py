"""Test config: run JAX on a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench runs; tests exercise the same jitted
code paths on CPU (XLA semantics are identical for the integer-exact normative
ops), and multi-chip sharding tests use the 8 virtual devices.
"""

import os

# Must be set before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

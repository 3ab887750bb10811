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
# keyed by a CPU-feature fingerprint: round 3's shared
# /tmp/jax_cache_svtav1 accumulated XLA:CPU AOT artifacts from a
# DIFFERENT machine (identical hostname, shared /tmp across the fleet)
# which mis-executed after loading (machine-feature mismatch spam,
# wrong results, MULTICHIP_r03.json rc=124).
import hashlib  # noqa: E402

_fpsrc = ""
for _p in ("/etc/machine-id", "/proc/cpuinfo"):
    try:
        _fpsrc += open(_p).read()
    except Exception:
        pass
_fp = hashlib.sha1(_fpsrc.encode()).hexdigest()[:12]
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_svt_{_fp}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

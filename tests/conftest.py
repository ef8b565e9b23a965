"""Test configuration: force an 8-device virtual CPU mesh.

The ambient environment routes jax through a single-client remote TPU
tunnel ('axon') whose sitecustomize registration overrides JAX_PLATFORMS.
Tests must never depend on the tunnel (it wedges when a prior process was
killed mid-session), so the platform is forced back to CPU via jax.config,
which wins over the registration hook. Multi-chip sharding paths are
validated on the 8 virtual CPU devices; the driver separately dry-runs the
mesh path (see __graft_entry__.py) and benchmarks on the real chip.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the test box has one CPU core and XLA
# compiles dominate the suite runtime; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flan_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

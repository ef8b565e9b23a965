"""Test configuration: force an 8-device virtual CPU mesh.

The ambient environment pins JAX_PLATFORMS=axon (a single-client remote TPU
tunnel); tests must not touch it, so CPU is forced unconditionally here
before jax initializes. Multi-chip sharding paths are validated on the 8
virtual CPU devices; the driver separately dry-runs the mesh path (see
__graft_entry__.py) and benchmarks on the real chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the test box has one CPU core and XLA
# compiles dominate the suite runtime; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flan_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

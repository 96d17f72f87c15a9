"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths (pjit/shard_map over jax.sharding.Mesh) are tested
on a virtual 8-device CPU topology; real-TPU benchmarks run via bench.py.
These env vars must be set before jax initializes its backends.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    # persistent XLA compile cache: the MPC test compiles dominate suite
    # time on first run and are fully cached afterwards
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

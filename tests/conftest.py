"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths (pjit/shard_map over jax.sharding.Mesh) are tested
on a virtual 8-device CPU topology; real-TPU benchmarks run via bench.py.
These env vars must be set before jax initializes its backends.
"""
import os

# force, not setdefault: the dev shell exports JAX_PLATFORMS=axon (the
# tunneled TPU), which would silently run the suite single-device on TPU.
# A sitecustomize may already have imported jax, binding jax_platforms from
# the env at import time — so ALSO override through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8")
if "xla_cpu_max_isa" not in xla_flags:
    # this jaxlib was built for a newer CPU than some build hosts; without
    # an ISA cap the XLA:CPU compiler intermittently segfaults compiling
    # the large MPC programs (illegal instruction in generated code)
    xla_flags = xla_flags + " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = xla_flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    # persistent XLA compile cache: the MPC test compiles dominate suite
    # time on first run and are fully cached afterwards
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()


import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_state_per_module():
    """Free compiled executables between test modules.

    The suite compiles hundreds of XLA:CPU programs in one process; with
    ~77 tests' worth of live LLVM-JIT state accumulated, compiling the
    large MPC warmstart scan segfaults inside backend_compile_and_load
    (reproduced twice at the same test; the identical compile succeeds in
    a fresh process). Dropping executable references at module boundaries
    keeps the JIT arena bounded. Costs only cross-module recompiles.
    """
    yield
    jax.clear_caches()

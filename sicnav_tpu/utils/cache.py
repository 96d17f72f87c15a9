"""Persistent XLA compilation cache.

The TPU-native analog of the reference's generated-solver cache
(acados_cache/ keyed by config md5, campc_acados_opt.py:51-57 and
mpc_env_new.py:295-301): compiled XLA executables for the MPC/diffusion
programs persist across processes, keyed by HLO fingerprint, so a given
(config, shape) combination compiles once per machine.

The cache directory is additionally keyed by a HOST FINGERPRINT (CPU
feature flags + jaxlib version): XLA's own cache key does NOT include the
CPU feature set, so a CPU executable AOT-compiled on one machine can be
loaded on another with fewer ISA extensions and SIGILL/segfault at run
time (observed: avx512-family executables from a previous build host
crashing `compilation_cache.get_executable_and_time` on this one).
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "sicnav_tpu_xla")
_enabled = False


def _host_fingerprint() -> str:
    """Short stable hash of the CPU feature set + jaxlib version."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    try:
        import jaxlib
        ver = getattr(jaxlib, "__version__", "")
    except Exception:
        ver = ""
    return hashlib.sha256(f"{feats}|{ver}".encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str = None) -> str:
    global _enabled
    import jax
    # CPU backends: leave the persistent cache OFF. This jaxlib's XLA:CPU
    # AOT serialize/deserialize path is unreliable across the build hosts
    # (observed: segfault in get_executable_and_time loading artifacts
    # with a foreign ISA feature set, and abort in put_executable_and_time
    # serializing large MPC executables) — in-process jit caching still
    # applies; only cross-process reuse is lost.
    if jax.default_backend() == "cpu":
        return ""
    base = cache_dir or os.environ.get("SICNAV_TPU_CACHE", _DEFAULT_DIR)
    d = os.path.join(base, f"host-{_host_fingerprint()}")
    if not _enabled:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        _enabled = True
    return d
